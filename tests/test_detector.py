import numpy as np

from vietnamese_ocr_spark.model.detector import detect_line_bands
from vietnamese_ocr_spark.model.glyphs import build_atlas, render_line, render_multiline
from vietnamese_ocr_spark.model.vocab import Vocabulary

_V = Vocabulary()
_ATLAS = build_atlas(_V)


def test_blank_image_one_full_band():
    assert detect_line_bands(np.full((48, 100), 255, dtype=np.uint8)) == [(0, 48)]


def test_single_line_full_band():
    img = render_line("xin", 64, _ATLAS)
    assert detect_line_bands(img) == [(0, 64)]


def test_multiline_band_count_and_cover():
    img = render_multiline(["abc", "xy", "đông"], 64, _ATLAS)
    bands = detect_line_bands(img)
    assert len(bands) == 3
    # bands tile the full height without overlap
    assert bands[0][0] == 0 and bands[-1][1] == img.shape[0]
    for (a0, a1), (b0, b1) in zip(bands, bands[1:]):
        assert a1 == b0


def test_bands_split_at_gap_midpoints():
    img = render_multiline(["ab", "cd"], 64, _ATLAS, gap=16)
    bands = detect_line_bands(img)
    # lines occupy [0,64) and [80,144); gap midpoint = 72
    assert bands == [(0, 72), (72, 144)]


# -- box path: connected components + line merge + NMS ------------------------

def test_box_path_equals_band_path_on_renders():
    from vietnamese_ocr_spark.model.detector import line_bands_from_boxes

    for img in (
        render_line("xin", 64, _ATLAS),
        render_multiline(["abc", "xy", "đông"], 64, _ATLAS),
        render_multiline(["ab", "cd"], 64, _ATLAS, gap=16),
        np.full((48, 100), 255, dtype=np.uint8),  # blank
    ):
        assert line_bands_from_boxes(img) == detect_line_bands(img), img.shape


def test_connected_components_find_disjoint_blobs():
    from vietnamese_ocr_spark.model.detector import connected_component_boxes

    ink = np.zeros((20, 30), dtype=bool)
    ink[2:5, 3:8] = True      # blob A
    ink[2:5, 15:20] = True    # blob B, same rows, disjoint cols
    ink[10:14, 5:6] = True    # blob C
    ink[14:16, 6:9] = True    # diagonal-touching extension of C (8-conn)
    boxes = connected_component_boxes(ink)
    assert boxes == [(2, 3, 5, 8), (2, 15, 5, 20), (10, 5, 16, 9)]


def test_merge_line_boxes_joins_same_baseline():
    from vietnamese_ocr_spark.model.detector import merge_line_boxes

    # two words on one baseline + one box on a second line
    boxes = [(10, 0, 20, 12), (11, 20, 21, 30), (40, 0, 52, 30)]
    assert merge_line_boxes(boxes) == [(10, 0, 21, 30), (40, 0, 52, 30)]


def test_nms_suppresses_contained_boxes():
    from vietnamese_ocr_spark.model.detector import nms_boxes

    big = (0, 0, 30, 30)
    inner = (5, 5, 15, 15)       # fully inside big -> suppressed
    disjoint = (40, 40, 50, 50)  # untouched
    assert nms_boxes([inner, big, disjoint]) == sorted([big, disjoint])


def test_detect_boxes_two_columns_one_line():
    from vietnamese_ocr_spark.model.detector import detect_boxes

    img = np.full((40, 100), 255, dtype=np.uint8)
    img[10:22, 5:30] = 0    # left column word
    img[12:24, 60:90] = 0   # right column word, same baseline
    assert detect_boxes(img) == [(10, 5, 24, 90)]
