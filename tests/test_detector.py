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
