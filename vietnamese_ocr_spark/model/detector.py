"""Text-line detection: row-ink-profile segmentation with midpoint bands.

The reference has NO detection stage — it is a single-line recognizer
(SURVEY.md §2.5 note) — but the north_star describes detection before
recognition for multi-line media. This is the deterministic NumPy
equivalent of binarize -> horizontal-projection -> connected row bands:

  1. invert, threshold the mean ink per row;
  2. contiguous inked row ranges become line cores;
  3. each core extends to the midpoint of the gap to its neighbor (the
     first/last extend to the image edge), so a single-line image yields
     exactly one full-height band — bit-identical behavior to the
     pre-detection pipeline on the existing corpus.

Golden behavior is defined by this shared implementation (oracle == Spark),
per SURVEY.md §5.1: with no reference weights, our deterministic model IS
the semantics contract.
"""

from __future__ import annotations

import numpy as np

INK_PIXEL_THRESH = 127  # a pixel darker than this is ink


def detect_line_bands(gray: np.ndarray) -> list[tuple[int, int]]:
    """gray: uint8 HxW, dark ink on light paper. Returns [(y0, y1), ...]
    covering the full height; blank images yield one full band.

    Row-has-ink is max-based (any pixel below INK_PIXEL_THRESH): a
    mean-ink threshold misses short lines sharing a canvas with long ones
    (found by the Hypothesis property test). Scanned/noisy inputs would
    want a denoised mean profile here; the synthetic domain is binary."""
    h = gray.shape[0]
    has = (gray < INK_PIXEL_THRESH).any(axis=1)
    if not has.any():
        return [(0, h)]
    # contiguous inked ranges (line cores)
    cores: list[list[int]] = []
    prev = False
    for y, v in enumerate(has):
        if v and not prev:
            cores.append([y, y + 1])
        elif v:
            cores[-1][1] = y + 1
        prev = bool(v)
    bands: list[tuple[int, int]] = []
    for i, (c0, c1) in enumerate(cores):
        y0 = 0 if i == 0 else (cores[i - 1][1] + c0) // 2
        y1 = h if i == len(cores) - 1 else (c1 + cores[i + 1][0]) // 2
        bands.append((y0, y1))
    return bands


def connected_component_boxes(ink: np.ndarray) -> list[tuple[int, int, int, int]]:
    """Connected components (8-connectivity) over a binary ink mask via
    run-based union-find -> bounding boxes (y0, x0, y1, x1), exclusive
    ends. Pure NumPy + a per-run loop: runs, not pixels, so cost scales
    with the number of ink segments, not the canvas area."""
    parent: dict[int, int] = {}

    def find(a: int) -> int:
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    def union(a: int, b: int) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    runs: list[tuple[int, int, int, int]] = []  # (run_id, row, c0, c1)
    prev_row: list[tuple[int, int, int]] = []  # (run_id, c0, c1)
    for y in range(ink.shape[0]):
        row = ink[y]
        if not row.any():
            prev_row = []
            continue
        padded = np.concatenate(([False], row, [False]))
        edges = np.flatnonzero(padded[1:] != padded[:-1])
        cur_row: list[tuple[int, int, int]] = []
        for c0, c1 in zip(edges[::2], edges[1::2]):
            rid = len(runs)
            parent[rid] = rid
            runs.append((rid, y, int(c0), int(c1)))
            cur_row.append((rid, int(c0), int(c1)))
            for pid, p0, p1 in prev_row:  # 8-conn: touch within +-1 col
                if p0 < c1 + 1 and c0 < p1 + 1:
                    union(rid, pid)
        prev_row = cur_row

    boxes: dict[int, list[int]] = {}
    for rid, y, c0, c1 in runs:
        root = find(rid)
        b = boxes.setdefault(root, [y, c0, y + 1, c1])
        b[0], b[1] = min(b[0], y), min(b[1], c0)
        b[2], b[3] = max(b[2], y + 1), max(b[3], c1)
    return sorted(tuple(b) for b in boxes.values())


def merge_line_boxes(
    boxes: list[tuple[int, int, int, int]], min_v_overlap: float = 0.5
) -> list[tuple[int, int, int, int]]:
    """Cluster glyph/word boxes into LINE boxes: two boxes join when
    their vertical overlap covers >= min_v_overlap of the shorter box
    (the standard same-baseline test). Transitive closure via the same
    union-find, so a line is one box no matter how many glyphs."""
    n = len(boxes)
    parent = list(range(n))

    def find(a: int) -> int:
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    for i in range(n):
        for j in range(i + 1, n):
            (ay0, _, ay1, _), (by0, _, by1, _) = boxes[i], boxes[j]
            overlap = min(ay1, by1) - max(ay0, by0)
            shorter = min(ay1 - ay0, by1 - by0)
            if shorter > 0 and overlap >= min_v_overlap * shorter:
                ra, rb = find(i), find(j)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    merged: dict[int, list[int]] = {}
    for i, (y0, x0, y1, x1) in enumerate(boxes):
        b = merged.setdefault(find(i), [y0, x0, y1, x1])
        b[0], b[1] = min(b[0], y0), min(b[1], x0)
        b[2], b[3] = max(b[2], y1), max(b[3], x1)
    return sorted(tuple(b) for b in merged.values())


def nms_boxes(
    boxes: list[tuple[int, int, int, int]], max_overlap: float = 0.5
) -> list[tuple[int, int, int, int]]:
    """Greedy non-maximum suppression: keep boxes largest-area first,
    drop any whose intersection with an already-kept box covers more
    than max_overlap of its own area (containment/duplicate cull)."""
    kept: list[tuple[int, int, int, int]] = []
    for y0, x0, y1, x1 in sorted(
        boxes, key=lambda b: ((b[2] - b[0]) * (b[3] - b[1]), b), reverse=True
    ):
        area = (y1 - y0) * (x1 - x0)
        suppressed = False
        for ky0, kx0, ky1, kx1 in kept:
            iy = min(y1, ky1) - max(y0, ky0)
            ix = min(x1, kx1) - max(x0, kx0)
            if iy > 0 and ix > 0 and iy * ix > max_overlap * area:
                suppressed = True
                break
        if not suppressed:
            kept.append((y0, x0, y1, x1))
    return sorted(kept)


def detect_boxes(gray: np.ndarray) -> list[tuple[int, int, int, int]]:
    """General-form detection (the north_star's binarize -> connected
    components -> box merge -> NMS): line boxes (y0, x0, y1, x1) sorted
    top-to-bottom. The pipeline hot path stays on detect_line_bands —
    equivalent on this corpus (asserted by test_detector box==band
    properties) and cheaper (row profile vs per-run union-find)."""
    ink = gray < INK_PIXEL_THRESH
    if not ink.any():
        return []
    return nms_boxes(merge_line_boxes(connected_component_boxes(ink)))


def line_bands_from_boxes(gray: np.ndarray) -> list[tuple[int, int]]:
    """Bridge: box-path line cores -> midpoint-extended bands with the
    exact extension rule of detect_line_bands, so the two detectors are
    directly comparable (and equal on rendered fixtures)."""
    h = gray.shape[0]
    cores = [(y0, y1) for y0, _, y1, _ in detect_boxes(gray)]
    if not cores:
        return [(0, h)]
    bands: list[tuple[int, int]] = []
    for i, (c0, c1) in enumerate(cores):
        y0 = 0 if i == 0 else (cores[i - 1][1] + c0) // 2
        y1 = h if i == len(cores) - 1 else (c1 + cores[i + 1][0]) // 2
        bands.append((y0, y1))
    return bands


def tighten_band(gray: np.ndarray, y0: int, y1: int) -> tuple[int, int]:
    """Scale-normalize a band: shrink [y0, y1) to its tight inked row range.

    A midpoint band carries half the inter-line gap as blank margin, so the
    aspect-preserving resize (P3) would shrink the glyphs relative to a
    single-line render of the same text — recognition stays deterministic
    but drifts off the template scale. Cropping to the inked core removes
    the margin, making the crop pixel-identical to the line's standalone
    render, so multi-line recognition is template-exact (CER 0) too.

    Blank bands (no ink) are returned unchanged — a blank image must keep
    producing the full-canvas empty prediction ('a' fallback path)."""
    has = (gray[y0:y1] < INK_PIXEL_THRESH).any(axis=1)
    if not has.any():
        return (y0, y1)
    idx = np.flatnonzero(has)
    return (y0 + int(idx[0]), y0 + int(idx[-1]) + 1)
