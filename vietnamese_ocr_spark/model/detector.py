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
