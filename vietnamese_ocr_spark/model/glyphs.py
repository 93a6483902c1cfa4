"""Deterministic glyph atlas: the shared 'font' of the synthetic corpus.

Each character in the vocabulary gets a unique, seeded binary bitmap at the
canonical scale (cell = 8 px wide x 64 px tall at the pipeline's target
height, SURVEY.md §6 canonical shape). The fixture generator renders truth
strings with these glyphs; the recognizer's output projection uses the same
bitmaps as matched-filter templates — so recognition on clean synthetic
lines is exact, while stays a genuine argmax-over-logits decode
(src/model/model.py:224-225 semantics).

Geometry: 256 px canvas / 8 px cells = 32 cells, exactly the reference's
32-token decode cap (src/model/model.py:209) — strings longer than 32 chars
exceed both the canvas and the cap.
"""

from __future__ import annotations

import numpy as np

from .vocab import Vocabulary

CELL_W = 8      # glyph width at target height 64
CELL_H = 64
BASE_H, BASE_W = 16, 4  # random base grid, upsampled x4 / x2
GLYPH_SEED = 7_761_000  # fixed engine seed; all determinism flows from here
INK_DENSITY = 0.45


def glyph_bitmap(char: str) -> np.ndarray:
    """CELL_H x CELL_W uint8 {0,255} bitmap; 0 = ink (dark on white paper)."""
    seed = GLYPH_SEED + ord(char)
    rng = np.random.default_rng(seed)
    base = rng.random((BASE_H, BASE_W)) < INK_DENSITY
    # guarantee a minimum of ink so no glyph is mistaken for a blank cell
    if base.sum() < 8:
        flat = rng.permutation(BASE_H * BASE_W)[:8]
        base.reshape(-1)[flat] = True
    # guarantee ink in the first column so left-edge detection (the
    # recognizer's x0 scan) always lands on the true cell boundary
    if not base[:, 0].any():
        base[int(rng.integers(0, BASE_H)), 0] = True
    # guarantee ink in every row so the line detector's horizontal ink
    # profile never splits a single text line into two bands
    for r in range(BASE_H):
        if not base[r].any():
            base[r, int(rng.integers(0, BASE_W))] = True
    cell = np.kron(base, np.ones((CELL_H // BASE_H, CELL_W // BASE_W), dtype=bool))
    return np.where(cell, 0, 255).astype(np.uint8)


def build_atlas(vocab: Vocabulary) -> dict[str, np.ndarray]:
    return {c: glyph_bitmap(c) for c in vocab.letters}


def render_line(text: str, height: int, atlas: dict[str, np.ndarray]) -> np.ndarray:
    """Render `text` as a single text line at the given height.

    height must make cell width integral (height % 8 == 0): the canonical
    64-tall cells are nearest-neighbor scaled by height/64. Empty text
    renders a blank 'paper' image (all 255) — the empty-prediction
    fixture (reference 'a' fallback, src/utils/inference.py:108-110).
    """
    if height % 8 != 0:
        raise ValueError("height must be a multiple of 8")
    cell_w = (CELL_W * height) // CELL_H
    if not text:
        return np.full((height, cell_w * 2), 255, dtype=np.uint8)
    canonical = np.hstack([atlas[c] for c in text])
    # nearest-neighbor vertical+horizontal scale to the requested height
    ys = (np.arange(height) * CELL_H) // height
    xs = (np.arange(cell_w * len(text)) * CELL_H) // height
    return canonical[ys][:, xs]


def render_multiline(
    lines: list[str], height: int, atlas: dict[str, np.ndarray], gap: int = 16
) -> np.ndarray:
    """Stack text lines vertically with blank gaps — the multi-line media
    payload that exercises the detection stage (model/detector.py)."""
    imgs = [render_line(t, height, atlas) for t in lines]
    width = max(im.shape[1] for im in imgs)
    rows: list[np.ndarray] = []
    spacer = np.full((gap, width), 255, dtype=np.uint8)
    for i, im in enumerate(imgs):
        if i:
            rows.append(spacer)
        pad = np.full((im.shape[0], width - im.shape[1]), 255, dtype=np.uint8)
        rows.append(np.hstack([im, pad]))
    return np.vstack(rows)
