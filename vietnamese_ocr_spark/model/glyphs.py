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
