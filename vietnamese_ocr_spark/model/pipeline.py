"""The shared per-payload recognition pipeline: decode -> detect -> recognize.

ONE implementation consumed by both the single-process oracle and the Spark
mapInPandas stage — span equality between them is checked per doc, so the
pipeline itself must never fork (SURVEY.md §5.1).

Per PNG payload: decode (S3) -> detect line bands (north_star detection
analog) -> per-band preprocess P1..P4 -> batched greedy recognition (M11)
-> lines joined with '\\n'. Bands from ALL images in the batch are
recognized in one vectorized pass, so multi-line payloads don't break the
Arrow-batch amortization.
"""

from __future__ import annotations

import numpy as np

from ..functions.imaging import decode_image, preprocess
from .detector import detect_line_bands, tighten_band
from .recognizer import Recognizer

MODEL_BATCH = 32  # reference inference batch, src/utils/inference.py:44


def recognize_png_batch(
    pngs: list[bytes], recognizer: Recognizer
) -> tuple[list[str], np.ndarray, list[bool]]:
    """Returns (text per payload — lines joined with newline, payload x 10
    confidence histograms, decode_ok flags). Empty strings stay empty
    ('a' fallback is a pipeline projection, src/utils/inference.py:108-110).

    Corrupt payloads are QUARANTINED, not fatal: at 10^12 rows a single
    bad byte must never kill the job (the single-process reference would
    just crash). A failed decode yields text '' with decode_ok=False; the
    lineage table carries the per-partition failure count."""
    owners: list[int] = []
    canvases: list[np.ndarray] = []
    ok = [True] * len(pngs)
    for i, png in enumerate(pngs):
        try:
            # PNG (gray/RGB/palette/alpha) or baseline JPEG -> BT.601 gray,
            # the reference's Image.open(...).convert('L') ingestion
            # contract (src/utils/inference.py:125)
            gray = decode_image(png)
        except Exception:
            ok[i] = False
            continue
        for y0, y1 in detect_line_bands(gray):
            # tight crop = scale-normalized line (template-exact multi-line
            # recognition); single-line renders have ink in every row, so
            # their band is returned unchanged (bit-identical behavior)
            ty0, ty1 = tighten_band(gray, y0, y1)
            owners.append(i)
            canvases.append(preprocess(gray[ty0:ty1]))

    line_texts: list[str] = []
    hist = np.zeros((len(pngs), 10), dtype=np.int64)
    for lo in range(0, len(canvases), MODEL_BATCH):
        batch = np.stack(canvases[lo : lo + MODEL_BATCH])
        texts, h = recognizer.recognize(batch)
        line_texts.extend(texts)
        for j, owner in enumerate(owners[lo : lo + MODEL_BATCH]):
            hist[owner] += h[j]

    out = [[] for _ in pngs]
    for owner, text in zip(owners, line_texts):
        out[owner].append(text)
    return ["\n".join(lines) for lines in out], hist, ok
