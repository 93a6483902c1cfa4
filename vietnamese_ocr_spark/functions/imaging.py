"""Pure-NumPy image primitives shared by the oracle and the Spark UDFs.

Replicates the reference preprocessing semantics (SURVEY.md §2.2):

  P1 grayscale        reference: Image.open(..).convert("L")
                      (src/utils/inference.py:125)
  P2 autocontrast     reference: Enhance = random sharpness + autocontrast
                      (src/utils/transform.py:73-89); we keep only the
                      deterministic autocontrast part (documented deviation,
                      SURVEY.md §7 "determinism over fidelity")
  P3 invert+rescale   bitwise_not; resize to height 64, width
                      min(256, round(64/H*W)) aspect-preserving
                      (src/utils/transform.py:61-71)
  P4 center pad       pad to 64x256, constant 0, centered
                      (src/utils/inference.py:36-39)
  P5 normalize        /255 float, channel stack is done by the model
                      (src/utils/transform.py:51-52)

Plus a minimal pure-stdlib PNG codec (8-bit grayscale) so the `media.png`
BinaryType column holds real PNG bytes without cv2/PIL (neither is in the
runtime image).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

TARGET_H = 64  # config/swin_config.yaml:31 img_size [64, 256]
TARGET_W = 256

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def png_encode(arr: np.ndarray) -> bytes:
    """Encode a uint8 HxW grayscale array as a PNG (filter 0, 8-bit gray)."""
    if arr.dtype != np.uint8 or arr.ndim != 2:
        raise ValueError("png_encode expects uint8 HxW grayscale")
    h, w = arr.shape
    raw = b"".join(b"\x00" + arr[i].tobytes() for i in range(h))

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    return _PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", zlib.compress(raw, 6)) + chunk(b"IEND", b"")


def png_decode(data: bytes) -> np.ndarray:
    """Decode an 8-bit grayscale PNG produced by :func:`png_encode`.

    Supports scanline filters 0 (None), 1 (Sub) and 2 (Up) — enough for
    our encoder plus simple third-party writers of gray8 images.
    """
    if not data.startswith(_PNG_SIG):
        raise ValueError("not a PNG")
    pos = len(_PNG_SIG)
    width = height = None
    idat = []
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            width, height, depth, ctype = struct.unpack(">IIBB", body[:10])
            if depth != 8 or ctype != 0:
                raise ValueError("only 8-bit grayscale PNG supported")
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
    raw = zlib.decompress(b"".join(idat))
    stride = width + 1
    # fast path: every scanline filter 0 (what png_encode writes) — one
    # vectorized reshape instead of a per-row Python loop
    flat = np.frombuffer(raw, dtype=np.uint8).reshape(height, stride)
    if not flat[:, 0].any():
        return flat[:, 1:].copy()
    out = np.empty((height, width), dtype=np.uint8)
    prev = np.zeros(width, dtype=np.uint8)
    for y in range(height):
        row = raw[y * stride : (y + 1) * stride]
        ftype = row[0]
        line = np.frombuffer(row[1:], dtype=np.uint8).copy()
        if ftype == 0:
            pass
        elif ftype == 1:  # Sub: needs a sequential scan across the row
            acc = np.cumsum(line.astype(np.uint64)) & 0xFF
            line = acc.astype(np.uint8)
        elif ftype == 2:  # Up
            line = (line.astype(np.uint16) + prev).astype(np.uint8)
        else:
            raise ValueError(f"unsupported PNG filter {ftype}")
        out[y] = line
        prev = line
    return out


def grayscale(arr: np.ndarray) -> np.ndarray:
    """RGB(A) HxWxC -> L via BT.601 (PIL convert('L') semantics); gray passes through."""
    if arr.ndim == 2:
        return arr
    rgb = arr[..., :3].astype(np.float32)
    l = rgb[..., 0] * 0.299 + rgb[..., 1] * 0.587 + rgb[..., 2] * 0.114
    return np.clip(l, 0, 255).astype(np.uint8)


def autocontrast(arr: np.ndarray) -> np.ndarray:
    """Deterministic histogram stretch (PIL ImageOps.autocontrast, cutoff=0).

    Computed through a 256-entry LUT: the float math runs once per gray
    VALUE instead of once per pixel (bit-identical to the per-pixel form,
    ~8x less float work on typical strips)."""
    lo = int(arr.min())
    hi = int(arr.max())
    if hi <= lo:
        return arr
    scale = 255.0 / (hi - lo)
    lut = np.clip(
        (np.arange(256, dtype=np.float32) - np.float32(lo)) * np.float32(scale),
        0,
        255,
    ).astype(np.uint8)
    return lut[arr]


def invert(arr: np.ndarray) -> np.ndarray:
    """bitwise_not — dark ink on light paper becomes bright signal on 0.
    (For uint8, ~x == 255 - x; no int32 round-trip.)"""
    return np.invert(arr)


def resize_bilinear(arr: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Bilinear resize with half-pixel centers (cv2 INTER_LINEAR convention).

    Pure per-image elementwise float32 math — bit-identical between the
    oracle and any Arrow batch shape (SURVEY.md §7 hard-point b), at half
    the memory traffic of float64 (the OCR stage is bandwidth-bound).
    """
    in_h, in_w = arr.shape
    if (in_h, in_w) == (out_h, out_w):
        return arr.copy()
    src = arr.astype(np.float32)

    def _axis(n_out: int, n_in: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        coords = (np.arange(n_out, dtype=np.float32) + np.float32(0.5)) * np.float32(n_in / n_out) - np.float32(0.5)
        coords = np.clip(coords, np.float32(0.0), np.float32(n_in - 1.0))
        i0 = np.floor(coords).astype(np.int64)
        i1 = np.minimum(i0 + 1, n_in - 1)
        frac = coords - i0
        return i0, i1, frac

    y0, y1, fy = _axis(out_h, in_h)
    x0, x1, fx = _axis(out_w, in_w)
    top = src[y0][:, x0] * (1 - fx) + src[y0][:, x1] * fx
    bot = src[y1][:, x0] * (1 - fx) + src[y1][:, x1] * fx
    out = top * (1 - fy)[:, None] + bot * fy[:, None]
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)


def invert_rescale(arr: np.ndarray) -> np.ndarray:
    """P3: invert, then resize to height 64, width min(256, round(64/H*W)).

    Width clamp mirrors src/utils/transform.py:68 — long lines get squeezed
    into 256 px, which is why the decode cap at 32 tokens matters.
    """
    inv = invert(arr)
    h, w = inv.shape
    new_w = int(min(TARGET_W, round(TARGET_H / h * w)))
    new_w = max(new_w, 1)
    return resize_bilinear(inv, TARGET_H, new_w)


def center_pad(arr: np.ndarray) -> np.ndarray:
    """P4: constant-0 pad to 64x256, centered (src/utils/inference.py:36-39)."""
    h, w = arr.shape
    if w > TARGET_W or h > TARGET_H:
        raise ValueError(f"image {h}x{w} exceeds canvas {TARGET_H}x{TARGET_W}")
    pad_top = (TARGET_H - h) // 2
    pad_left = (TARGET_W - w) // 2
    out = np.zeros((TARGET_H, TARGET_W), dtype=np.uint8)
    out[pad_top : pad_top + h, pad_left : pad_left + w] = arr
    return out


def preprocess(arr: np.ndarray) -> np.ndarray:
    """Full P1..P4 chain: uint8 gray in -> uint8 64x256 canvas out.

    Stays uint8 end-to-end (4x less DRAM traffic than float32 — the OCR
    stage is bandwidth-bound at high core counts); the P5 /255
    normalization is algebraically folded into the recognizer's cosine
    scoring (cosine is scale-invariant), matching the reference's
    normalize-then-score up to the model's own arithmetic."""
    g = grayscale(arr)
    g = autocontrast(g)
    g = invert_rescale(g)
    return center_pad(g)
