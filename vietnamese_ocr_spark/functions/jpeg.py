"""Baseline JFIF (JPEG) codec in pure NumPy — no PIL/cv2 in this runtime.

Why it exists: the reference accepts anything PIL/cv2 opens —
`Image.open(path).convert("L")` (reference src/utils/inference.py:125) and
BGR `cv2.imread` (reference src/utils/dataloader.py:44) both handle JPEG —
and the reference's training augmentation `A.ImageCompression(95)`
(reference src/utils/transform.py) is a JPEG round-trip. This module gives
both behaviors a real implementation.

Scope (ITU-T T.81 baseline sequential, JFIF container):
  encode: 8-bit grayscale or RGB; 4:4:4 or 4:2:0 chroma subsampling;
          Annex K quantization tables with libjpeg-style quality scaling;
          Annex K standard Huffman tables (no per-image optimization).
  decode: baseline DCT (SOF0), 1 or 3 components, any (h,v) sampling
          factors up to 2x2, multiple DQT/DHT segments, restart markers.
Progressive (SOF2), arithmetic coding, and 12-bit precision are rejected
with ValueError (callers quarantine, same contract as png_decode).

All constants below are from the public JPEG standard (T.81 Annex K) and
the JFIF spec; the quality→table scaling is the well-known libjpeg
formula. Vectorization: DCT/IDCT/quant run as one (n_blocks, 8, 8) matmul
per plane; only the entropy coding loops per block (it is inherently
sequential — a bitstream).
"""

from __future__ import annotations

import struct

import numpy as np

# -- constants (T.81 Annex K) -------------------------------------------------

# zigzag order: ZZ[k] = raster index of the k-th zigzag coefficient
ZZ = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10,
        17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

_Q_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
)
_Q_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
)

# standard Huffman specs: (BITS[1..16], HUFFVAL)
_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0], list(range(12)))
_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0], list(range(12)))
_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)

# orthonormal DCT-II matrix: fdct(B) = C @ B @ C.T, idct(F) = C.T @ F @ C
_x = np.arange(8, dtype=np.float64)
_C = np.cos((2 * _x[None, :] + 1) * _x[:, None] * np.pi / 16) * np.where(
    _x[:, None] == 0, np.sqrt(1 / 8), np.sqrt(2 / 8)
)


def _quality_table(base: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg quality scaling: 1..100 -> scaled Annex K table."""
    quality = max(1, min(100, int(quality)))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int64)


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length), canonical assignment (T.81 C.2)."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


# -- plane <-> blocks ---------------------------------------------------------

def _to_blocks(plane: np.ndarray) -> tuple[np.ndarray, int, int]:
    """Pad (edge-replicate) to 8-multiples and split into (n, 8, 8)."""
    h, w = plane.shape
    H, W = -(-h // 8) * 8, -(-w // 8) * 8
    padded = np.pad(plane, ((0, H - h), (0, W - w)), mode="edge")
    blocks = (
        padded.reshape(H // 8, 8, W // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    )
    return blocks, H // 8, W // 8


def _from_blocks(blocks: np.ndarray, bh: int, bw: int) -> np.ndarray:
    return (
        blocks.reshape(bh, bw, 8, 8).transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)
    )


def _quantize_plane(plane: np.ndarray, qtab: np.ndarray) -> tuple[np.ndarray, int, int]:
    """plane (uint8) -> zigzagged quantized coefficients (n_blocks, 64)."""
    blocks, bh, bw = _to_blocks(plane)
    coef = _C @ (blocks.astype(np.float64) - 128.0) @ _C.T
    q = np.round(coef.reshape(-1, 64) / qtab[None, :].astype(np.float64))
    return q.astype(np.int64)[:, ZZ], bh, bw


def _dequantize_plane(zzcoef: np.ndarray, qtab: np.ndarray, bh: int, bw: int) -> np.ndarray:
    coef = np.zeros((zzcoef.shape[0], 64), dtype=np.float64)
    coef[:, ZZ] = zzcoef * qtab[None, :]
    pix = _C.T @ coef.reshape(-1, 8, 8) @ _C + 128.0
    return np.clip(np.round(pix), 0, 255).astype(np.uint8)[: bh * bw].reshape(-1, 8, 8)


# -- bit IO -------------------------------------------------------------------

class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, value: int, length: int) -> None:
        if length == 0:
            return
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.n -= 8
            self.buf.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.buf.append(0x00)
        self.acc &= (1 << self.n) - 1

    def flush(self) -> bytes:
        if self.n:
            self.put(0x7F, 8 - self.n)  # pad with 1-bits
        return bytes(self.buf)


def _split_entropy(data: bytes, pos: int) -> list[bytes]:
    """Split the entropy-coded stream into UNSTUFFED restart segments.

    One vectorized scan finds every 0xFF; only those positions are
    visited in Python (stuffed 0x00s dropped, fill 0xFFs dropped, RSTn
    cuts a segment, any other marker ends the scan). Replaces the old
    per-byte _BitReader fill — the decoder's former hot spot."""
    arr = np.frombuffer(data, dtype=np.uint8)[pos:]
    ff = np.nonzero(arr == 0xFF)[0]
    segs: list[bytes] = []
    drops: list[int] = []
    start = 0
    end = len(arr)
    skip_next = -1
    for i in ff:
        i = int(i)
        if i < start or i == skip_next:
            continue
        nxt = int(arr[i + 1]) if i + 1 < len(arr) else 0xD9
        if nxt == 0x00:
            drops.append(i + 1)  # unstuff: keep the 0xFF, drop the 0x00
        elif nxt == 0xFF:
            drops.append(i)  # fill byte before a marker
        elif 0xD0 <= nxt <= 0xD7:  # RSTn: segment boundary
            seg = np.delete(arr[start:i], [d - start for d in drops])
            segs.append(seg.tobytes())
            drops = []
            start = i + 2
            skip_next = i + 1
        else:  # EOI / next header marker: end of scan
            end = i
            break
    seg = np.delete(arr[start:end], [d - start for d in drops])
    segs.append(seg.tobytes())
    return segs


class _BitReader:
    """Bulk bit reader over an unstuffed entropy segment: a 64-bit-ish
    integer accumulator refilled 8 bytes at a time, 16-bit peeks for the
    Huffman LUT. Exhausted input pads with 1-bits (the encoder's own
    flush padding), so a final partial code still decodes; consuming
    past the pad raises."""

    __slots__ = ("data", "pos", "acc", "n", "limit")

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0
        self.limit = 8 * len(data) + 16  # pad allowance

    def _fill(self) -> None:
        chunk = self.data[self.pos : self.pos + 8]
        if chunk:
            self.pos += len(chunk)
            self.acc = (self.acc << (8 * len(chunk))) | int.from_bytes(chunk, "big")
            self.n += 8 * len(chunk)
        else:  # pad with 1-bits; limit guards runaway consumption
            self.acc = (self.acc << 8) | 0xFF
            self.n += 8
            self.limit -= 0  # limit is enforced via consumed count below

    def peek16(self) -> int:
        while self.n < 16:
            self._fill()
        return (self.acc >> (self.n - 16)) & 0xFFFF

    def consume(self, k: int) -> None:
        while self.n < k:
            self._fill()
        self.n -= k
        self.acc &= (1 << self.n) - 1
        self.limit -= k
        if self.limit < 0:
            raise ValueError("truncated JPEG entropy data")

    def receive(self, length: int) -> int:
        while self.n < length:
            self._fill()
        v = (self.acc >> (self.n - length)) & ((1 << length) - 1)
        self.consume(length)
        return v


def _extend(v: int, s: int) -> int:
    """T.81 EXTEND: map an s-bit magnitude to the signed coefficient."""
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def _decode_lut(bits: tuple[int, ...], vals: tuple[int, ...]) -> np.ndarray:
    """65536-entry fast-decode LUT: entry[p] = (length << 8) | symbol for
    the code matching 16-bit prefix p; 0 = invalid. Built once per table
    (cached) — turns Huffman decode into one peek + one array index."""
    lut = np.zeros(1 << 16, dtype=np.uint32)
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            sym = vals[k]
            k += 1
            lo = code << (16 - length)
            lut[lo : lo + (1 << (16 - length))] = (length << 8) | sym
            code += 1
        code <<= 1
    return lut


_LUT_CACHE: dict[tuple[tuple[int, ...], tuple[int, ...]], np.ndarray] = {}


def _decode_table(bits: list[int], vals: list[int]) -> np.ndarray:
    key = (tuple(bits), tuple(vals))
    lut = _LUT_CACHE.get(key)
    if lut is None:
        lut = _LUT_CACHE[key] = _decode_lut(*key)
    return lut


def _huff_decode(br: _BitReader, lut: np.ndarray) -> int:
    e = int(lut[br.peek16()])
    if e == 0:
        raise ValueError("invalid Huffman code")
    br.consume(e >> 8)
    return e & 0xFF


# -- encoder ------------------------------------------------------------------

def _encode_block(zz: np.ndarray, pred: int, dc: dict, ac: dict, bw: _BitWriter) -> int:
    diff = int(zz[0]) - pred
    s = abs(diff).bit_length()
    code, length = dc[s]
    bw.put(code, length)
    if s:
        bw.put(diff if diff >= 0 else diff + (1 << s) - 1, s)
    run = 0
    last_nz = 0
    nz = np.nonzero(zz[1:])[0]
    last_nz = nz[-1] + 1 if len(nz) else 0
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac[0xF0]  # ZRL
            bw.put(code, length)
            run -= 16
        s = abs(v).bit_length()
        code, length = ac[(run << 4) | s]
        bw.put(code, length)
        bw.put(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        code, length = ac[0x00]  # EOB
        bw.put(code, length)
    return int(zz[0])


def _rgb_to_ycbcr(rgb: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    r, g, b = (rgb[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    clip = lambda p: np.clip(np.round(p), 0, 255).astype(np.uint8)  # noqa: E731
    return clip(y), clip(cb), clip(cr)


def _subsample2(plane: np.ndarray) -> np.ndarray:
    """2x2 box average (the common 4:2:0 downsample)."""
    h, w = plane.shape
    H, W = -(-h // 2) * 2, -(-w // 2) * 2
    p = np.pad(plane, ((0, H - h), (0, W - w)), mode="edge").astype(np.float64)
    return (
        np.round((p[0::2, 0::2] + p[0::2, 1::2] + p[1::2, 0::2] + p[1::2, 1::2]) / 4)
        .astype(np.uint8)
    )


def jpeg_encode(
    arr: np.ndarray,
    quality: int = 75,
    subsample: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """Encode uint8 gray (HxW) or RGB (HxWx3) as baseline JFIF.

    `subsample`: '444' (no chroma subsampling) or '420' (2x2) — color only.
    `restart_interval`: emit a DRI segment + RSTn markers every N MCUs
    (0 = none) — what a parallel encoder writes so decode can resync.
    Deterministic: same array + options -> identical bytes.
    """
    if arr.dtype != np.uint8 or arr.ndim not in (2, 3):
        raise ValueError("jpeg_encode expects uint8 HxW or HxWx3")
    if arr.ndim == 3 and arr.shape[2] != 3:
        raise ValueError("color input must be HxWx3 RGB")
    if subsample not in ("444", "420"):
        raise ValueError("subsample must be '444' or '420'")
    h, w = arr.shape[0], arr.shape[1]
    color = arr.ndim == 3
    ql = _quality_table(_Q_LUMA, quality)
    qc = _quality_table(_Q_CHROMA, quality)

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    # DQT (table 0 = luma; table 1 = chroma when color)
    # quant tables are TRANSMITTED in zigzag order (T.81 B.2.4.1)
    out += b"\xff\xdb" + struct.pack(">H", 2 + 65) + b"\x00" + bytes(int(x) for x in ql[ZZ])
    if color:
        out += b"\xff\xdb" + struct.pack(">H", 2 + 65) + b"\x01" + bytes(int(x) for x in qc[ZZ])
    # SOF0
    ncomp = 3 if color else 1
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    hv_luma = 0x22 if (color and subsample == "420") else 0x11
    sof += bytes([1, hv_luma, 0])
    if color:
        sof += bytes([2, 0x11, 1, 3, 0x11, 1])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof

    def dht(klass: int, tid: int, spec: tuple[list[int], list[int]]) -> bytes:
        bits, vals = spec
        body = bytes([(klass << 4) | tid]) + bytes(bits) + bytes(vals)
        return b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body

    out += dht(0, 0, _DC_LUMA) + dht(1, 0, _AC_LUMA)
    if color:
        out += dht(0, 1, _DC_CHROMA) + dht(1, 1, _AC_CHROMA)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    # SOS
    sos = bytes([ncomp, 1, 0x00])
    if color:
        sos += bytes([2, 0x11, 3, 0x11])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    # build the MCU sequence as (zz_block, component_idx) lists, then run
    # one generic entropy loop (handles restart markers uniformly)
    mcus: list[list[tuple[np.ndarray, int]]] = []
    if not color:
        zz, _bh, _bw = _quantize_plane(arr, ql)
        mcus = [[(b, 0)] for b in zz]
    else:
        y, cb, cr = _rgb_to_ycbcr(arr)
        if subsample == "420":
            cb, cr = _subsample2(cb), _subsample2(cr)
            # luma plane padded to 16-multiples so MCUs are complete
            H, W = -(-h // 16) * 16, -(-w // 16) * 16
            y = np.pad(y, ((0, H - h), (0, W - w)), mode="edge")
            cpad = lambda p: np.pad(  # noqa: E731
                p, ((0, H // 2 - p.shape[0]), (0, W // 2 - p.shape[1])), mode="edge"
            )
            cb, cr = cpad(cb), cpad(cr)
        zzy, bhy, bwy = _quantize_plane(y, ql)
        zzcb, bhc, bwc = _quantize_plane(cb, qc)
        zzcr, _, _ = _quantize_plane(cr, qc)
        if subsample == "444":
            mcus = [
                [(zzy[i], 0), (zzcb[i], 1), (zzcr[i], 2)]
                for i in range(zzy.shape[0])
            ]
        else:  # 4:2:0 MCU = 4 Y blocks (2x2) + 1 Cb + 1 Cr
            for my in range(bhy // 2):
                for mx in range(bwy // 2):
                    mcu = [
                        (zzy[(2 * my + dy) * bwy + (2 * mx + dx)], 0)
                        for dy in range(2)
                        for dx in range(2)
                    ]
                    ci = my * bwc + mx
                    mcu += [(zzcb[ci], 1), (zzcr[ci], 2)]
                    mcus.append(mcu)

    tables = [
        (_canonical_codes(*_DC_LUMA), _canonical_codes(*_AC_LUMA)),
        (_canonical_codes(*_DC_CHROMA), _canonical_codes(*_AC_CHROMA)),
        (_canonical_codes(*_DC_CHROMA), _canonical_codes(*_AC_CHROMA)),
    ]
    bw = _BitWriter()
    preds = [0, 0, 0]
    for m, mcu in enumerate(mcus):
        if restart_interval and m and m % restart_interval == 0:
            out += bw.flush()
            out += bytes([0xFF, 0xD0 + ((m // restart_interval - 1) % 8)])
            bw = _BitWriter()
            preds = [0, 0, 0]
        for block, ci in mcu:
            dc, ac = tables[ci]
            preds[ci] = _encode_block(block, preds[ci], dc, ac, bw)

    out += bw.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# -- decoder ------------------------------------------------------------------

def _decode_block(br: _BitReader, dc_tab: dict, ac_tab: dict, pred: int) -> tuple[np.ndarray, int]:
    zz = np.zeros(64, dtype=np.int64)
    s = _huff_decode(br, dc_tab)
    diff = _extend(br.receive(s), s) if s else 0
    pred += diff
    zz[0] = pred
    k = 1
    while k < 64:
        sym = _huff_decode(br, ac_tab)
        run, size = sym >> 4, sym & 0x0F
        if size == 0:
            if run == 15:
                k += 16  # ZRL
                continue
            break  # EOB
        k += run
        if k > 63:
            raise ValueError("AC run past end of block")
        zz[k] = _extend(br.receive(size), size)
        k += 1
    return zz, pred


def jpeg_decode(data: bytes) -> np.ndarray:
    """Decode a baseline JFIF/JPEG. Returns uint8 HxW (gray) or HxWx3 RGB."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    frame = None  # (h, w, [(cid, hi, vi, tq)])
    restart_interval = 0
    scan = None

    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("bad marker alignment")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # standalone markers
        (seglen,) = struct.unpack(">H", data[pos : pos + 2])
        body = data[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT (possibly several tables)
            bp = 0
            while bp < len(body):
                pq, tq = body[bp] >> 4, body[bp] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quant tables not supported")
                qtables[tq] = np.frombuffer(
                    body[bp + 1 : bp + 65], dtype=np.uint8
                ).astype(np.int64)
                bp += 65
        elif marker == 0xC4:  # DHT (possibly several tables)
            bp = 0
            while bp < len(body):
                tc, th = body[bp] >> 4, body[bp] & 0x0F
                bits = list(body[bp + 1 : bp + 17])
                nv = sum(bits)
                vals = list(body[bp + 17 : bp + 17 + nv])
                htables[(tc, th)] = _decode_table(bits, vals)
                bp += 17 + nv
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 (baseline)
            prec, fh, fw, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            comps = []
            for i in range(nc):
                cid, hv, tq = body[6 + 3 * i : 9 + 3 * i]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            frame = (fh, fw, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("only baseline (SOF0) JPEG supported")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS
            ns = body[0]
            comp_tabs = {}
            for i in range(ns):
                cs, tt = body[1 + 2 * i], body[2 + 2 * i]
                comp_tabs[cs] = (tt >> 4, tt & 0x0F)
            scan = (comp_tabs, pos + seglen)
            break
        pos += seglen

    if frame is None or scan is None:
        raise ValueError("truncated JPEG (no frame/scan)")
    fh, fw, comps = frame
    comp_tabs, entropy_pos = scan
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-fw // (8 * hmax))
    mcuy = -(-fh // (8 * vmax))

    # per-component zigzag coefficient stores (mcu-aligned plane in blocks)
    stores = []
    for cid, hi, vi, tq in comps:
        bw_ = mcux * hi
        bh_ = mcuy * vi
        stores.append(np.zeros((bh_ * bw_, 64), dtype=np.int64))

    segs = _split_entropy(data, entropy_pos)
    if restart_interval:
        expected = -(-(mcux * mcuy) // restart_interval)
        if len(segs) != expected:
            raise ValueError(
                f"restart segment count {len(segs)} != expected {expected}"
            )
    elif len(segs) != 1:
        raise ValueError("RST markers present but no DRI segment")
    br = _BitReader(segs[0])
    tabs = [
        (htables[(0, comp_tabs[cid][0])], htables[(1, comp_tabs[cid][1])])
        for cid, _hi, _vi, _tq in comps
    ]
    preds = [0] * len(comps)
    n_mcu = mcux * mcuy
    for m in range(n_mcu):
        if restart_interval and m and m % restart_interval == 0:
            br = _BitReader(segs[m // restart_interval])
            preds = [0] * len(comps)
        my, mx = divmod(m, mcux)
        for ci, (cid, hi, vi, tq) in enumerate(comps):
            dc_tab, ac_tab = tabs[ci]
            for dy in range(vi):
                for dx in range(hi):
                    zz, preds[ci] = _decode_block(br, dc_tab, ac_tab, preds[ci])
                    by, bx = my * vi + dy, mx * hi + dx
                    stores[ci][by * (mcux * hi) + bx] = zz

    planes = []
    for ci, (cid, hi, vi, tq) in enumerate(comps):
        bh_, bw_ = mcuy * vi, mcux * hi
        blocks = _dequantize_plane(stores[ci], qtables[tq], bh_, bw_)
        plane = _from_blocks(blocks, bh_, bw_)
        # upsample to full frame resolution, crop
        if hi < hmax or vi < vmax:
            plane = np.repeat(np.repeat(plane, vmax // vi, axis=0), hmax // hi, axis=1)
        planes.append(plane[:fh, :fw])

    if len(planes) == 1:
        return planes[0]
    if len(planes) != 3:
        raise ValueError(f"unsupported component count {len(planes)}")
    y, cb, cr = (p.astype(np.float64) for p in planes)
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255).astype(np.uint8)
