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
    """Round-7: bits accumulate in one medium-sized int and whole bytes
    flush in bulk (to_bytes + bytes.replace for the 0xFF stuffing)
    instead of a per-byte Python loop — the entropy coder's hottest
    primitive (~300k calls per progressive image)."""

    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, value: int, length: int) -> None:
        if length == 0:
            return
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.n += length
        if self.n >= 256:
            self._drain()

    def _drain(self) -> None:
        keep = self.n & 7
        nbytes = (self.n - keep) >> 3
        chunk = (self.acc >> keep).to_bytes(nbytes, "big")
        self.buf += chunk.replace(b"\xff", b"\xff\x00")  # byte stuffing
        self.acc &= (1 << keep) - 1
        self.n = keep

    def flush(self) -> bytes:
        if self.n & 7:
            self.put(0x7F, 8 - (self.n & 7))  # pad with 1-bits
        if self.n:
            self._drain()
        return bytes(self.buf)


def _split_entropy(data: bytes, pos: int) -> tuple[list[bytes], int]:
    """Split one scan's entropy-coded stream into UNSTUFFED restart
    segments; returns (segments, absolute offset of the terminating
    marker's 0xFF) so multi-scan (progressive) parsing can resume there.

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
    return segs, pos + end


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
        # consume() inlined (round-7): this runs a few hundred thousand
        # times per progressive image
        while self.n < length:
            self._fill()
        self.n -= length
        v = (self.acc >> self.n) & ((1 << length) - 1)
        self.acc &= (1 << self.n) - 1
        self.limit -= length
        if self.limit < 0:
            raise ValueError("truncated JPEG entropy data")
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


_LUT_CACHE: dict[tuple[tuple[int, ...], tuple[int, ...]], list[int]] = {}


def _decode_table(bits: list[int], vals: list[int]) -> list[int]:
    # stored as a plain Python list (round-7): list indexing skips the
    # numpy-scalar box/unbox on every decoded symbol
    key = (tuple(bits), tuple(vals))
    lut = _LUT_CACHE.get(key)
    if lut is None:
        lut = _LUT_CACHE[key] = _decode_lut(*key).tolist()
    return lut


def _huff_decode(br: _BitReader, lut: list[int]) -> int:
    e = lut[br.peek16()]
    if e == 0:
        raise ValueError("invalid Huffman code")
    br.consume(e >> 8)
    return e & 0xFF


# -- encoder ------------------------------------------------------------------

# Progressive scans need EOBn symbols (r<<4 for r=1..14), which the Annex K
# baseline AC tables do not define. This uniform 8-bit canonical table
# covers every AC symbol a progressive scan can emit (15 EOBn + ZRL + 160
# run/size codes = 176 codes <= 255). Compression is mediocre by design —
# the table exists for coverage and determinism, not rate.
_PROG_AC_SYMS = sorted(
    {r << 4 for r in range(15)}
    | {0xF0}
    | {(r << 4) | s for r in range(16) for s in range(1, 11)}
)
_PROG_AC_BITS = [0, 0, 0, 0, 0, 0, 0, len(_PROG_AC_SYMS), 0, 0, 0, 0, 0, 0, 0, 0]
_PROG_AC = (_PROG_AC_BITS, _PROG_AC_SYMS)


def _scan_enc_baseline(blocks, tables, bw: _BitWriter) -> None:
    """Encode one baseline restart segment: `blocks` is the flattened
    (block, component) sequence in MCU order. Writer accumulator and DC
    predictors live in locals for the whole segment (round-7 second
    pass); only nonzero AC coefficients are visited. Bits identical to
    the per-block/per-coefficient form."""
    buf = bw.buf
    acc = bw.acc
    n = bw.n
    preds = [0, 0, 0]
    for block, ci in blocks:
        dc, ac = tables[ci]
        bl = block.tolist()
        v0 = bl[0]
        diff = v0 - preds[ci]
        preds[ci] = v0
        s = abs(diff).bit_length()
        code, ln = dc[s]
        if s:
            acc = (acc << (ln + s)) | (code << s) | (
                diff if diff >= 0 else diff + (1 << s) - 1
            )
            n += ln + s
        else:
            acc = (acc << ln) | code
            n += ln
        nz = np.flatnonzero(block[1:])
        prev = 0
        for idx in nz.tolist():
            k = idx + 1
            r = k - prev - 1
            while r > 15:
                code, ln = ac[0xF0]  # ZRL
                acc = (acc << ln) | code
                n += ln
                r -= 16
            v = bl[k]
            s = abs(v).bit_length()
            code, ln = ac[(r << 4) | s]
            acc = (acc << (ln + s)) | (code << s) | (
                v if v >= 0 else v + (1 << s) - 1
            )
            n += ln + s
            prev = k
        if prev < 63:
            code, ln = ac[0x00]  # EOB
            acc = (acc << ln) | code
            n += ln
        if n >= 256:
            keep = n & 7
            nbytes = (n - keep) >> 3
            buf += ((acc >> keep).to_bytes(nbytes, "big")).replace(
                b"\xff", b"\xff\x00"
            )
            acc &= (1 << keep) - 1
            n = keep
    bw.acc = acc
    bw.n = n


# -- progressive scan encoders (T.81 G.1.2, the libjpeg algorithms) ----------

def _enc_dc_first(block: np.ndarray, pred: int, dc: dict, al: int,
                  bw: _BitWriter) -> int:
    v = int(block[0]) >> al  # arithmetic shift, same as the decoder's <<
    diff = v - pred
    s = abs(diff).bit_length()
    code, length = dc[s]
    bw.put(code, length)
    if s:
        bw.put(diff if diff >= 0 else diff + (1 << s) - 1, s)
    return v


def _scan_enc_ac_first(bands, ss: int, se: int, al: int, ac: dict,
                       bw: _BitWriter) -> None:
    """Whole-scan progressive AC-first encoder over the scan's band
    MATRIX (one row per block): the bit writer's accumulator and the EOB
    run live in locals across every block, and the point transform /
    nonzero map / value lists for the whole scan come from four
    vectorized ops (round-7 second pass — put() call overhead and the
    per-block numpy prep were most of the encode wall). Emitted bits
    identical to the per-block form."""
    buf = bw.buf
    acc = bw.acc
    n = bw.n
    eobrun = 0
    span = se - ss

    def flush_eob():
        nonlocal acc, n, eobrun
        rr = eobrun.bit_length() - 1
        code, ln = ac[rr << 4]
        acc = (acc << ln) | code
        n += ln
        if rr:
            acc = (acc << rr) | (eobrun - (1 << rr))
            n += rr
        eobrun = 0

    def add_eobrun(gap):
        # bulk EOB-run accumulation over a run of all-zero bands; flush
        # points identical to +1 increments (only exactly 0x7FFF fires)
        nonlocal eobrun
        while gap:
            step = min(gap, 0x7FFF - eobrun)
            eobrun += step
            gap -= step
            if eobrun == 0x7FFF:
                flush_eob()

    # whole-scan band math: the point transform, the nonzero map and the
    # value/column lists for EVERY block come from four vectorized ops
    # instead of per-block any/asarray/where/flatnonzero/tolist chains
    t2 = np.where(bands >= 0, bands >> al, -((-bands) >> al)) if al else bands
    rnz, cnz = np.nonzero(t2)
    starts = np.searchsorted(rnz, np.arange(len(bands) + 1)).tolist()
    cols = cnz.tolist()
    vals = t2[rnz, cnz].tolist()
    prev_u = -1
    for u in np.unique(rnz).tolist():
        add_eobrun(u - prev_u - 1)
        prev_u = u
        if eobrun:
            flush_eob()
        prev = -1
        for j in range(starts[u], starts[u + 1]):
            idx = cols[j]
            r = idx - prev - 1
            while r > 15:
                code, ln = ac[0xF0]  # ZRL
                acc = (acc << ln) | code
                n += ln
                r -= 16
            t = vals[j]
            s = abs(t).bit_length()
            code, ln = ac[(r << 4) | s]
            acc = (acc << (ln + s)) | (code << s) | (
                t if t >= 0 else t + (1 << s) - 1
            )
            n += ln + s
            if n >= 256:
                keep = n & 7
                nbytes = (n - keep) >> 3
                buf += ((acc >> keep).to_bytes(nbytes, "big")).replace(
                    b"\xff", b"\xff\x00"
                )
                acc &= (1 << keep) - 1
                n = keep
            prev = idx
        if prev < span:  # trailing zero run folds into an EOB
            eobrun += 1
            if eobrun == 0x7FFF:
                flush_eob()
    add_eobrun(len(bands) - prev_u - 1)
    if eobrun:
        flush_eob()
    bw.acc = acc
    bw.n = n
    if bw.n >= 256:
        bw._drain()


def _scan_enc_ac_refine(bands, ss: int, se: int, al: int, ac: dict,
                        bw: _BitWriter) -> None:
    """Whole-scan progressive AC-refine encoder (libjpeg
    encode_mcu_AC_refine, T.81 G.1.2.3 fig. G.7), exactly:
    already-significant coefficients emit one correction bit, buffered
    until the next symbol (or saved with a pending EOB run); newly-
    significant ones emit (run<<4)|1 + sign. ZRLs are emitted AT the
    position the 16-zero run completes — before buffering the current
    coefficient's correction bit — and only while another newly-
    significant coefficient is still coming (k <= EOB); a trailing run
    folds into the EOB instead. Getting this ordering wrong desyncs the
    decoder's correction-bit stream (found the hard way). Round-7 second
    pass: bit writer, EOB run and pending correction bits live in locals
    across the whole scan, and the scan's magnitude/nonzero/sign/EOB-
    position tables come from five vectorized ops over the band MATRIX
    (one row per block); emitted bits identical."""
    buf = bw.buf
    acc = bw.acc
    n = bw.n
    eobrun = 0
    be_bits: list[int] = []
    span = se - ss

    def flush_eob():
        nonlocal acc, n, eobrun, be_bits, buf
        rr = eobrun.bit_length() - 1
        code, ln = ac[rr << 4]
        acc = (acc << ln) | code
        n += ln
        if rr:
            acc = (acc << rr) | (eobrun - (1 << rr))
            n += rr
        nb = len(be_bits)
        if nb:
            v = 0
            for bit in be_bits:
                v = (v << 1) | bit
            acc = (acc << nb) | v
            n += nb
            be_bits = []
        eobrun = 0
        if n >= 256:
            keep = n & 7
            nbytes = (n - keep) >> 3
            buf += ((acc >> keep).to_bytes(nbytes, "big")).replace(
                b"\xff", b"\xff\x00"
            )
            acc &= (1 << keep) - 1
            n = keep

    def add_eobrun(gap):
        # bulk EOB-run accumulation over a run of all-zero bands; flush
        # points identical to +1 increments: only exactly 0x7FFF can
        # trigger here, because every block exit leaves be_bits <= 900
        nonlocal eobrun
        while gap:
            step = min(gap, 0x7FFF - eobrun)
            eobrun += step
            gap -= step
            if eobrun == 0x7FFF:
                flush_eob()

    blk2 = (np.abs(bands) >> al) if al else np.abs(bands)
    rnz, cnz = np.nonzero(blk2)
    starts = np.searchsorted(rnz, np.arange(len(bands) + 1)).tolist()
    cols = cnz.tolist()
    tvals = blk2[rnz, cnz].tolist()
    signs = (bands[rnz, cnz] >= 0).tolist()
    # per block: the LAST position whose magnitude is exactly 1 — the
    # final newly-significant coefficient, past which ZRLs must not run
    m1 = np.where(blk2 == 1, np.arange(bands.shape[1]), -1).max(axis=1).tolist()
    prev_u = -1
    for u in np.unique(rnz).tolist():
        add_eobrun(u - prev_u - 1)
        prev_u = u
        eob_pos = ss + m1[u] if m1[u] >= 0 else ss - 1
        br_bits: list[int] = []
        r = 0
        prev = ss - 1
        for j in range(starts[u], starts[u + 1]):
            k = ss + cols[j]
            r += k - prev - 1  # zeros skipped since the previous nonzero
            prev = k
            t = tvals[j]
            while r > 15 and k <= eob_pos:
                if eobrun:
                    flush_eob()
                code, ln = ac[0xF0]
                acc = (acc << ln) | code
                n += ln
                r -= 16
                for bit in br_bits:
                    acc = (acc << 1) | bit
                    n += 1
                br_bits = []
                if n >= 256:
                    keep = n & 7
                    nbytes = (n - keep) >> 3
                    buf += ((acc >> keep).to_bytes(nbytes, "big")).replace(
                        b"\xff", b"\xff\x00"
                    )
                    acc &= (1 << keep) - 1
                    n = keep
            if t > 1:  # already significant at this precision
                br_bits.append(t & 1)
                continue
            if eobrun:
                flush_eob()
            code, ln = ac[(r << 4) | 1]
            acc = (acc << (ln + 1)) | (code << 1) | (1 if signs[j] else 0)
            n += ln + 1
            for bit in br_bits:
                acc = (acc << 1) | bit
                n += 1
            br_bits = []
            r = 0
            if n >= 256:
                keep = n & 7
                nbytes = (n - keep) >> 3
                buf += ((acc >> keep).to_bytes(nbytes, "big")).replace(
                    b"\xff", b"\xff\x00"
                )
                acc &= (1 << keep) - 1
                n = keep
        r += span - (prev - ss)  # trailing zeros after the last nonzero
        if r > 0 or br_bits:
            eobrun += 1
            be_bits.extend(br_bits)
            if eobrun == 0x7FFF or len(be_bits) > 900:
                flush_eob()
    add_eobrun(len(bands) - prev_u - 1)
    if eobrun:
        flush_eob()
    bw.acc = acc
    bw.n = n
    if bw.n >= 256:
        bw._drain()


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


def _encode_progressive(arr, color, h, w, subsample, ql, qc) -> bytes:
    """Emit the libjpeg-default progressive scan script over the SAME
    quantized coefficients the baseline path produces: DC first (Al=1,
    interleaved) -> luma AC 1-5 and 6-63 at Al=2 / chroma AC 1-63 at
    Al=1 -> AC refinements stepping Al to 0 -> DC refinement. Decoding
    therefore reconstructs coefficient-identical blocks to the baseline
    stream (the equivalence the tests assert)."""
    if not color:
        zz, bh, bw_ = _quantize_plane(arr, ql)
        comps_info = [
            dict(cid=1, dc_id=0, ac_id=0, dc_codes=_canonical_codes(*_DC_LUMA),
                 zz=zz, store_bw=bw_, hi=1, vi=1, eff_bw=bw_, eff_bh=bh)
        ]
        hmax = vmax = 1
    else:
        y, cb, cr = _rgb_to_ycbcr(arr)
        if subsample == "420":
            cb, cr = _subsample2(cb), _subsample2(cr)
            H, W = -(-h // 16) * 16, -(-w // 16) * 16
            y = np.pad(y, ((0, H - h), (0, W - w)), mode="edge")
            cpad = lambda p: np.pad(  # noqa: E731
                p, ((0, H // 2 - p.shape[0]), (0, W // 2 - p.shape[1])), mode="edge"
            )
            cb, cr = cpad(cb), cpad(cr)
            hmax = vmax = 2
        else:
            hmax = vmax = 1
        zzy, bhy, bwy = _quantize_plane(y, ql)
        zzcb, bhc, bwc = _quantize_plane(cb, qc)
        zzcr, _, _ = _quantize_plane(cr, qc)

        def _eff(dim: int, f: int) -> int:
            return -(-(-(-dim * f // hmax)) // 8)  # ceil(ceil(dim*f/hmax)/8)

        dc_l = _canonical_codes(*_DC_LUMA)
        dc_c = _canonical_codes(*_DC_CHROMA)
        comps_info = [
            dict(cid=1, dc_id=0, ac_id=0, dc_codes=dc_l, zz=zzy, store_bw=bwy,
                 hi=hmax, vi=vmax, eff_bw=_eff(w, hmax), eff_bh=_eff(h, vmax)),
            dict(cid=2, dc_id=1, ac_id=1, dc_codes=dc_c, zz=zzcb, store_bw=bwc,
                 hi=1, vi=1, eff_bw=_eff(w, 1), eff_bh=_eff(h, 1)),
            dict(cid=3, dc_id=1, ac_id=1, dc_codes=dc_c, zz=zzcr, store_bw=bwc,
                 hi=1, vi=1, eff_bw=_eff(w, 1), eff_bh=_eff(h, 1)),
        ]
    prog_ac = _canonical_codes(*_PROG_AC)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    chunks: list[bytes] = []

    def scan(sel: list[int], ss: int, se: int, ah: int, al: int) -> None:
        sos = bytes([len(sel)])
        for ci in sel:
            info = comps_info[ci]
            sos += bytes([info["cid"], (info["dc_id"] << 4) | info["ac_id"]])
        sos += bytes([ss, se, (ah << 4) | al])
        bw_w = _BitWriter()
        if len(sel) > 1:  # interleaved DC scan: MCU order
            preds = [0] * len(sel)
            for m in range(mcux * mcuy):
                my, mx = divmod(m, mcux)
                for si, ci in enumerate(sel):
                    info = comps_info[ci]
                    for dy in range(info["vi"]):
                        for dx in range(info["hi"]):
                            block = info["zz"][
                                (my * info["vi"] + dy) * info["store_bw"]
                                + (mx * info["hi"] + dx)
                            ]
                            if ah == 0:
                                preds[si] = _enc_dc_first(
                                    block, preds[si], info["dc_codes"], al, bw_w
                                )
                            else:
                                bw_w.put((int(block[0]) >> al) & 1, 1)
        else:  # non-interleaved: the component's own block grid
            ci = sel[0]
            info = comps_info[ci]
            eff_bw, sbw = info["eff_bw"], info["store_bw"]
            if ss > 0:
                # AC scans: whole-scan encoders with the writer in locals;
                # the band matrix is gathered once for the whole scan
                n_blk = eff_bw * info["eff_bh"]
                if eff_bw == sbw:
                    band2 = info["zz"][:n_blk, ss : se + 1]
                else:
                    rows = [
                        (u // eff_bw) * sbw + (u % eff_bw) for u in range(n_blk)
                    ]
                    band2 = info["zz"][rows][:, ss : se + 1]
                if ah == 0:
                    _scan_enc_ac_first(band2, ss, se, al, prog_ac, bw_w)
                else:
                    _scan_enc_ac_refine(band2, ss, se, al, prog_ac, bw_w)
            else:
                pred = 0
                for u in range(eff_bw * info["eff_bh"]):
                    block = info["zz"][(u // eff_bw) * sbw + (u % eff_bw)]
                    if ah == 0:
                        pred = _enc_dc_first(block, pred, info["dc_codes"], al, bw_w)
                    else:
                        bw_w.put((int(block[0]) >> al) & 1, 1)
        chunks.append(
            b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos + bw_w.flush()
        )

    if color:
        scan([0, 1, 2], 0, 0, 0, 1)
        scan([0], 1, 5, 0, 2)
        scan([1], 1, 63, 0, 1)
        scan([2], 1, 63, 0, 1)
        scan([0], 6, 63, 0, 2)
        scan([0], 1, 63, 2, 1)
        scan([0, 1, 2], 0, 0, 1, 0)
        scan([1], 1, 63, 1, 0)
        scan([2], 1, 63, 1, 0)
        scan([0], 1, 63, 1, 0)
    else:
        scan([0], 0, 0, 0, 1)
        scan([0], 1, 5, 0, 2)
        scan([0], 6, 63, 0, 2)
        scan([0], 1, 63, 2, 1)
        scan([0], 0, 0, 1, 0)
        scan([0], 1, 63, 1, 0)
    return b"".join(chunks)


def jpeg_encode(
    arr: np.ndarray,
    quality: int = 75,
    subsample: str = "444",
    restart_interval: int = 0,
    progressive: bool = False,
) -> bytes:
    """Encode uint8 gray (HxW) or RGB (HxWx3) as JFIF.

    `subsample`: '444' (no chroma subsampling) or '420' (2x2) — color only.
    `restart_interval`: emit a DRI segment + RSTn markers every N MCUs
    (0 = none) — what a parallel encoder writes so decode can resync.
    `progressive`: emit SOF2 with the libjpeg-default scan script
    (spectral selection + successive approximation for both DC and AC);
    decodes to EXACTLY the same pixels as the baseline encoding at the
    same quality/subsampling (same quantized coefficients, delivered in
    a different order). Deterministic: same array + options -> same bytes.
    """
    if arr.dtype != np.uint8 or arr.ndim not in (2, 3):
        raise ValueError("jpeg_encode expects uint8 HxW or HxWx3")
    if arr.ndim == 3 and arr.shape[2] != 3:
        raise ValueError("color input must be HxWx3 RGB")
    if subsample not in ("444", "420"):
        raise ValueError("subsample must be '444' or '420'")
    if progressive and restart_interval:
        raise ValueError("restart markers not supported with progressive")
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
    # SOF0 (baseline) or SOF2 (progressive)
    ncomp = 3 if color else 1
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    hv_luma = 0x22 if (color and subsample == "420") else 0x11
    sof += bytes([1, hv_luma, 0])
    if color:
        sof += bytes([2, 0x11, 1, 3, 0x11, 1])
    out += (b"\xff\xc2" if progressive else b"\xff\xc0")
    out += struct.pack(">H", 2 + len(sof)) + sof

    def dht(klass: int, tid: int, spec: tuple[list[int], list[int]]) -> bytes:
        bits, vals = spec
        body = bytes([(klass << 4) | tid]) + bytes(bits) + bytes(vals)
        return b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body

    if progressive:
        # custom AC table (EOBn symbols; Annex K lacks them) on both ids
        out += dht(0, 0, _DC_LUMA) + dht(1, 0, _PROG_AC)
        if color:
            out += dht(0, 1, _DC_CHROMA) + dht(1, 1, _PROG_AC)
        return bytes(
            out
            + _encode_progressive(arr, color, h, w, subsample, ql, qc)
            + b"\xff\xd9"
        )
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
    step = restart_interval if restart_interval else max(len(mcus), 1)
    for seg_i in range(0, max(len(mcus), 1), step):
        if seg_i:
            out += bytes([0xFF, 0xD0 + ((seg_i // restart_interval - 1) % 8)])
        bw = _BitWriter()
        _scan_enc_baseline(
            [bc for mcu in mcus[seg_i : seg_i + step] for bc in mcu],
            tables, bw,
        )
        out += bw.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# -- decoder ------------------------------------------------------------------

def _scan_dec_baseline(seq, segs, restart_interval, n_comps) -> None:
    """Decode one baseline scan end to end. `seq` is the block sequence in
    entropy-stream order: (si, dc_lut, ac_lut, block). The bit reader and
    Huffman decode are held in LOCAL variables for the whole scan (round-7
    second pass): the per-symbol cost was dominated by the
    _huff_decode/receive/consume call chain, not by the bit math."""
    data = segs[0]
    pos = acc = n = 0
    limit = 8 * len(data) + 16
    preds = [0] * n_comps
    for u, (si, dc_lut, ac_lut, block) in enumerate(seq):
        if restart_interval and u and u % restart_interval == 0:
            data = segs[u // restart_interval]
            pos = acc = n = 0
            limit = 8 * len(data) + 16
            preds = [0] * n_comps
        zz = [0] * 64
        # DC: one Huffman symbol + EXTEND(receive(s), s)
        while n < 16:
            chunk = data[pos : pos + 8]
            if chunk:
                pos += len(chunk)
                acc = (acc << (8 * len(chunk))) | int.from_bytes(chunk, "big")
                n += 8 * len(chunk)
            else:
                acc = (acc << 8) | 0xFF
                n += 8
        p16 = (acc >> (n - 16)) & 0xFFFF
        e = dc_lut[p16]
        if e == 0:
            raise ValueError("invalid Huffman code")
        ln = e >> 8
        s = e & 0xFF
        if s and ln + s <= 16:
            # fast path (third pass): the peek that matched the code also
            # holds the magnitude bits — one consume round (see AC loop)
            tot = ln + s
            n -= tot
            acc &= (1 << n) - 1
            limit -= tot
            if limit < 0:
                raise ValueError("truncated JPEG entropy data")
            v = (p16 >> (16 - tot)) & ((1 << s) - 1)
            preds[si] += v if v >= (1 << (s - 1)) else v - (1 << s) + 1
        else:
            n -= ln
            acc &= (1 << n) - 1
            limit -= ln
            if limit < 0:
                raise ValueError("truncated JPEG entropy data")
            if s:
                while n < s:
                    chunk = data[pos : pos + 8]
                    if chunk:
                        pos += len(chunk)
                        acc = (acc << (8 * len(chunk))) | int.from_bytes(
                            chunk, "big"
                        )
                        n += 8 * len(chunk)
                    else:
                        acc = (acc << 8) | 0xFF
                        n += 8
                n -= s
                v = (acc >> n) & ((1 << s) - 1)
                acc &= (1 << n) - 1
                limit -= s
                if limit < 0:
                    raise ValueError("truncated JPEG entropy data")
                preds[si] += v if v >= (1 << (s - 1)) else v - (1 << s) + 1
        zz[0] = preds[si]
        k = 1
        while k < 64:
            while n < 16:
                chunk = data[pos : pos + 8]
                if chunk:
                    pos += len(chunk)
                    acc = (acc << (8 * len(chunk))) | int.from_bytes(chunk, "big")
                    n += 8 * len(chunk)
                else:
                    acc = (acc << 8) | 0xFF
                    n += 8
            p16 = (acc >> (n - 16)) & 0xFFFF
            e = ac_lut[p16]
            if e == 0:
                raise ValueError("invalid Huffman code")
            ln = e >> 8
            sym = e & 0xFF
            size = sym & 0x0F
            if size and ln + size <= 16:
                # fast path (third pass): magnitude bits are already in
                # the 16-bit peek — one consume round (see AC-first)
                tot = ln + size
                n -= tot
                acc &= (1 << n) - 1
                limit -= tot
                if limit < 0:
                    raise ValueError("truncated JPEG entropy data")
                k += sym >> 4
                if k > 63:
                    raise ValueError("AC run past end of block")
                v = (p16 >> (16 - tot)) & ((1 << size) - 1)
                zz[k] = v if v >= (1 << (size - 1)) else v - (1 << size) + 1
                k += 1
                continue
            n -= ln
            acc &= (1 << n) - 1
            limit -= ln
            if limit < 0:
                raise ValueError("truncated JPEG entropy data")
            if size == 0:
                if sym == 0xF0:
                    k += 16  # ZRL
                    continue
                break  # EOB
            k += sym >> 4
            if k > 63:
                raise ValueError("AC run past end of block")
            while n < size:
                chunk = data[pos : pos + 8]
                if chunk:
                    pos += len(chunk)
                    acc = (acc << (8 * len(chunk))) | int.from_bytes(chunk, "big")
                    n += 8 * len(chunk)
                else:
                    acc = (acc << 8) | 0xFF
                    n += 8
            n -= size
            v = (acc >> n) & ((1 << size) - 1)
            acc &= (1 << n) - 1
            limit -= size
            if limit < 0:
                raise ValueError("truncated JPEG entropy data")
            zz[k] = v if v >= (1 << (size - 1)) else v - (1 << size) + 1
            k += 1
        block[:] = zz


def _decode_one_scan(frame, scan_sel, ss, se, ah, al, segs, stores,
                     htables, restart_interval) -> None:
    """Decode one scan (baseline or progressive) into the coefficient
    stores. Interleaved scans walk MCU order; single-component scans walk
    the component's own ceil(dim/8) block grid (NOT mcu-padded — the
    classic non-interleaved gotcha). Restart segments reset DC
    predictors and the EOB run."""
    fh, fw, comps, prog = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-fw // (8 * hmax))
    mcuy = -(-fh // (8 * vmax))
    interleaved = len(scan_sel) > 1
    if prog and ss > 0 and interleaved:
        raise ValueError("progressive AC scan must be single-component")
    if prog and ss == 0 and se != 0:
        raise ValueError("progressive DC scan must have Se=0")
    if prog and ah not in (0, al + 1):
        raise ValueError("successive approximation must step Al by 1")
    if interleaved:
        n_units = mcux * mcuy
        bw_eff = 0
    else:
        ci0 = scan_sel[0][0]
        _cid, hi, vi, _tq = comps[ci0]
        comp_w = -(-fw * hi // hmax)
        comp_h = -(-fh * vi // vmax)
        bw_eff = -(-comp_w // 8)
        n_units = bw_eff * (-(-comp_h // 8))
    expected = -(-n_units // restart_interval) if restart_interval else 1
    if len(segs) != expected:
        raise ValueError(
            f"restart segment count {len(segs)} != expected {expected}"
        )

    if prog and ss > 0:
        # progressive AC scan: single-component (enforced above), so the
        # block walk is a flat grid — decode the whole scan in one
        # locals-bound loop (round-7 second pass)
        ci0, _dct0, act0 = scan_sel[0]
        _cid, hi, vi, _tq = comps[ci0]
        row_w = mcux * hi
        blocks = [
            stores[ci0][(u // bw_eff) * row_w + (u % bw_eff)]
            for u in range(n_units)
        ]
        lut = htables[(1, act0)]
        if ah == 0:
            _scan_dec_ac_first(blocks, segs, restart_interval, lut, ss, se, al)
        else:
            _scan_dec_ac_refine(blocks, segs, restart_interval, lut, ss, se, al)
        return
    if not prog:
        # baseline scan: flatten the MCU walk into stream order once,
        # then decode with the bit reader in locals for the whole scan
        seq = []
        for u in range(n_units):
            for si, (ci, dct, act) in enumerate(scan_sel):
                _cid, hi, vi, _tq = comps[ci]
                if interleaved:
                    my, mx = divmod(u, mcux)
                    for dy in range(vi):
                        for dx in range(hi):
                            seq.append((
                                si,
                                htables[(0, dct)],
                                htables[(1, act)],
                                stores[ci][
                                    (my * vi + dy) * (mcux * hi) + (mx * hi + dx)
                                ],
                            ))
                else:
                    by, bx = divmod(u, bw_eff)
                    seq.append((
                        si,
                        htables[(0, dct)],
                        htables[(1, act)],
                        stores[ci][by * (mcux * hi) + bx],
                    ))
        # restart boundaries are per-MCU; with one block per MCU entry the
        # flat index matches u exactly when blocks-per-MCU == 1, otherwise
        # scale the interval
        per_unit = len(seq) // n_units if n_units else 1
        _scan_dec_baseline(
            seq, segs,
            restart_interval * per_unit if restart_interval else 0,
            len(scan_sel),
        )
        return

    br = _BitReader(segs[0])
    preds = [0] * len(scan_sel)
    for u in range(n_units):
        if restart_interval and u and u % restart_interval == 0:
            br = _BitReader(segs[u // restart_interval])
            preds = [0] * len(scan_sel)
        for si, (ci, dct, act) in enumerate(scan_sel):
            _cid, hi, vi, _tq = comps[ci]
            if interleaved:
                my, mx = divmod(u, mcux)
                blocks = [
                    stores[ci][(my * vi + dy) * (mcux * hi) + (mx * hi + dx)]
                    for dy in range(vi)
                    for dx in range(hi)
                ]
            else:
                by, bx = divmod(u, bw_eff)
                blocks = [stores[ci][by * (mcux * hi) + bx]]
            for block in blocks:
                if ah == 0:
                    preds[si] = _dec_dc_first(
                        br, htables[(0, dct)], block, preds[si], al
                    )
                else:
                    _dec_dc_refine(br, block, al)


# -- progressive block decoders (T.81 G.1.2 / G.2) ---------------------------

def _dec_dc_first(br: _BitReader, dc_tab: np.ndarray, block: np.ndarray,
                  pred: int, al: int) -> int:
    s = _huff_decode(br, dc_tab)
    diff = _extend(br.receive(s), s) if s else 0
    pred += diff
    block[0] = pred << al
    return pred


def _dec_dc_refine(br: _BitReader, block: np.ndarray, al: int) -> None:
    if br.receive(1):
        block[0] = int(block[0]) | (1 << al)


def _scan_dec_ac_first(blocks, segs, restart_interval, lut, ss, se, al) -> None:
    """Whole-scan progressive AC-first decoder (T.81 G.2), bit reader and
    EOB run in locals across every block of the scan (round-7 second
    pass — the per-block/_huff_decode/receive call chain was >half the
    decode wall on dense text images)."""
    data = segs[0]
    pos = acc = n = 0
    limit = 8 * len(data) + 16
    eob = 0
    for u, block in enumerate(blocks):
        if restart_interval and u and u % restart_interval == 0:
            data = segs[u // restart_interval]
            pos = acc = n = 0
            limit = 8 * len(data) + 16
            eob = 0
        if eob > 0:
            eob -= 1
            continue
        k = ss
        while k <= se:
            while n < 16:
                chunk = data[pos : pos + 8]
                if chunk:
                    pos += len(chunk)
                    acc = (acc << (8 * len(chunk))) | int.from_bytes(chunk, "big")
                    n += 8 * len(chunk)
                else:
                    acc = (acc << 8) | 0xFF
                    n += 8
            p16 = (acc >> (n - 16)) & 0xFFFF
            e = lut[p16]
            if e == 0:
                raise ValueError("invalid Huffman code")
            ln = e >> 8
            sym = e & 0xFF
            r, s = sym >> 4, sym & 0x0F
            # fast path (third pass): the 16-bit peek that matched the
            # Huffman code also contains the magnitude bits whenever
            # code_len + size <= 16, so symbol AND value consume in ONE
            # round — no second refill/mask. Same bits, same order.
            if s and ln + s <= 16:
                tot = ln + s
                n -= tot
                acc &= (1 << n) - 1
                limit -= tot
                if limit < 0:
                    raise ValueError("truncated JPEG entropy data")
                k += r
                if k > se:
                    raise ValueError("AC run past spectral band")
                v = (p16 >> (16 - tot)) & ((1 << s) - 1)
                block[k] = (v if v >= (1 << (s - 1)) else v - (1 << s) + 1) << al
                k += 1
                continue
            n -= ln
            acc &= (1 << n) - 1
            limit -= ln
            if limit < 0:
                raise ValueError("truncated JPEG entropy data")
            if s == 0:
                if r == 15:
                    k += 16  # ZRL
                    continue
                eob = (1 << r) - 1  # EOBn: this block + (run-1) more
                if r:
                    while n < r:
                        chunk = data[pos : pos + 8]
                        if chunk:
                            pos += len(chunk)
                            acc = (acc << (8 * len(chunk))) | int.from_bytes(
                                chunk, "big"
                            )
                            n += 8 * len(chunk)
                        else:
                            acc = (acc << 8) | 0xFF
                            n += 8
                    n -= r
                    eob += (acc >> n) & ((1 << r) - 1)
                    acc &= (1 << n) - 1
                    limit -= r
                    if limit < 0:
                        raise ValueError("truncated JPEG entropy data")
                break
            k += r
            if k > se:
                raise ValueError("AC run past spectral band")
            while n < s:
                chunk = data[pos : pos + 8]
                if chunk:
                    pos += len(chunk)
                    acc = (acc << (8 * len(chunk))) | int.from_bytes(chunk, "big")
                    n += 8 * len(chunk)
                else:
                    acc = (acc << 8) | 0xFF
                    n += 8
            n -= s
            v = (acc >> n) & ((1 << s) - 1)
            acc &= (1 << n) - 1
            limit -= s
            if limit < 0:
                raise ValueError("truncated JPEG entropy data")
            block[k] = (v if v >= (1 << (s - 1)) else v - (1 << s) + 1) << al
            k += 1


def _scan_dec_ac_refine(blocks, segs, restart_interval, lut, ss, se, al) -> None:
    """Whole-scan progressive AC-refine decoder (T.81 G.1.2.3, the
    libjpeg decode_mcu_AC_refine algorithm): newly-significant
    coefficients arrive as ±2^Al; every already-significant coefficient
    crossed on the way carries one correction bit; EOB runs carry
    correction bits for the rest of the band. Round-7 second pass: bit
    reader in locals for the whole scan, and each block's band is
    processed as a Python list (numpy scalar reads were ~10x a list
    element) with one slice write-back only when something changed."""
    p1, m1 = 1 << al, -1 << al
    data = segs[0]
    pos = acc = n = 0
    limit = 8 * len(data) + 16
    eob = 0
    length = se - ss
    for u, block in enumerate(blocks):
        if restart_interval and u and u % restart_interval == 0:
            data = segs[u // restart_interval]
            pos = acc = n = 0
            limit = 8 * len(data) + 16
            eob = 0
        band = block[ss : se + 1].tolist()
        dirty = False
        k = 0
        if eob == 0:
            while k <= length:
                while n < 16:
                    chunk = data[pos : pos + 8]
                    if chunk:
                        pos += len(chunk)
                        acc = (acc << (8 * len(chunk))) | int.from_bytes(
                            chunk, "big"
                        )
                        n += 8 * len(chunk)
                    else:
                        acc = (acc << 8) | 0xFF
                        n += 8
                e = lut[(acc >> (n - 16)) & 0xFFFF]
                if e == 0:
                    raise ValueError("invalid Huffman code")
                ln = e >> 8
                n -= ln
                acc &= (1 << n) - 1
                limit -= ln
                if limit < 0:
                    raise ValueError("truncated JPEG entropy data")
                sym = e & 0xFF
                r, s = sym >> 4, sym & 0x0F
                val = 0
                if s == 0:
                    if r < 15:
                        eob = 1 << r
                        if r:
                            while n < r:
                                chunk = data[pos : pos + 8]
                                if chunk:
                                    pos += len(chunk)
                                    acc = (acc << (8 * len(chunk))) | int.from_bytes(
                                        chunk, "big"
                                    )
                                    n += 8 * len(chunk)
                                else:
                                    acc = (acc << 8) | 0xFF
                                    n += 8
                            n -= r
                            eob += (acc >> n) & ((1 << r) - 1)
                            acc &= (1 << n) - 1
                            limit -= r
                            if limit < 0:
                                raise ValueError("truncated JPEG entropy data")
                        break
                    # r == 15 (ZRL): skip 16 zero-history coefficients below
                else:
                    if s != 1:
                        raise ValueError("bad AC refinement symbol")
                    if not n:
                        chunk = data[pos : pos + 8]
                        if chunk:
                            pos += len(chunk)
                            acc = int.from_bytes(chunk, "big")
                            n = 8 * len(chunk)
                        else:
                            acc = 0xFF
                            n = 8
                    n -= 1
                    limit -= 1
                    if limit < 0:
                        raise ValueError("truncated JPEG entropy data")
                    if acc >> n:
                        acc &= (1 << n) - 1
                        val = p1
                    else:
                        val = m1
                while k <= length:
                    c = band[k]
                    if c != 0:
                        if not n:
                            chunk = data[pos : pos + 8]
                            if chunk:
                                pos += len(chunk)
                                acc = int.from_bytes(chunk, "big")
                                n = 8 * len(chunk)
                            else:
                                acc = 0xFF
                                n = 8
                        n -= 1
                        limit -= 1
                        if limit < 0:
                            raise ValueError("truncated JPEG entropy data")
                        if acc >> n:
                            acc &= (1 << n) - 1
                            if (c & p1) == 0:
                                band[k] = c + (p1 if c >= 0 else m1)
                                dirty = True
                    else:
                        if r == 0:
                            break
                        r -= 1
                    k += 1
                if val and k <= length:
                    band[k] = val
                    dirty = True
                k += 1
        if eob > 0:
            # the EOB-run tail reads exactly one correction bit per
            # ALREADY-significant coefficient, regardless of bit values —
            # pull all their bits in one refill-and-mask (MSB-first, same
            # stream order). All-zero tails consume nothing.
            nz = [i for i in range(k, length + 1) if band[i]]
            m = len(nz)
            if m:
                while n < m:
                    chunk = data[pos : pos + 8]
                    if chunk:
                        pos += len(chunk)
                        acc = (acc << (8 * len(chunk))) | int.from_bytes(
                            chunk, "big"
                        )
                        n += 8 * len(chunk)
                    else:
                        acc = (acc << 8) | 0xFF
                        n += 8
                n -= m
                bits_val = (acc >> n) & ((1 << m) - 1)
                acc &= (1 << n) - 1
                limit -= m
                if limit < 0:
                    raise ValueError("truncated JPEG entropy data")
                if bits_val:
                    for i, kk in enumerate(nz):
                        if (bits_val >> (m - 1 - i)) & 1:
                            c = band[kk]
                            if (c & p1) == 0:
                                band[kk] = c + (p1 if c >= 0 else m1)
                                dirty = True
            eob -= 1
        if dirty:
            block[ss : se + 1] = band


def jpeg_decode(data: bytes) -> np.ndarray:
    """Decode a JFIF/JPEG: baseline (SOF0/1) or progressive (SOF2) with
    spectral selection + successive approximation. Returns uint8 HxW
    (gray) or HxWx3 RGB."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], np.ndarray] = {}
    frame = None  # (h, w, [(cid, hi, vi, tq)], progressive)
    restart_interval = 0
    stores: list[np.ndarray] = []
    saw_scan = False

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
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
            prec, fh_, fw_, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            comps = []
            for i in range(nc):
                cid, hv, tq = body[6 + 3 * i : 9 + 3 * i]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            frame = (fh_, fw_, comps, marker == 0xC2)
            hmax = max(c[1] for c in comps)
            vmax = max(c[2] for c in comps)
            mcux = -(-fw_ // (8 * hmax))
            mcuy = -(-fh_ // (8 * vmax))
            # per-component zigzag coefficient stores (mcu-aligned)
            stores = [
                np.zeros((mcuy * vi * mcux * hi, 64), dtype=np.int64)
                for _cid, hi, vi, _tq in comps
            ]
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("only baseline (SOF0) or progressive (SOF2) JPEG supported")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            scan_sel = []  # (component index, dc table id, ac table id)
            cid_to_ci = {c[0]: i for i, c in enumerate(frame[2])}
            for i in range(ns):
                cs, tt = body[1 + 2 * i], body[2 + 2 * i]
                scan_sel.append((cid_to_ci[cs], tt >> 4, tt & 0x0F))
            ss, se, ahal = body[1 + 2 * ns : 4 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0x0F
            segs, end_abs = _split_entropy(data, pos + seglen)
            _decode_one_scan(
                frame, scan_sel, ss, se, ah, al, segs, stores,
                htables, restart_interval,
            )
            saw_scan = True
            pos = end_abs
            continue
        pos += seglen

    if frame is None or not saw_scan:
        raise ValueError("truncated JPEG (no frame/scan)")
    fh, fw, comps, _prog = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-fw // (8 * hmax))
    mcuy = -(-fh // (8 * vmax))

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
