"""RIFF/WAVE PCM codec in pure NumPy — a REAL audio decode path.

Upgrades the multimodal audio stage from digest-stub to real for
`audio/wav`: standard RIFF container, PCM format 1, 8-bit unsigned or
16-bit signed samples, any channel count (averaged to mono float32 in
[-1, 1] — the usual feature-extraction front end). Unknown chunks are
skipped by their declared size, as the RIFF spec requires.

The encoder exists for fixtures/tests (and as the inverse contract);
both directions are deterministic.
"""

from __future__ import annotations

import struct

import numpy as np


def wav_encode(pcm: np.ndarray, sample_rate: int, bits: int = 16) -> bytes:
    """mono float32 [-1, 1] -> RIFF/WAVE PCM bytes (8 or 16 bit)."""
    if pcm.ndim != 1:
        raise ValueError("wav_encode expects mono 1-D float")
    if bits == 16:
        data = (
            np.clip(np.round(pcm.astype(np.float64) * 32767.0), -32768, 32767)
            .astype("<i2")
            .tobytes()
        )
    elif bits == 8:
        data = (
            np.clip(np.round(pcm.astype(np.float64) * 127.0) + 128, 0, 255)
            .astype(np.uint8)
            .tobytes()
        )
    else:
        raise ValueError("bits must be 8 or 16")
    block_align = bits // 8
    fmt = struct.pack(
        "<HHIIHH", 1, 1, sample_rate, sample_rate * block_align, block_align, bits
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def wav_decode(data: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM bytes -> (mono float32 in [-1, 1], sample_rate).

    Multi-channel input is averaged to mono; 8-bit (unsigned) and
    16-bit (signed little-endian) PCM supported; other codecs raise
    ValueError (callers quarantine, same contract as decode_image)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    fmt = None
    pcm_bytes = None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size & 1)  # chunks are word-aligned
        if tag == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif tag == b"data":
            pcm_bytes = body
    if fmt is None or pcm_bytes is None:
        raise ValueError("truncated WAV (missing fmt/data chunk)")
    audio_format, channels, sample_rate, _byte_rate, _block_align, bits = fmt
    if audio_format != 1:
        raise ValueError(f"only PCM WAV supported (format={audio_format})")
    if bits == 16:
        samples = np.frombuffer(
            pcm_bytes[: len(pcm_bytes) // 2 * 2], dtype="<i2"
        ).astype(np.float32) / np.float32(32767.0)
    elif bits == 8:
        samples = (
            np.frombuffer(pcm_bytes, dtype=np.uint8).astype(np.float32)
            - np.float32(128.0)
        ) / np.float32(127.0)
    else:
        raise ValueError(f"unsupported PCM width {bits}")
    if channels > 1:
        usable = len(samples) // channels * channels
        samples = samples[:usable].reshape(-1, channels).mean(axis=1)
    return samples.astype(np.float32), int(sample_rate)


# -- AIFF (big-endian IFF) ----------------------------------------------------


def _f80_encode(rate: int) -> bytes:
    """Integer sample rate -> 80-bit IEEE 754 extended (AIFF COMM)."""
    if rate <= 0:
        raise ValueError("bad sample rate")
    e = rate.bit_length() - 1
    mant = rate << (63 - e)  # normalized: top bit set
    return struct.pack(">HQ", 16383 + e, mant)


def _f80_decode(b: bytes) -> int:
    se, mant = struct.unpack(">HQ", b[:10])
    if se & 0x8000:  # round-7 advice fix: a negative sample rate must
        # quarantine, not decode to a positive value that passes the
        # rate sanity check
        raise ValueError("negative AIFF sample rate")
    exp = se & 0x7FFF
    if mant == 0:
        return 0
    val = mant * 2.0 ** (exp - 16383 - 63)
    return int(round(val))


def aiff_encode(pcm: np.ndarray, sample_rate: int) -> bytes:
    """mono float32 [-1, 1] -> AIFF (16-bit big-endian PCM fixture)."""
    if pcm.ndim != 1:
        raise ValueError("aiff_encode expects mono 1-D float")
    data = (
        np.clip(np.round(pcm.astype(np.float64) * 32767.0), -32768, 32767)
        .astype(">i2")
        .tobytes()
    )
    comm = struct.pack(">HIH", 1, len(pcm), 16) + _f80_encode(sample_rate)
    ssnd = struct.pack(">II", 0, 0) + data
    body = (
        b"AIFF"
        + b"COMM" + struct.pack(">I", len(comm)) + comm
        + b"SSND" + struct.pack(">I", len(ssnd)) + ssnd
    )
    return b"FORM" + struct.pack(">I", len(body)) + body


def aiff_decode(data: bytes) -> tuple[np.ndarray, int]:
    """AIFF (uncompressed big-endian PCM, 8/16-bit) -> (mono float32,
    rate). AIFC/compressed variants raise ValueError (quarantine)."""
    if data[:4] != b"FORM" or data[8:12] != b"AIFF":
        raise ValueError("not an AIFF file")
    pos = 12
    comm = None
    sound = None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (size,) = struct.unpack(">I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size & 1)
        if tag == b"COMM":
            if len(body) < 18:
                raise ValueError("truncated AIFF COMM")
            ch, _frames, bits = struct.unpack(">HIH", body[:8])
            rate = _f80_decode(body[8:18])
            comm = (ch, bits, rate)
        elif tag == b"SSND":
            off, _blk = struct.unpack(">II", body[:8])
            sound = body[8 + off :]
    if comm is None or sound is None:
        raise ValueError("truncated AIFF (missing COMM/SSND)")
    ch, bits, rate = comm
    if ch < 1 or rate <= 0:
        raise ValueError("bad AIFF COMM values")
    if bits == 16:
        samples = np.frombuffer(
            sound[: len(sound) // 2 * 2], dtype=">i2"
        ).astype(np.float32) / np.float32(32767.0)
    elif bits == 8:  # AIFF 8-bit is SIGNED (unlike WAV)
        samples = np.frombuffer(sound, dtype=np.int8).astype(
            np.float32
        ) / np.float32(127.0)
    else:
        raise ValueError(f"unsupported AIFF sample width {bits}")
    if ch > 1:
        usable = len(samples) // ch * ch
        samples = samples[:usable].reshape(-1, ch).mean(axis=1)
    return samples.astype(np.float32), int(rate)


# -- Sun AU (.snd) ------------------------------------------------------------

_ULAW_LUT = None


def _ulaw_table() -> np.ndarray:
    """G.711 mu-law expansion, computed from the public formula."""
    global _ULAW_LUT
    if _ULAW_LUT is None:
        out = np.empty(256, dtype=np.float32)
        for b in range(256):
            u = ~b & 0xFF
            mag = ((((u & 0x0F) << 3) + 0x84) << ((u >> 4) & 0x07)) - 0x84
            out[b] = (-mag if u & 0x80 else mag) / 32124.0
        _ULAW_LUT = out
    return _ULAW_LUT


def au_encode(pcm: np.ndarray, sample_rate: int, encoding: int = 3) -> bytes:
    """mono float32 -> Sun AU. encoding 3 = 16-bit linear BE (fixture),
    2 = 8-bit linear."""
    if pcm.ndim != 1:
        raise ValueError("au_encode expects mono 1-D float")
    if encoding == 3:
        data = (
            np.clip(np.round(pcm.astype(np.float64) * 32767.0), -32768, 32767)
            .astype(">i2")
            .tobytes()
        )
    elif encoding == 2:
        data = (
            np.clip(np.round(pcm.astype(np.float64) * 127.0), -128, 127)
            .astype(np.int8)
            .tobytes()
        )
    else:
        raise ValueError("fixture encoder supports encodings 2 and 3")
    return struct.pack(">4sIIIII", b".snd", 24, len(data), encoding,
                       sample_rate, 1) + data


def au_decode(data: bytes) -> tuple[np.ndarray, int]:
    """Sun AU -> (mono float32, rate): mu-law (1), 8-bit (2) and
    16-bit big-endian (3) linear PCM."""
    if data[:4] != b".snd" or len(data) < 24:
        raise ValueError("not a Sun AU file")
    _, off, size, enc, rate, ch = struct.unpack(">4sIIIII", data[:24])
    if off < 24 or off > len(data) or ch < 1 or rate <= 0:
        raise ValueError("bad AU header")
    body = data[off:]
    if size != 0xFFFFFFFF:
        body = body[:size]
    if enc == 1:
        samples = _ulaw_table()[np.frombuffer(body, dtype=np.uint8)]
    elif enc == 2:
        samples = np.frombuffer(body, dtype=np.int8).astype(
            np.float32
        ) / np.float32(127.0)
    elif enc == 3:
        samples = np.frombuffer(
            body[: len(body) // 2 * 2], dtype=">i2"
        ).astype(np.float32) / np.float32(32767.0)
    else:
        raise ValueError(f"unsupported AU encoding {enc}")
    if ch > 1:
        usable = len(samples) // ch * ch
        samples = samples[:usable].reshape(-1, ch).mean(axis=1)
    return samples.astype(np.float32), int(rate)
