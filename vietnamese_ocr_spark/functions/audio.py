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
