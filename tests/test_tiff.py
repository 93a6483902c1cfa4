"""Baseline TIFF codec (functions/tiff.py): lossless round-trips through
our own encoder across byte orders / compression / predictor / strip
layouts, TIFF-LZW early-change width timing, palette + WhiteIsZero
semantics, and the decode_image dispatch."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from vietnamese_ocr_spark.functions.tiff import (
    _lzw_decode,
    _lzw_encode,
    tiff_decode,
    tiff_encode,
)
from vietnamese_ocr_spark.functions.imaging import decode_image, grayscale


def _gray(h, w, seed=0):
    return np.random.RandomState(seed).randint(0, 256, (h, w), dtype=np.uint8)


def _rgb(h, w, seed=0):
    return np.random.RandomState(seed).randint(0, 256, (h, w, 3), dtype=np.uint8)


@pytest.mark.parametrize("big_endian", [False, True])
@pytest.mark.parametrize("compression", ["none", "lzw"])
@pytest.mark.parametrize("predictor", [False, True])
def test_tiff_gray_roundtrip(big_endian, compression, predictor):
    img = _gray(11, 23)
    data = tiff_encode(img, compression=compression, predictor=predictor,
                       big_endian=big_endian)
    assert np.array_equal(tiff_decode(data), img)


@pytest.mark.parametrize("compression", ["none", "lzw"])
def test_tiff_rgb_roundtrip_multistrip(compression):
    img = _rgb(37, 19, seed=1)
    data = tiff_encode(img, compression=compression, rows_per_strip=8)
    assert np.array_equal(tiff_decode(data), img)


def test_tiff_lzw_crosses_every_width_and_resets():
    """40k random bytes force the dictionary through widths 9..12 and
    past the 4094-entry ClearCode reset — the early-change timing (one
    code sooner than GIF) corrupts everything after code 510 if either
    side is off by one."""
    rng = np.random.RandomState(5)
    data = rng.randint(0, 256, 40_000).astype(np.uint8).tobytes()
    assert _lzw_decode(_lzw_encode(data), len(data)) == data


def test_tiff_lzw_repetitive_input():
    data = b"ab" * 3000 + b"\x00" * 2000
    assert _lzw_decode(_lzw_encode(data), len(data)) == data


def test_tiff_white_is_zero_inverts():
    img = _gray(6, 6, seed=2)
    data = bytearray(tiff_encode(img))
    # flip Photometric tag (262) value from 1 to 0 in place
    i = data.find(struct.pack("<HHI", 262, 3, 1))
    assert i > 0
    assert data[i + 8] == 1
    data[i + 8] = 0
    assert np.array_equal(tiff_decode(bytes(data)), 255 - img)


def test_tiff_palette_decode():
    """Hand-built photometric-3 TIFF: indices + 16-bit-valued ColorMap."""
    idx = (np.arange(20, dtype=np.uint8).reshape(4, 5) % 7)
    pal8 = np.stack([np.arange(7) * 30, np.arange(7) * 20, np.arange(7) * 10],
                    axis=-1).astype(np.uint8)
    body = idx.tobytes()
    cmap16 = np.zeros(3 * 256, dtype=np.uint16)
    for c in range(3):
        cmap16[c * 256 : c * 256 + 7] = pal8[:, c].astype(np.uint16) << 8
    tags = [
        (256, 3, 1, [5]), (257, 3, 1, [4]), (258, 3, 1, [8]),
        (259, 3, 1, [1]), (262, 3, 1, [3]), (273, 4, 1, [8]),
        (277, 3, 1, [1]), (278, 3, 1, [4]), (279, 4, 1, [len(body)]),
        (320, 3, 3 * 256, list(cmap16)),
    ]
    ifd_off = 8 + len(body)
    extra_base = ifd_off + 2 + 12 * len(tags) + 4
    extra = bytearray()
    entries = b""
    for tag, typ, count, values in tags:
        size = 2 * count if typ == 3 else 4 * count
        fmt = "H" if typ == 3 else "I"
        packed = struct.pack(f"<{count}{fmt}", *values)
        if size <= 4:
            field = packed + b"\x00" * (4 - size)
        else:
            field = struct.pack("<I", extra_base + len(extra))
            extra += packed
        entries += struct.pack("<HHI", tag, typ, count) + field
    data = (b"II*\x00" + struct.pack("<I", ifd_off) + body
            + struct.pack("<H", len(tags)) + entries + struct.pack("<I", 0)
            + bytes(extra))
    got = tiff_decode(data)
    assert got.shape == (4, 5, 3)
    assert np.array_equal(got, pal8[idx])


def test_tiff_rejects_unsupported():
    img = _gray(4, 4)
    data = bytearray(tiff_encode(img))
    i = data.find(struct.pack("<HHI", 259, 3, 1))
    data[i + 8] = 7  # JPEG-in-TIFF
    with pytest.raises(ValueError):
        tiff_decode(bytes(data))
    with pytest.raises(ValueError):
        tiff_decode(b"II\x00\x00 not tiff")
    with pytest.raises(ValueError):
        tiff_decode(tiff_encode(img)[:-6])


def test_decode_image_tiff_gray_and_rgb():
    g = _gray(16, 40, seed=7)
    assert np.array_equal(decode_image(tiff_encode(g, compression="lzw")), g)
    c = _rgb(9, 9, seed=8)
    assert np.array_equal(
        decode_image(tiff_encode(c, predictor=True, compression="lzw")),
        grayscale(c),
    )


def test_packbits_roundtrip_and_strips():
    """Round-6: PackBits (compression 32773, TIFF 6.0 section 9) — the
    other compression scanned TIFFs commonly carry."""
    import numpy as np
    import pytest

    from vietnamese_ocr_spark.functions.tiff import (
        _packbits_decode,
        _packbits_encode,
        tiff_decode,
        tiff_encode,
    )

    rng = np.random.RandomState(8)
    for blob in (b"", b"a", b"ab" * 300, b"\x00" * 1000,
                 bytes(rng.randint(0, 3, 5000, dtype=np.uint8)),
                 bytes(rng.randint(0, 256, 2000, dtype=np.uint8))):
        assert _packbits_decode(_packbits_encode(blob), len(blob)) == blob
    gray = rng.randint(0, 4, (40, 33), dtype=np.uint8) * 80  # runs
    rgb = rng.randint(0, 256, (17, 11, 3), dtype=np.uint8)
    for arr in (gray, rgb):
        enc = tiff_encode(arr, compression="packbits", rows_per_strip=7)
        assert np.array_equal(tiff_decode(enc), arr)
    with pytest.raises(ValueError):
        _packbits_decode(b"\x05ab", 6)  # truncated literal


def test_packbits_through_decode_image():
    import numpy as np

    from vietnamese_ocr_spark.functions.imaging import decode_image
    from vietnamese_ocr_spark.functions.tiff import tiff_encode

    rng = np.random.RandomState(9)
    img = rng.randint(0, 256, (12, 21), dtype=np.uint8)
    assert np.array_equal(
        decode_image(tiff_encode(img, compression="packbits")), img
    )
