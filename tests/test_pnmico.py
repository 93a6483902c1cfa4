"""PNM (P1-P6) and ICO codecs — round-6 PIL-long-tail coverage.

Same validation pattern as the other from-scratch codecs: fixture
encoder exercises the decoder's hard paths, exact round-trips for
lossless configurations, fuzzing for the quarantine contract."""

from __future__ import annotations

import numpy as np
import pytest

from vietnamese_ocr_spark.functions.imaging import decode_image, grayscale
from vietnamese_ocr_spark.functions.pnmico import (
    ico_decode,
    ico_encode,
    pbm_encode,
    pnm_decode,
    pnm_encode,
)

RNG = np.random.RandomState(6)


@pytest.mark.parametrize("ascii_format", [False, True])
def test_pgm_roundtrip_gray(ascii_format):
    arr = RNG.randint(0, 256, (11, 17), dtype=np.uint8)
    assert np.array_equal(pnm_decode(pnm_encode(arr, ascii_format)), arr)


@pytest.mark.parametrize("ascii_format", [False, True])
def test_ppm_roundtrip_rgb(ascii_format):
    arr = RNG.randint(0, 256, (7, 5, 3), dtype=np.uint8)
    assert np.array_equal(pnm_decode(pnm_encode(arr, ascii_format)), arr)


def test_pgm_16bit_maxval_roundtrip_exact():
    arr = RNG.randint(0, 256, (9, 13), dtype=np.uint8)
    out = pnm_decode(pnm_encode(arr, maxval=65535))
    assert np.array_equal(out, arr)


def test_pgm_coarse_maxval_scales():
    # maxval 15: quantized to 16 levels; decode must round-half-up back
    arr = np.arange(0, 256, 16, dtype=np.uint8).reshape(4, 4)
    out = pnm_decode(pnm_encode(arr, maxval=15))
    assert out.shape == arr.shape
    assert int(np.abs(out.astype(int) - arr.astype(int)).max()) <= 17


@pytest.mark.parametrize("ascii_format", [False, True])
def test_pbm_bits_black_is_zero(ascii_format):
    bits = RNG.randint(0, 2, (10, 19), dtype=np.uint8)  # odd width: padding
    out = pnm_decode(pbm_encode(bits, ascii_format))
    assert np.array_equal(out, np.where(bits == 1, 0, 255).astype(np.uint8))


def test_pnm_header_comments_skipped():
    data = b"P2\n# c1\n3 # inline\n2\n# before maxval\n255\n0 10 20 30 40 50\n"
    out = pnm_decode(data)
    assert np.array_equal(out, np.array([[0, 10, 20], [30, 40, 50]], np.uint8))


def test_pnm_quarantines():
    with pytest.raises(ValueError):
        pnm_decode(b"P7\n1 1\n255\n\x00")  # PAM unsupported
    with pytest.raises(ValueError):
        pnm_decode(b"P5\n3 2\n255\n\x00\x01")  # truncated data
    with pytest.raises(ValueError):
        pnm_decode(b"P2\n2 1\n100\n5 101\n")  # sample > maxval
    with pytest.raises(ValueError):
        pnm_decode(b"P5\n0 4\n255\n")  # zero dimension


@pytest.mark.parametrize("bpp", [8, 24, 32])
def test_ico_dib_roundtrip(bpp):
    if bpp == 8:
        arr = RNG.randint(0, 256, (13, 9), dtype=np.uint8)
    else:
        arr = RNG.randint(0, 256, (13, 9, 3), dtype=np.uint8)
    out = ico_decode(ico_encode(arr, bpp=bpp))
    assert np.array_equal(out, arr)


def test_ico_png_entry_routes_to_png_decoder():
    arr = RNG.randint(0, 256, (16, 16), dtype=np.uint8)
    assert np.array_equal(ico_decode(ico_encode(arr, as_png=True)), arr)


def test_ico_picks_largest_entry():
    import struct

    small = RNG.randint(0, 256, (4, 4), dtype=np.uint8)
    big = RNG.randint(0, 256, (16, 16), dtype=np.uint8)
    e_small = ico_encode(small)
    e_big = ico_encode(big)
    blob_s, blob_b = e_small[22:], e_big[22:]
    head = struct.pack("<HHH", 0, 1, 2)
    off1 = 6 + 32
    ent1 = struct.pack("<BBBBHHII", 4, 4, 0, 0, 1, 8, len(blob_s), off1)
    ent2 = struct.pack(
        "<BBBBHHII", 16, 16, 0, 0, 1, 8, len(blob_b), off1 + len(blob_s)
    )
    out = ico_decode(head + ent1 + ent2 + blob_s + blob_b)
    assert np.array_equal(out, big)


def test_ico_low_bpp_palette_packing():
    """4- and 1-bpp DIB entries: hand-packed nibbles/bits + palette."""
    import struct

    # 4bpp, 3x2, palette of 16 gray steps
    idx = np.array([[0, 5, 15], [7, 1, 2]], dtype=np.uint8)
    pal = b"".join(bytes([v * 17] * 3) + b"\x00" for v in range(16))
    stride = (3 * 4 + 31) // 32 * 4
    rows = bytearray()
    for y in (1, 0):  # bottom-up
        r = bytes(
            [(idx[y, 0] << 4) | idx[y, 1], idx[y, 2] << 4]
        )
        rows += r + b"\x00" * (stride - len(r))
    and_rows = b"\x00" * (((3 + 31) // 32 * 4) * 2)
    dib = struct.pack(
        "<IiiHHIIiiII", 40, 3, 4, 1, 4, 0, 0, 0, 0, 16, 0
    )
    blob = dib + pal + bytes(rows) + and_rows
    data = (
        struct.pack("<HHH", 0, 1, 1)
        + struct.pack("<BBBBHHII", 3, 2, 16, 0, 1, 4, len(blob), 22)
        + blob
    )
    out = ico_decode(data)
    assert np.array_equal(out, idx * 17)


def test_ico_quarantines():
    with pytest.raises(ValueError):
        ico_decode(b"\x00\x00\x02\x00\x01\x00" + b"\x00" * 16)  # CUR
    with pytest.raises(ValueError):
        ico_decode(b"\x00\x00\x01\x00\x00\x00")  # zero entries
    good = ico_encode(np.zeros((4, 4), dtype=np.uint8))
    with pytest.raises(ValueError):
        ico_decode(good[:30])  # truncated


def test_decode_image_pnm_and_ico():
    gray = RNG.randint(0, 256, (8, 8), dtype=np.uint8)
    rgb = RNG.randint(0, 256, (8, 8, 3), dtype=np.uint8)
    assert np.array_equal(decode_image(pnm_encode(gray)), gray)
    assert np.array_equal(decode_image(pnm_encode(rgb)), grayscale(rgb))
    assert np.array_equal(decode_image(ico_encode(gray)), gray)
    assert np.array_equal(decode_image(ico_encode(rgb, bpp=32)), grayscale(rgb))
