"""BMP + GIF codecs (functions/gifbmp.py): lossless round-trips through
our own encoders (both formats are lossless, so encode->decode must be
exact), LZW dictionary-growth/reset paths, interlacing, and the
decode_image dispatch."""

from __future__ import annotations

import numpy as np
import pytest

from vietnamese_ocr_spark.functions.gifbmp import (
    _lzw_decode,
    _lzw_encode,
    bmp_decode,
    bmp_encode,
    gif_decode,
    gif_encode,
)
from vietnamese_ocr_spark.functions.imaging import decode_image, grayscale


def _gray(h, w, seed=0):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(h, w), dtype=np.uint8)


def _rgb(h, w, seed=0):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)


# -- BMP ----------------------------------------------------------------------


@pytest.mark.parametrize("w", [1, 3, 4, 5, 64])  # odd widths force row padding
@pytest.mark.parametrize("top_down", [False, True])
def test_bmp_gray_roundtrip(w, top_down):
    img = _gray(7, w)
    assert np.array_equal(bmp_decode(bmp_encode(img, top_down=top_down)), img)


@pytest.mark.parametrize("w", [1, 2, 5, 33])
def test_bmp_rgb_roundtrip(w):
    img = _rgb(6, w)
    assert np.array_equal(bmp_decode(bmp_encode(img)), img)


def test_bmp_32bit_decode():
    """Hand-build a 32-bpp BMP (BGRA, no padding needed): alpha dropped."""
    import struct

    img = _rgb(3, 5, seed=2)
    body = bytearray()
    for y in range(2, -1, -1):  # bottom-up
        for x in range(5):
            r, g, b = img[y, x]
            body += bytes([b, g, r, 0x80])
    dib = struct.pack("<IiiHHIIiiII", 40, 5, 3, 1, 32, 0, len(body), 0, 0, 0, 0)
    head = struct.pack("<2sIHHI", b"BM", 54 + len(body), 0, 0, 54)
    assert np.array_equal(bmp_decode(head + dib + bytes(body)), img)


def test_bmp_rejects_compressed_and_truncated():
    img = _gray(4, 4)
    data = bytearray(bmp_encode(img))
    data[30] = 1  # BI_RLE8
    with pytest.raises(ValueError):
        bmp_decode(bytes(data))
    with pytest.raises(ValueError):
        bmp_decode(bmp_encode(img)[:-8])


# -- LZW ----------------------------------------------------------------------


@pytest.mark.parametrize("min_code", [2, 4, 8])
def test_lzw_roundtrip_random(min_code):
    rng = np.random.RandomState(1)
    data = rng.randint(0, 1 << min_code, size=5000).astype(np.uint8).tobytes()
    assert _lzw_decode(_lzw_encode(data, min_code), min_code, len(data)) == data


def test_lzw_roundtrip_crosses_every_width_and_resets():
    """Random 8-bit noise long enough that the dictionary grows through
    every code width 9..12 and overflows 4096 entries (CLEAR + reset
    mid-stream) — the paths where encoder/decoder width-bump timing
    mismatches would corrupt output."""
    rng = np.random.RandomState(7)
    data = rng.randint(0, 256, size=40_000).astype(np.uint8).tobytes()
    enc = _lzw_encode(data, 8)
    assert _lzw_decode(enc, 8, len(data)) == data


def test_lzw_self_reference_case():
    # "aaa...": the code==next-free (prev+prev[0]) decoder branch
    data = b"\x00" * 500
    assert _lzw_decode(_lzw_encode(data, 2), 2, 500) == data


# -- GIF ----------------------------------------------------------------------


@pytest.mark.parametrize("interlace", [False, True])
@pytest.mark.parametrize("local_palette", [False, True])
def test_gif_gray_roundtrip(interlace, local_palette):
    img = _gray(13, 21)  # odd sizes stress the interlace pass math
    data = gif_encode(img, interlace=interlace, local_palette=local_palette)
    assert np.array_equal(gif_decode(data), img)


def test_gif_color_palette_roundtrip():
    palette = np.stack(
        [np.arange(16) * 17, np.arange(16) * 13 % 256, np.arange(16) * 7 % 256],
        axis=-1,
    ).astype(np.uint8)
    idx = (_gray(9, 9) // 16).astype(np.uint8)
    got = gif_decode(gif_encode(idx, palette=palette))
    assert got.shape == (9, 9, 3)
    assert np.array_equal(got, palette[idx])


def test_gif_87a_and_extension_skipping():
    img = _gray(5, 8)
    data = bytearray(gif_encode(img))
    data[:6] = b"GIF87a"
    assert np.array_equal(gif_decode(bytes(data)), img)


def test_gif_rejects_truncated_and_empty():
    img = _gray(6, 6)
    with pytest.raises(ValueError):
        gif_decode(gif_encode(img)[:20])
    with pytest.raises(ValueError):
        gif_decode(b"GIF89a" + b"\x00" * 7 + b"\x3b")


# -- decode_image dispatch ----------------------------------------------------


def test_decode_image_bmp_gray_exact():
    img = _gray(16, 40, seed=3)
    assert np.array_equal(decode_image(bmp_encode(img)), img)


def test_decode_image_bmp_rgb_is_bt601():
    img = _rgb(8, 8, seed=4)
    assert np.array_equal(decode_image(bmp_encode(img)), grayscale(img))


def test_decode_image_gif_gray_exact():
    img = _gray(16, 40, seed=5)
    assert np.array_equal(decode_image(gif_encode(img)), img)


def test_decode_image_gif_color_is_bt601():
    palette = np.stack(
        [np.arange(256), np.roll(np.arange(256), 3), np.arange(256)[::-1]],
        axis=-1,
    ).astype(np.uint8)
    idx = _gray(10, 10, seed=6)
    assert np.array_equal(
        decode_image(gif_encode(idx, palette=palette)), grayscale(palette[idx])
    )


def test_decode_image_still_rejects_unknown():
    with pytest.raises(ValueError):
        decode_image(b"RIFF\x00\x00\x00\x00WEBP")


def test_gif_offset_frame_pastes_onto_logical_screen():
    """Round-6 (advice): a first frame smaller than / offset within the
    logical screen must come back at the FULL screen geometry with the
    frame pasted at (top, left) over the background index — PIL's
    behavior (reference ingestion, src/utils/inference.py:125)."""
    import struct

    import numpy as np

    from vietnamese_ocr_spark.functions.gifbmp import gif_decode, gif_encode

    frame = np.array([[10, 20], [30, 40]], dtype=np.uint8)
    data = bytearray(gif_encode(frame))
    # widen the logical screen to 6x5, set background index 7,
    # and move the image descriptor to (left=3, top=1)
    struct.pack_into("<HH", data, 6, 6, 5)
    data[11] = 7
    desc = data.index(0x2C, 13 + 768)
    struct.pack_into("<HH", data, desc + 1, 3, 1)
    out = gif_decode(bytes(data))
    assert out.shape == (5, 6)
    expect = np.full((5, 6), 7, dtype=np.uint8)
    expect[1:3, 3:5] = frame
    assert np.array_equal(out, expect)


def test_gif_frame_outside_screen_quarantines():
    import struct

    import numpy as np
    import pytest

    from vietnamese_ocr_spark.functions.gifbmp import gif_decode, gif_encode

    data = bytearray(gif_encode(np.zeros((2, 2), dtype=np.uint8)))
    desc = data.index(0x2C, 13 + 768)
    struct.pack_into("<HH", data, desc + 1, 1, 1)  # 2x2 at (1,1) on 2x2
    with pytest.raises(ValueError, match="outside logical screen"):
        gif_decode(bytes(data))
