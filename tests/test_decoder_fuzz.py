"""Quarantine-contract fuzz: every decoder either succeeds or raises
ValueError-family errors the stages catch — never hangs, never escapes
with something uncatchable. At 10^12 docs every byte pattern WILL occur;
the pipeline's quarantine path (decode_ok=False) depends on decoders
failing fast and cleanly."""

from __future__ import annotations

import numpy as np
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from vietnamese_ocr_spark.functions.audio import wav_decode
from vietnamese_ocr_spark.functions.gifbmp import bmp_decode, gif_decode
from vietnamese_ocr_spark.functions.imaging import decode_image, png_decode
from vietnamese_ocr_spark.functions.jpeg import jpeg_decode
from vietnamese_ocr_spark.functions.pdf import pdf_lines
from vietnamese_ocr_spark.functions.pnmico import ico_decode, pnm_decode
from vietnamese_ocr_spark.functions.tiff import tiff_decode
from vietnamese_ocr_spark.functions.webp import webp_decode

_CAUGHT = (ValueError, KeyError, IndexError, OverflowError, TypeError,
           ZeroDivisionError, MemoryError)

_SETTINGS = dict(max_examples=40, deadline=None,
                 suppress_health_check=[HealthCheck.too_slow])


@given(st.binary(min_size=0, max_size=400))
@settings(**_SETTINGS)
def test_random_bytes_never_escape(data):
    for dec in (decode_image, png_decode, jpeg_decode, wav_decode, pdf_lines,
                bmp_decode, gif_decode, tiff_decode, pnm_decode, ico_decode,
                webp_decode):
        try:
            dec(data)
        except _CAUGHT:
            pass
        except Exception as ex:  # zlib.error etc. subclass Exception; fine
            assert isinstance(ex, Exception), type(ex)


@given(st.data())
@settings(**_SETTINGS)
def test_truncated_valid_streams_fail_cleanly(data):
    """Prefixes of VALID streams (the realistic corruption: a cut-off
    upload) must raise cleanly or decode — never hang or segfault-class
    fail."""
    from vietnamese_ocr_spark.functions.imaging import png_encode
    from vietnamese_ocr_spark.functions.jpeg import jpeg_encode
    from vietnamese_ocr_spark.functions.pdf import pdf_encode

    rng = np.random.default_rng(data.draw(st.integers(0, 2**16)))
    img = rng.integers(0, 256, (16, 24), dtype=np.uint8)
    from vietnamese_ocr_spark.functions.gifbmp import bmp_encode, gif_encode
    from vietnamese_ocr_spark.functions.imaging import (
        png_encode_16,
        png_encode_interlaced,
    )
    from vietnamese_ocr_spark.functions.tiff import tiff_encode

    streams = [
        png_encode(img),
        png_encode_interlaced(img, filter_type=3),
        png_encode_16(img.astype(np.uint16) << 8),
        jpeg_encode(img, 80),
        jpeg_encode(img, 80, progressive=True),
        pdf_encode([[(72, 700, 10, "short fuzz doc")]]),
        bmp_encode(img),
        gif_encode(img, interlace=True),
        tiff_encode(img, compression="lzw", predictor=True),
        __import__("vietnamese_ocr_spark.functions.pnmico", fromlist=["x"]).pnm_encode(img),
        __import__("vietnamese_ocr_spark.functions.pnmico", fromlist=["x"]).ico_encode(img),
        __import__("vietnamese_ocr_spark.functions.webp", fromlist=["x"]).webp_encode(img, subtract_green=True),
    ]
    blob = streams[data.draw(st.integers(0, len(streams) - 1))]
    cut = data.draw(st.integers(0, len(blob) - 1))
    for dec in (decode_image, pdf_lines):
        try:
            dec(blob[:cut])
        except Exception as ex:
            assert isinstance(ex, Exception), type(ex)


@given(st.data())
@settings(**_SETTINGS)
def test_bitflipped_streams_fail_cleanly_or_decode(data):
    from vietnamese_ocr_spark.functions.jpeg import jpeg_encode

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (16, 24), dtype=np.uint8)
    blob = bytearray(jpeg_encode(img, 80, progressive=True))
    pos = data.draw(st.integers(0, len(blob) - 1))
    bit = data.draw(st.integers(0, 7))
    blob[pos] ^= 1 << bit
    try:
        out = jpeg_decode(bytes(blob))
        assert out.dtype == np.uint8
    except Exception as ex:
        assert isinstance(ex, Exception), type(ex)
