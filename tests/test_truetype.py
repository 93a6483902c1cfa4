"""TrueType cmap parser + the Type0-without-/ToUnicode recovery path
(round-6): under Identity-H, content-stream CIDs are glyph ids, so an
embedded /FontFile2's cmap table inverts back to Unicode — the
pdfminer/MuPDF fallback for the layout the round-5 verdict listed as an
unrecoverable quarantine."""

from __future__ import annotations

import pytest

from vietnamese_ocr_spark.functions.truetype import (
    gid_to_unicode,
    ttf_encode_cmap,
    ttf_unicode_to_gid,
)


def _mapping():
    m = {ord("a") + i: 10 + i for i in range(5)}  # consecutive run
    m[0x1EA1] = 40  # ạ — isolated BMP entry
    return m


@pytest.mark.parametrize("fmt", [4, 12])
def test_cmap_roundtrip(fmt):
    m = dict(_mapping())
    if fmt == 12:
        m[0x1D400] = 50  # plane-1: format 12 only
    font = ttf_encode_cmap(m, fmt=fmt)
    assert ttf_unicode_to_gid(font) == m
    inv = gid_to_unicode(font)
    assert inv[10] == "a" and inv[40] == "ạ"
    if fmt == 12:
        assert inv[50] == "\U0001d400"


def test_double_mapped_glyph_lowest_codepoint_wins():
    font = ttf_encode_cmap({0x41: 7, 0x61: 7})
    assert gid_to_unicode(font)[7] == "A"


def test_quarantine_contract():
    good = ttf_encode_cmap(_mapping())
    for bad in (b"", b"XXXXYYYY", good[:20], good[:40], good[:60]):
        with pytest.raises(ValueError):
            ttf_unicode_to_gid(bad)
    with pytest.raises(ValueError, match="no cmap"):
        ttf_unicode_to_gid(b"\x00\x01\x00\x00" + b"\x00" * 8)


def test_type0_fontfile_recovery_end_to_end():
    from vietnamese_ocr_spark.functions.pdf import pdf_encode_type0, pdf_main_text

    pages = [
        [(72.0, 700.0, 11.0, "Tiếng Việt có dấu")],
        [(72.0, 680.0, 11.0, "dòng thứ hai")],
    ]
    text = pdf_main_text(pdf_encode_type0(pages, embed_cmap_font=True))
    assert "Tiếng Việt có dấu" in text and "dòng thứ hai" in text


def test_type0_without_tounicode_or_fontfile_still_quarantines():
    from vietnamese_ocr_spark.functions.pdf import PdfDocument, pdf_encode_type0

    data = pdf_encode_type0([[(72.0, 700.0, 11.0, "abc")]])
    # strip the /ToUnicode entry: no CMap AND no embedded font
    broken = data.replace(b"/ToUnicode", b"/NotUnicode")
    with pytest.raises(ValueError, match="without /ToUnicode"):
        doc = PdfDocument(broken)
        doc.page_fonts(doc.pages()[0])
