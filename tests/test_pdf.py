"""PDF text + layout parse (functions/pdf.py, operators/pdfops.py) —
the north_rule's "PDF/layout parse" leg of main-content extraction."""

from __future__ import annotations

import numpy as np
import pytest

from vietnamese_ocr_spark.functions.pdf import (
    pdf_encode,
    pdf_extract_spans,
    pdf_lines,
    pdf_main_text,
)


def test_roundtrip_multi_page_flate_and_plain():
    pages = [
        [(72, 700, 12, "Hello world"), (72, 680, 12, "second line")],
        [(72, 700, 10, "page two text")],
    ]
    for compress in (True, False):
        data = pdf_encode(pages, compress=compress)
        assert data.startswith(b"%PDF-1.4")
        assert pdf_main_text(data) == "Hello world\nsecond line\npage two text"


def test_layout_rebuilds_reading_order():
    """Emission order in real PDFs is arbitrary; lines must come back
    top-to-bottom and, within a line, left-to-right."""
    scrambled = pdf_encode(
        [[
            (300.0, 100.0, 9, "bottom"),
            (200.0, 700.0, 9, "top-right"),
            (72.0, 400.0, 9, "middle"),
            (72.0, 700.5, 9, "top-left"),  # same visual line as top-right
        ]],
        compress=False,
    )
    assert pdf_main_text(scrambled) == "top-left top-right\nmiddle\nbottom"
    lines = pdf_lines(scrambled)
    assert [ln["line_no"] for ln in lines] == [0, 1, 2]


def test_string_escapes_and_parens():
    text = r"a(b)c\d and (nested (parens)) fine"
    data = pdf_encode([[(72, 700, 11, text)]], compress=False)
    assert pdf_main_text(data) == text


def test_spans_carry_layout_metadata():
    data = pdf_encode([[(72.5, 640.25, 14, "hello")]])
    (span,) = pdf_extract_spans(data)
    assert (span["page"], span["x"], span["y"], span["size"]) == (0, 72.5, 640.25, 14.0)


def test_rejects_non_pdf_and_dangling_encrypt():
    with pytest.raises(ValueError, match="not a PDF"):
        pdf_extract_spans(b"%!PS not a pdf")
    # RC4 encryption is SUPPORTED since round 5 (see the rc4 tests); a
    # dangling /Encrypt pointing at a missing object still quarantines
    data = pdf_encode([[(72, 700, 11, "x")]], compress=False)
    tampered = data.replace(b"/Root", b"/Encrypt 9 0 R /Root")
    with pytest.raises(ValueError, match="/Encrypt"):
        pdf_extract_spans(tampered)


def test_tj_array_and_relative_td():
    """Hand-written content stream: TJ array concatenation and Td-relative
    positioning (the operators pdf_encode doesn't emit)."""
    import zlib

    content = (
        b"BT /F1 10 Tf 72 700 Td [(Hel) -20 (lo)] TJ 0 -20 Td (below) Tj ET"
    )
    data = pdf_encode([[(72, 500, 9, "anchor " * 20)]], compress=False)
    # splice our stream in place of the generated one
    start = data.index(b"stream\n") + 7
    end = data.index(b"\nendstream")
    old_len = end - start
    data = data[:start] + content.ljust(old_len) + data[end:]
    got = pdf_main_text(data)
    assert got == "Hello\nbelow"


def test_operator_stage_and_quarantine(spark):
    from vietnamese_ocr_spark.operators.pdfops import pdf_extract_lines, pdf_line_rows

    good = pdf_encode([[(72, 700, 11, "alpha beta"), (72, 684, 11, "gamma")]])
    rows = [
        ("pdf-good", bytearray(good)),
        ("pdf-bad", bytearray(b"%PDF-1.4 truncated garbage")),
    ]
    assets = spark.createDataFrame(rows, "asset_id string, payload binary")
    got = pdf_extract_lines(assets).collect()
    by_asset = {}
    for r in got:
        by_asset.setdefault(r["asset_id"], []).append(r)
    assert [r["text"] for r in sorted(by_asset["pdf-good"], key=lambda r: r["line_no"])] == [
        "alpha beta", "gamma",
    ]
    (bad,) = by_asset["pdf-bad"]
    assert bad["decode_ok"] is False and bad["text"] is None
    # distributed == single-process
    want = pdf_line_rows("pdf-good", good)
    assert [(r["page"], r["line_no"], r["text"]) for r in sorted(
        by_asset["pdf-good"], key=lambda r: (r["page"], r["line_no"])
    )] == [(w["page"], w["line_no"], w["text"]) for w in want]


def test_pdf_folder_feeds_full_extraction(spark, tmp_path):
    """Directory of PDFs -> the REAL extraction pipeline (normalize +
    stitch): each PDF becomes one document whose text spans are the
    layout-ordered lines, boilerplate-normalized like any text span."""
    import os

    from vietnamese_ocr_spark.plans.extract import broadcast_weights, extract_df
    from vietnamese_ocr_spark.sources.pdf_folder import read_pdf_folder

    docs_dir = str(tmp_path / "pdfs")
    os.makedirs(docs_dir)
    with open(os.path.join(docs_dir, "a.pdf"), "wb") as f:
        f.write(pdf_encode([[(72, 700, 11, "hello line one"),
                             (72, 684, 11, "line two")]]))
    with open(os.path.join(docs_dir, "b.pdf"), "wb") as f:
        f.write(pdf_encode([[(72, 700, 11, "<nav>menu</nav><p>real body</p>")]]))
    with open(os.path.join(docs_dir, "broken.pdf"), "wb") as f:
        f.write(b"%PDF-1.4 not really")
    with open(os.path.join(docs_dir, "notes.txt"), "w") as f:
        f.write("decoy")

    documents = read_pdf_folder(spark, docs_dir)
    media = spark.createDataFrame([], "media_ref string, png binary, size_b long")
    extracted, _ = extract_df(spark, documents, media, broadcast_weights(spark))
    got = {r["doc_id"]: [(s["kind"], s["text"], s["offset"]) for s in r["spans"]]
           for r in extracted.collect()}
    assert set(got) == {"a.pdf", "b.pdf", "broken.pdf"}
    assert got["a.pdf"] == [("text", "hello line one", 0), ("text", "line two", 1)]
    # the boilerplate-strip normalize leg applies to PDF text spans too
    assert got["b.pdf"] == [("text", "real body", 0)]
    assert got["broken.pdf"] == []  # quarantined, doc survives empty


def test_pdf15_object_streams_and_xref_stream():
    """PDF 1.5 layout (what every modern generator emits): non-stream
    objects packed in a Flate /ObjStm, trailer dict on a /Type /XRef
    stream, NO classic trailer. The parser's ObjStm expansion + xref-
    stream fallback must read it like a 1.4 file."""
    from vietnamese_ocr_spark.functions.pdf import pdf_encode_15

    pages = [
        [(72, 700, 12, "Hello modern PDF"), (72, 680, 12, "object streams work")],
        [(72, 700, 10, "second page here")],
    ]
    data = pdf_encode_15(pages)
    assert data.startswith(b"%PDF-1.5") and b"trailer" not in data
    assert b"/ObjStm" in data and b"/XRef" in data
    assert pdf_main_text(data) == (
        "Hello modern PDF\nobject streams work\nsecond page here"
    )
    # same content, both layouts, identical extraction
    assert pdf_main_text(data) == pdf_main_text(pdf_encode(pages))


def test_pdf15_through_operator_stage(spark):
    from vietnamese_ocr_spark.functions.pdf import pdf_encode_15
    from vietnamese_ocr_spark.operators.pdfops import pdf_extract_lines

    data = pdf_encode_15([[(72, 700, 11, "packed object text line")]])
    assets = spark.createDataFrame(
        [("pdf15-0", bytearray(data))], "asset_id string, payload binary"
    )
    (row,) = pdf_extract_lines(assets).collect()
    assert row["decode_ok"] and row["text"] == "packed object text line"


def test_stream_filters_roundtrip_each_and_chained():
    """Round-5: the non-Flate text-stream filters (PDF 32000-1 §7.4) —
    LZW (TIFF variant), ASCIIHex, ASCII85, RunLength — each decodes its
    own fixture encoding exactly, and the parser handles them inside
    real PDFs."""
    from vietnamese_ocr_spark.functions.pdf import (
        _ascii85_decode,
        _ascii85_encode,
        _asciihex_decode,
        _asciihex_encode,
        _runlength_decode,
        _runlength_encode,
        pdf_encode,
        pdf_main_text,
    )

    import numpy as np

    rng = np.random.RandomState(3)
    for blob in (b"", b"a", b"hello world" * 40,
                 rng.randint(0, 256, 5000).astype(np.uint8).tobytes(),
                 b"\x00" * 1000 + b"ab" * 500):
        assert _asciihex_decode(_asciihex_encode(blob)) == blob
        assert _ascii85_decode(_ascii85_encode(blob)) == blob
        assert _runlength_decode(_runlength_encode(blob)) == blob

    pages = [[(72.0, 700.0, 11.0, "filter roundtrip line one")],
             [(72.0, 700.0, 11.0, "and line two")]]
    for f in ("none", "flate", "lzw", "ahx", "a85", "rl"):
        text = pdf_main_text(pdf_encode(pages, stream_filter=f))
        assert "filter roundtrip line one" in text, f
        assert "and line two" in text, f


def test_ascii85_z_shortcut_and_eod():
    from vietnamese_ocr_spark.functions.pdf import _ascii85_decode

    # 'z' = four zero bytes; whitespace ignored; ~> terminates
    assert _ascii85_decode(b"z ~> trailing garbage") == b"\x00\x00\x00\x00"
    import pytest

    with pytest.raises(ValueError):
        _ascii85_decode(b"v~>")  # 'v' outside the '!'..'u' alphabet


def test_unsupported_filter_and_predictor_quarantine():
    import pytest

    from vietnamese_ocr_spark.functions.pdf import PdfDocument, pdf_encode

    data = pdf_encode([[(72.0, 700.0, 10.0, "x")]], compress=False)
    bad = data.replace(b"<< /Length", b"<< /Filter /DCTDecode /Length", 1)
    doc = PdfDocument(bad)
    with pytest.raises(ValueError, match="unsupported stream filter"):
        doc.page_content(doc.pages()[0])


def test_type0_identity_h_roundtrip_unicode():
    """Round-5: composite-font PDFs (Type0 / Identity-H + /ToUnicode
    CMap) — the layout every modern generator emits for Unicode text.
    Vietnamese text must survive the 2-byte-CID hex-string path exactly,
    including reading-order rebuild across scrambled emission."""
    from vietnamese_ocr_spark.functions.pdf import pdf_encode_type0, pdf_main_text

    pages = [
        [(72.0, 684.0, 11.0, "dòng thứ hai"), (72.0, 700.0, 11.0, "Xin chào đêm quên")],
        [(72.0, 700.0, 11.0, "trang hai: nhớ mãi 0123")],
    ]
    text = pdf_main_text(pdf_encode_type0(pages))
    assert text == "Xin chào đêm quên\ndòng thứ hai\ntrang hai: nhớ mãi 0123"


def test_parse_tounicode_bfchar_and_both_bfrange_forms():
    from vietnamese_ocr_spark.functions.pdf import _parse_tounicode

    cmap = b"""
    begincmap
    2 beginbfchar
    <0001> <0058>
    <0002> <1EC7>
    endbfchar
    2 beginbfrange
    <0010> <0012> <0061>
    <0020> <0021> [<00E9> <1EA1>]
    endbfrange
    endcmap
    """
    m = _parse_tounicode(cmap)
    assert m[1] == "X" and m[2] == "ệ"  # ệ
    assert (m[0x10], m[0x11], m[0x12]) == ("a", "b", "c")
    assert m[0x20] == "é" and m[0x21] == "ạ"


def test_type0_without_tounicode_quarantines():
    import pytest

    from vietnamese_ocr_spark.functions.pdf import PdfDocument, pdf_encode_type0

    data = pdf_encode_type0([[(72.0, 700.0, 10.0, "x")]])
    bad = data.replace(b" /ToUnicode", b" /Ignored", 1)
    doc = PdfDocument(bad)
    with pytest.raises(ValueError, match="ToUnicode"):
        doc.page_fonts(doc.pages()[0])


def test_rc4_encrypted_pdf_opens_with_empty_user_password():
    """Round-5: RC4 standard security handler (40-bit R2 and 128-bit
    R3), owner-password-only — the encrypted form that appears in
    crawls. Text extraction must work without credentials; a composite
    Type0 layout must survive encryption too (its ToUnicode CMap stream
    is itself encrypted)."""
    from vietnamese_ocr_spark.functions.pdf import (
        pdf_encode,
        pdf_encode_type0,
        pdf_encrypt_rc4,
        pdf_main_text,
    )

    plain = pdf_encode(
        [[(72.0, 700.0, 11.0, "secret báo cáo"), (72.0, 684.0, 11.0, "line two")]],
        compress=True,
    )
    for r in (2, 3):
        assert pdf_main_text(pdf_encrypt_rc4(plain, r=r)) == "secret báo cáo\nline two"

    t0 = pdf_encode_type0([[(72.0, 700.0, 11.0, "mật mã tiếng Việt")]])
    assert pdf_main_text(pdf_encrypt_rc4(t0)) == "mật mã tiếng Việt"


def test_encrypted_pdf_with_real_user_password_quarantines():
    import pytest

    from vietnamese_ocr_spark.functions.pdf import (
        PdfDocument,
        pdf_encode,
        pdf_encrypt_rc4,
    )

    plain = pdf_encode([[(72.0, 700.0, 10.0, "x")]])
    locked = pdf_encrypt_rc4(plain, user_pw="hunter2")
    with pytest.raises(ValueError, match="user password"):
        PdfDocument(locked)


def test_aes_encryption_quarantines():
    import pytest

    from vietnamese_ocr_spark.functions.pdf import (
        PdfDocument,
        pdf_encode,
        pdf_encrypt_rc4,
    )

    enc = pdf_encrypt_rc4(pdf_encode([[(72.0, 700.0, 10.0, "x")]]))
    bad = enc.replace(b"/V 2", b"/V 4", 1)
    with pytest.raises(ValueError, match="unsupported PDF encryption"):
        PdfDocument(bad)


def test_decode_parms_predictors():
    """Round-5: /DecodeParms predictors on Flate output — PNG
    predictor 12 (what real generators put on xref streams) and TIFF
    horizontal differencing (2); bad predictors still quarantine."""
    import zlib

    import numpy as np
    import pytest

    from vietnamese_ocr_spark.functions.imaging import _forward_filter
    from vietnamese_ocr_spark.functions.pdf import PdfDocument, _apply_predictor

    rng = np.random.RandomState(9)
    data = rng.randint(0, 256, (12, 10), dtype=np.uint8)  # 12 rows x 10 cols

    # PNG up-filter (type 2) rows == what a predictor-12 writer emits
    raw = _forward_filter(data, 1, 2)
    got = _apply_predictor(raw, {"/Predictor": 12, "/Columns": 10})
    assert got == data.tobytes()

    # TIFF horizontal differencing, 2 colors
    arr = rng.randint(0, 256, (6, 5, 2), dtype=np.uint8)
    diff = arr.astype(np.int16).copy()
    diff[:, 1:, :] -= arr.astype(np.int16)[:, :-1, :]
    got = _apply_predictor(
        (diff & 0xFF).astype(np.uint8).tobytes(),
        {"/Predictor": 2, "/Columns": 5, "/Colors": 2},
    )
    assert got == arr.tobytes()

    with pytest.raises(ValueError, match="predictor"):
        _apply_predictor(b"\x00" * 11, {"/Predictor": 3, "/Columns": 10})

    # end-to-end: a hand-built PDF whose content stream is Flate +
    # predictor-12 must parse (each content row = one predictor row)
    content = b"BT /F1 10 Tf 1 0 0 1 72 700 Tm (pred ok) Tj ET"
    cols = len(content)
    filtered = bytes([2]) + content  # one row, Up filter vs zero prev
    stream = zlib.compress(filtered, 6)
    obj4 = (
        b"4 0 obj\n<< /Length %d /Filter /FlateDecode /DecodeParms "
        b"<< /Predictor 12 /Columns %d >> >>\nstream\n" % (len(stream), cols)
    )
    body = (
        b"%PDF-1.4\n"
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n"
        + obj4
        + stream
        + b"\nendstream\nendobj\n"
        b"trailer\n<< /Size 5 /Root 1 0 R >>\n"
    )
    doc = PdfDocument(body)
    assert doc.stream_bytes(4) == content


def test_rc4_encrypted_pdf15_objstm_layout():
    """RC4 x PDF 1.5: the ObjStm container stream decrypts before
    expansion, so packed objects come back from an encrypted modern
    layout too."""
    from vietnamese_ocr_spark.functions.pdf import (
        pdf_encode_15,
        pdf_encrypt_rc4,
        pdf_main_text,
    )

    data = pdf_encode_15([[(72.0, 700.0, 11.0, "modern encrypted layout")]])
    assert pdf_main_text(pdf_encrypt_rc4(data)) == "modern encrypted layout"


def test_single_parms_dict_with_filter_array_binds_to_final_filter():
    """Round-6 (advice): a single /DecodeParms dict next to a /Filter
    ARRAY belongs to the final (data) filter only — replicating it
    across stages would run the PNG predictor after the ASCIIHex stage
    too and corrupt the decoded bytes."""
    import zlib

    from vietnamese_ocr_spark.functions.pdf import (
        PdfDocument,
        _asciihex_encode,
    )

    content = b"BT /F1 10 Tf 1 0 0 1 72 700 Tm (chained parms) Tj ET"
    cols = len(content)
    filtered = bytes([2]) + content  # predictor-12 Up row vs zero prev
    stream = _asciihex_encode(zlib.compress(filtered, 6))
    obj4 = (
        b"4 0 obj\n<< /Length %d /Filter [/ASCIIHexDecode /FlateDecode] "
        b"/DecodeParms << /Predictor 12 /Columns %d >> >>\nstream\n"
        % (len(stream), cols)
    )
    body = (
        b"%PDF-1.4\n"
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n"
        + obj4
        + stream
        + b"\nendstream\nendobj\n"
        b"trailer\n<< /Size 5 /Root 1 0 R >>\n"
    )
    doc = PdfDocument(body)
    assert doc.stream_bytes(4) == content


def test_bfrange_dst_start_surrogate_pair_increments_last_unit():
    """Round-6 (advice): a multi-code-unit UTF-16BE dst-start (plane-1
    surrogate pair) increments only the final code unit — the whole hex
    run is NOT one scalar."""
    from vietnamese_ocr_spark.functions.pdf import _parse_tounicode

    cmap = (
        b"2 beginbfrange\n"
        b"<0000> <0002> <D835DC00>\n"
        b"<0010> <0011> <0041>\n"
        b"endbfrange\n"
    )
    m = _parse_tounicode(cmap)
    assert m[0] == "\U0001d400" and m[1] == "\U0001d401" and m[2] == "\U0001d402"
    assert m[0x10] == "A" and m[0x11] == "B"


def test_ser_value_floats_never_use_exponent_notation():
    """Round-6 (advice): PDF real syntax has no exponent form."""
    from vietnamese_ocr_spark.functions.pdf import _ser_value

    assert _ser_value(1e-05) == b"0.00001"
    assert _ser_value(2.0) == b"2"
    assert _ser_value(-0.5) == b"-0.5"
    for v in (1e-07, 1234567890.125, -3e-06):
        assert b"e" not in _ser_value(v).lower()


def test_aes256_r6_and_r5_roundtrip():
    """Round-6: ISO 32000-2 /V 5 AES-256 — R6 (Algorithm 2.B hardened
    hash) and the deprecated R5 bare-SHA-256 variant both open with an
    empty user password; /Perms verifies against the unwrapped key."""
    from vietnamese_ocr_spark.functions.pdf import (
        pdf_encode,
        pdf_encrypt_aes256,
        pdf_main_text,
    )

    data = pdf_encode(
        [[(72.0, 700.0, 11.0, "aes256 secret line")],
         [(72.0, 700.0, 11.0, "page two")]]
    )
    for r in (6, 5):
        text = pdf_main_text(pdf_encrypt_aes256(data, r=r))
        assert "aes256 secret line" in text and "page two" in text


def test_aes256_objstm_layout_and_owner_path():
    from vietnamese_ocr_spark.functions.pdf import (
        pdf_encode,
        pdf_encode_15,
        pdf_encrypt_aes256,
        pdf_main_text,
    )

    enc = pdf_encrypt_aes256(pdf_encode_15([[(72.0, 700.0, 11.0, "modern aes256")]]))
    assert pdf_main_text(enc) == "modern aes256"
    # real user password but EMPTY owner password: the owner auth path
    data = pdf_encode([[(72.0, 700.0, 11.0, "owner path")]])
    enc_u = pdf_encrypt_aes256(data, user_pw="secret", owner_pw="")
    assert "owner path" in pdf_main_text(enc_u)


def test_aes256_real_passwords_and_bad_perms_quarantine():
    import pytest

    from vietnamese_ocr_spark.functions.pdf import (
        PdfDocument,
        pdf_encode,
        pdf_encrypt_aes256,
    )

    data = pdf_encode([[(72.0, 700.0, 10.0, "x")]])
    enc = pdf_encrypt_aes256(data, user_pw="secret", owner_pw="secret2")
    with pytest.raises(ValueError, match="requires a user password"):
        PdfDocument(enc)
    good = pdf_encrypt_aes256(data)
    # corrupt the /UE key blob: auth still passes (U hash) but the
    # unwrapped key is wrong -> /Perms check must catch it
    idx = good.index(b"/UE <") + 5
    bad = good[:idx] + (b"00" if good[idx:idx+2] != b"00" else b"11") + good[idx+2:]
    with pytest.raises(ValueError, match="Perms|padding"):
        PdfDocument(bad)
