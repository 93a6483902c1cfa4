"""Round-7 regression tests for the five ADVICE correctness fixes:
scheme-conditioned URL port stripping, chunked HTTP bodies, hex AVI
stream ids, per-row PackBits, and the 80-bit-float sign bit."""

from __future__ import annotations

import struct

import numpy as np


def test_url_normalize_scheme_conditioned_ports(spark):
    from pyspark.sql import functions as F

    from vietnamese_ocr_spark.sources.warc import url_normalize

    cases = [
        # NOT default ports for their scheme: must be preserved
        ("http://h.example:443/x", "http://h.example:443/x"),
        ("https://h.example:80/x", "https://h.example:80/x"),
        # default ports: stripped
        ("http://h.example:80/x", "http://h.example/x"),
        ("https://h.example:443/x", "https://h.example/x"),
        ("http://h.example:80", "http://h.example"),
        ("https://h.example:443", "https://h.example"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "u string")
    got = [r[0] for r in df.select(url_normalize(F.col("u"))).collect()]
    assert got == [w for _, w in cases]


def test_http_body_dechunks_chunked_responses():
    from vietnamese_ocr_spark.sources.warc import _http_body

    body = b"5\r\nhello\r\n6\r\n world\r\n0\r\n\r\n"
    payload = (
        b"HTTP/1.1 200 OK\r\n"
        b"Content-Type: text/plain\r\n"
        b"Transfer-Encoding: chunked\r\n\r\n" + body
    )
    status, ctype, out = _http_body(payload)
    assert (status, ctype, out) == (200, "text/plain", b"hello world")


def test_http_body_malformed_chunking_raises():
    # the warc_response_rows wrapper maps any _http_body exception to a
    # decode_ok=false row (covered by the torn-archive tests); here pin
    # that malformed chunk framing raises instead of passing hex size
    # lines through as body text
    import pytest

    from vietnamese_ocr_spark.sources.warc import _http_body

    # chunk size says 10 (0xa) but only 5 bytes precede the terminator
    bad = (
        b"HTTP/1.1 200 OK\r\n"
        b"Transfer-Encoding: chunked\r\n\r\n"
        b"a\r\nhello\r\n0\r\n\r\n"
    )
    with pytest.raises(ValueError):
        _http_body(bad)


def test_avi_hex_stream_ids_not_skipped():
    from vietnamese_ocr_spark.operators.multimodal import (
        avi_mjpeg_frames,
        avi_encode_mjpeg,
    )
    from vietnamese_ocr_spark.functions.jpeg import jpeg_encode

    frame = jpeg_encode(np.full((16, 16), 99, np.uint8), quality=90)
    avi = avi_encode_mjpeg([frame])
    # rewrite the stream chunk tag from '00dc' to '0Adc' (stream 0x0A)
    hacked = avi.replace(b"00dc", b"0Adc")
    assert avi_mjpeg_frames(hacked) == [frame]


def test_packbits_runs_do_not_span_rows():
    from vietnamese_ocr_spark.functions.tiff import tiff_encode, tiff_decode

    # all-identical image: the old encoder emitted replicate runs across
    # row boundaries; TIFF 6.0 §9 requires each row encoded separately
    img = np.full((6, 40), 7, np.uint8)
    enc = tiff_encode(img, compression="packbits", rows_per_strip=3)
    assert np.array_equal(tiff_decode(enc), img)

    # walk every PackBits run of the strip data and assert none crosses
    # a row boundary of the decoded output
    import struct as _s

    def strip_blobs(data):
        # minimal IFD walk: entry 273 offsets / 279 counts
        le = data[:2] == b"II"
        u16 = lambda o: _s.unpack_from("<H" if le else ">H", data, o)[0]
        u32 = lambda o: _s.unpack_from("<I" if le else ">I", data, o)[0]
        ifd = u32(4)
        n = u16(ifd)
        offs = counts = None
        for i in range(n):
            e = ifd + 2 + 12 * i
            tag, typ, cnt, val = u16(e), u16(e + 2), u32(e + 4), u32(e + 8)
            if tag in (273, 279):
                vals = (
                    [val]
                    if cnt == 1
                    else [u32(val + 4 * j) for j in range(cnt)]
                )
                if tag == 273:
                    offs = vals
                else:
                    counts = vals
        return [data[o : o + c] for o, c in zip(offs, counts)]

    row_bytes = 40
    for blob in strip_blobs(enc):
        out_pos = 0
        i = 0
        while i < len(blob):
            n = blob[i]
            if n < 128:
                run_len, i = n + 1, i + 2 + n
            elif n > 128:
                run_len, i = 257 - n, i + 2
            else:
                i += 1
                continue
            # a run must not cross a multiple-of-row_bytes boundary
            assert (out_pos % row_bytes) + run_len <= row_bytes
            out_pos += run_len


def test_f80_negative_sample_rate_raises():
    import pytest

    from vietnamese_ocr_spark.functions.audio import _f80_decode, _f80_encode

    good = _f80_encode(16000)
    assert _f80_decode(good) == 16000
    se, mant = struct.unpack(">HQ", good)
    with pytest.raises(ValueError):
        _f80_decode(struct.pack(">HQ", se | 0x8000, mant))
