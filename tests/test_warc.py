"""WARC source (round-6): the container web crawls ship in. Parse both
the plain and per-record-gzip layouts, strip HTTP headers, route
response bodies into the tree-aware main-content stage, quarantine torn
archives."""

from __future__ import annotations

import gzip

import pytest

from vietnamese_ocr_spark.sources.warc import (
    parse_warc,
    warc_encode,
    warc_response_rows,
)

RECS = [
    {"uri": "http://a.example/x",
     "body": "<html><nav>site menu links</nav>"
             "<div><p>the real article text with enough words to score"
             " as the main block of the page</p></div></html>"},
    {"uri": "http://a.example/y", "body": "plain text doc",
     "content_type": "text/plain"},
    {"uri": "http://a.example/img", "body": "PNGDATA",
     "content_type": "image/png"},
    {"uri": "http://a.example/req", "body": "GET / HTTP/1.1",
     "type": "request"},
]


@pytest.mark.parametrize("gz", [False, True])
def test_parse_both_layouts(gz):
    data = warc_encode(RECS, per_record_gzip=gz)
    recs = parse_warc(data)
    assert len(recs) == 4
    rows = warc_response_rows("f.warc", data)
    assert [r["target_uri"] for r in rows] == [
        "http://a.example/x", "http://a.example/y", "http://a.example/img"
    ]
    assert all(r["decode_ok"] and r["http_status"] == 200 for r in rows)
    assert "real article" in rows[0]["body"]


def test_gzipped_http_content_encoding():
    body = "<p>gz body content</p>"
    raw = warc_encode([{"uri": "u", "body": body}])
    # inject a Content-Encoding: gzip response by hand
    http = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
            b"Content-Encoding: gzip\r\n\r\n" + gzip.compress(body.encode()))
    head = (b"WARC/1.0\r\nWARC-Type: response\r\n"
            b"WARC-Record-ID: <urn:uuid:1>\r\n"
            b"WARC-Target-URI: http://z\r\n"
            b"Content-Length: %d\r\n\r\n" % len(http))
    rows = warc_response_rows("g.warc", head + http + b"\r\n\r\n")
    assert rows[0]["decode_ok"] and rows[0]["body"] == body


def test_torn_archive_quarantines_one_row():
    rows = warc_response_rows(
        "t.warc", b"WARC/1.0\r\nContent-Length: 999\r\n\r\nxx"
    )
    assert len(rows) == 1 and rows[0]["decode_ok"] is False
    rows = warc_response_rows("t2.warc", b"NOTAWARC")
    assert rows[0]["decode_ok"] is False


def test_warc_folder_to_documents_through_spark(spark, tmp_path):
    from vietnamese_ocr_spark.sources.warc import (
        read_warc_folder,
        warc_documents,
    )

    (tmp_path / "a.warc").write_bytes(warc_encode(RECS))
    (tmp_path / "sub").mkdir()
    (tmp_path / "sub" / "b.warc.gz").write_bytes(
        warc_encode(RECS[:1], per_record_gzip=True)
    )
    (tmp_path / "notes.txt").write_text("decoy")
    responses = read_warc_folder(spark, str(tmp_path))
    rows = responses.collect()
    assert sorted(r["warc_file"] for r in rows) == [
        "a.warc", "a.warc", "a.warc", "b.warc.gz"
    ]
    docs = {r["doc_id"]: r["main_text"] for r in
            warc_documents(responses).collect()}
    # image/png filtered out; html doc keeps article, loses nav chrome
    assert set(docs) == {"http://a.example/x", "http://a.example/y"}
    assert "real article" in docs["http://a.example/x"]
    assert "site menu" not in docs["http://a.example/x"]


def test_url_normalize_and_host_stats(spark):
    from pyspark.sql import functions as F

    from vietnamese_ocr_spark.sources.warc import url_normalize, warc_host_stats

    cases = [
        ("HTTP://Example.COM:80/Path?Q=1#frag", "http://example.com/Path?Q=1"),
        ("https://A.example:443/", "https://a.example"),
        ("https://a.example/x/", "https://a.example/x/"),  # non-bare kept
        ("http://b.example/", "http://b.example"),
        ("http://b.example:8080/x", "http://b.example:8080/x"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "u string")
    got = [r[0] for r in df.select(url_normalize(F.col("u"))).collect()]
    assert got == [w for _, w in cases]

    rows = [
        ("f", "1", "http://Example.com:80/a#x", 200, "text/html", True, "body one"),
        ("f", "2", "http://example.com/a", 200, "text/html", True, "body one"),
        ("f", "3", "http://example.com/b", 404, "text/html", True, ""),
        ("f", "4", "http://other.test/c", 200, "text/plain", True, "zz"),
    ]
    from vietnamese_ocr_spark.sources.warc import WARC_DDL

    stats = {r["host"]: r for r in
             warc_host_stats(spark.createDataFrame(rows, WARC_DDL)).collect()}
    ex = stats["example.com"]
    assert ex["n_fetches"] == 3 and ex["n_urls"] == 2
    assert abs(ex["ok_rate"] - 2 / 3) < 1e-9
    assert stats["other.test"]["n_fetches"] == 1


def test_warc_folder_size_guard_quarantines_oversized(spark, tmp_path):
    """VERDICT r6 item: an archive over max_archive_bytes must become ONE
    decode_ok=false row (executor-OOM guard) while small archives still
    parse; the guard rides binaryFile's pushed-down `length` column."""
    from vietnamese_ocr_spark.sources.warc import read_warc_folder

    small = warc_encode(RECS[:1])
    (tmp_path / "small.warc").write_bytes(small)
    big = warc_encode(RECS)
    (tmp_path / "big.warc").write_bytes(big)
    assert len(big) > len(small)

    rows = read_warc_folder(
        spark, str(tmp_path), max_archive_bytes=len(small)
    ).collect()
    by_file = {}
    for r in rows:
        by_file.setdefault(r["warc_file"], []).append(r)
    # the small archive parses normally
    assert all(r["decode_ok"] for r in by_file["small.warc"])
    # the oversized archive quarantines as exactly one marker row
    (q,) = by_file["big.warc"]
    assert q["decode_ok"] is False and q["record_id"] is None
    assert q["body"] is None
    # default cap leaves both archives fully parsed
    n_default = read_warc_folder(spark, str(tmp_path)).count()
    expected_big = len(warc_response_rows("big.warc", big))
    assert n_default == len(by_file["small.warc"]) + expected_big
