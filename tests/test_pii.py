"""PII redaction (operators/textstats.py): real PII gets scrubbed, clean
text passes through, Spark == expected strings."""

from __future__ import annotations

from pyspark.sql import functions as F

from vietnamese_ocr_spark.operators.textstats import pii_stats, redact_pii


def test_redaction_scrubs_each_kind(spark):
    rows = [
        (1, "contact alice.smith+x@example.co.uk for details"),
        (2, "server at 192.168.1.254 timed out"),
        (3, "call +1 (555) 123-4567 now"),
        (4, "plain prose with no identifiers at all"),
        (5, "bob@corp.io pinged 10.0.0.1 from +84 912 345 678"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {r["doc_id"]: r for r in pii_stats(df).collect()}
    assert got[1]["redacted"] == "contact <email> for details"
    assert got[1]["n_email"] == 1
    assert got[2]["redacted"] == "server at <ipv4> timed out"
    assert got[3]["redacted"] == "call <phone> now"
    assert got[4]["redacted"] == rows[3][1]  # untouched
    assert got[4]["n_email"] == got[4]["n_ipv4"] == got[4]["n_phone"] == 0
    assert got[5]["redacted"] == "<email> pinged <ipv4> from <phone>"


def test_redaction_is_idempotent(spark):
    df = spark.createDataFrame(
        [(1, "bob@corp.io pinged 10.0.0.1 from +84 912 345 678")],
        "doc_id bigint, text string",
    )
    once = df.select(redact_pii(F.col("text")).alias("t"))
    twice = once.select(redact_pii(F.col("t")).alias("t"))
    assert once.head()["t"] == twice.head()["t"]


def test_decontaminate_drops_verbatim_benchmark_copy(spark):
    from vietnamese_ocr_spark.operators.textstats import decontaminate

    bench_text = ("the held out benchmark question about rivers and boats "
                  "that must never leak into training")
    docs = spark.createDataFrame(
        [
            (1, bench_text),                         # verbatim contamination
            (2, "an ordinary training document with plenty of its own words"),
            (3, "short doc"),                        # <5 words path
        ],
        "doc_id bigint, text string",
    )
    benchmark = spark.createDataFrame([(100, bench_text)], "doc_id bigint, text string")
    kept = sorted(r["doc_id"] for r in decontaminate(docs, benchmark).collect())
    assert kept == [2, 3]
