"""Round-7: q_cer_corpus computes levenshtein(text, devoweled(text)) as
length(text) - length(pred).  pred is a subsequence of text (regexp_replace
only deletes), so lev == deletion count exactly:
  lev >= |len(text) - len(pred)|   (length lower bound)
  lev <= len(text) - len(pred)     (deleting those chars transforms one
                                    string into the other)
This test pins the equivalence against Spark's own levenshtein on real
corpus rows plus adversarial literals, so the rewrite can never drift from
the semantics the frozen oracle (DuckDB levenshtein) checks.
"""

from __future__ import annotations

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.01"


def test_levenshtein_equals_deletion_count_on_corpus(spark):
    d = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "text", F.regexp_replace("text", "[aeiou]", "").alias("pred")
    )
    mismatch = d.filter(
        F.levenshtein("text", "pred") != (F.length("text") - F.length("pred"))
    ).count()
    assert mismatch == 0


def test_levenshtein_equals_deletion_count_edge_rows(spark):
    rows = [
        ("",),                      # empty
        ("aeiou",),                 # all deleted
        ("xyz",),                   # nothing deleted
        ("aexaeyzaeiou",),          # interleaved
        ("AEIOU",),                 # case: only lowercase deleted
        ("a e i o u",),             # separators survive
    ]
    d = spark.createDataFrame(rows, "text string").select(
        "text", F.regexp_replace("text", "[aeiou]", "").alias("pred")
    )
    got = d.select(
        F.levenshtein("text", "pred").alias("lev"),
        (F.length("text") - F.length("pred")).alias("dels"),
    ).collect()
    for r in got:
        assert r["lev"] == r["dels"]
