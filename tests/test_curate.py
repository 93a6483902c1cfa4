"""Curation composition (plans/curate.py): each gate drops what it
should, counts are coherent, and the output is reproducible."""

from __future__ import annotations

from pyspark.sql import functions as F

from vietnamese_ocr_spark.plans.curate import curate_df


def _corpus(spark):
    # 24 distinct words -> no duplicate trigrams, passes every gate
    base = ("one two three four five six seven eight nine ten eleven twelve "
            "thirteen fourteen fifteen sixteen seventeen eighteen nineteen "
            "twenty alpha beta gamma delta")
    rows = [
        (1, base),                       # clean
        (2, base + " epsilon"),          # near-dup of 1 (jaccard ~0.9)
        (3, "spam " * 40),               # 40 words, all trigrams equal -> repetition-dropped
        (4, "too short"),                # < 20 words -> quality-dropped
        (5, "sailing boats drift down quiet rivers while herons wade past "
            "reeds and fishermen mend their nets under a warm afternoon sun "
            "with patience"),            # clean, unrelated
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_curate_stages_drop_expected_docs(spark):
    curated, stats = curate_df(_corpus(spark), jaccard_threshold=0.3)
    kept = sorted(r["doc_id"] for r in curated.collect())
    # 4 fails quality (too short), 3 fails repetition, {1,2} collapse to 1
    assert kept == [1, 5]
    assert stats["input"] == 5
    assert stats["after_quality"] == 4
    assert stats["after_repetition"] == 3
    assert stats["after_dedup"] == 2


def test_curate_sampling_is_deterministic(spark):
    docs = spark.range(0, 500).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("plain ordinary prose document number "),
            F.col("id"),
            F.lit(" with twenty or so distinct words of filler text "
                  "keeping every quality and repetition gate happy"),
        ).alias("text"),
    )
    a, _ = curate_df(docs, sample_frac=0.5, with_dedup=False)
    b, _ = curate_df(docs, sample_frac=0.5, with_dedup=False)
    assert {r["doc_id"] for r in a.collect()} == {r["doc_id"] for r in b.collect()}
