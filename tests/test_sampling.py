"""Deterministic hash sampling (operators/sampling.py): reproducible,
partitioning-invariant, stratified."""

from __future__ import annotations

from pyspark.sql import functions as F

from vietnamese_ocr_spark.operators.sampling import hash_sample, stratified_hash_sample


def _docs(spark, n=2000, parts=4):
    return spark.range(0, n, 1, parts).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 4 == 0, "en").otherwise("vi").alias("lang"),
    )


def test_hash_sample_reproducible_and_partitioning_invariant(spark):
    base = {r["doc_id"] for r in hash_sample(_docs(spark), "doc_id", 0.25).collect()}
    again = {r["doc_id"] for r in hash_sample(_docs(spark), "doc_id", 0.25).collect()}
    repartitioned = {
        r["doc_id"]
        for r in hash_sample(_docs(spark).repartition(13), "doc_id", 0.25).collect()
    }
    assert base == again == repartitioned
    # ~25% with md5 uniformity (binomial 3-sigma on n=2000 is ~3%)
    assert 0.21 < len(base) / 2000 < 0.29


def test_hash_sample_seed_changes_selection(spark):
    a = {r["doc_id"] for r in hash_sample(_docs(spark), "doc_id", 0.25, seed=1).collect()}
    b = {r["doc_id"] for r in hash_sample(_docs(spark), "doc_id", 0.25, seed=2).collect()}
    assert a != b


def test_hash_sample_frac_one_keeps_everything(spark):
    assert hash_sample(_docs(spark), "doc_id", 1.0).count() == 2000


def test_stratified_fractions_apply_per_stratum(spark):
    got = stratified_hash_sample(
        _docs(spark), "doc_id", "lang", {"en": 1.0, "vi": 0.1}
    ).groupBy("lang").count().collect()
    by_lang = {r["lang"]: r["count"] for r in got}
    assert by_lang["en"] == 500  # frac 1.0 = all of the 500 'en' rows
    assert 100 < by_lang["vi"] < 200  # ~10% of 1500, 3-sigma margin


def test_stratified_unlisted_stratum_dropped(spark):
    out = stratified_hash_sample(_docs(spark), "doc_id", "lang", {"en": 1.0})
    assert out.filter(F.col("lang") != "en").count() == 0


def test_repetition_stats_flags_looping_doc(spark):
    from vietnamese_ocr_spark.operators.textstats import repetition_stats

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog today"),
            (2, "spam spam spam spam spam spam spam spam spam spam"),
            (3, "hi"),  # < 3 words -> no ngrams, keep
        ],
        "doc_id bigint, text string",
    )
    got = {r["doc_id"]: r for r in repetition_stats(docs).collect()}
    assert got[1]["dup_ratio"] == 0.0 and got[1]["repetition_keep"] == 1
    # 8 trigrams, all identical -> 7/8 duplicates -> dropped
    assert got[2]["n_ngrams"] == 8 and got[2]["dup_ratio"] == 0.875
    assert got[2]["repetition_keep"] == 0
    assert got[3]["n_ngrams"] == 0 and got[3]["repetition_keep"] == 1
