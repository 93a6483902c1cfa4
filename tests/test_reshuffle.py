"""Seeded epoch reshuffle (S2/O4, reference src/utils/dataloader.py:18-19,36):
same seed => same order, different seed/epoch => different order, and the
keyed form is invariant to partitioning (the cluster-size guarantee)."""

from __future__ import annotations

from vietnamese_ocr_spark.operators.reshuffle import (
    epoch_reshuffle,
    epoch_reshuffle_rand,
)


def _ids(df):
    return [r["doc_id"] for r in df.select("doc_id").collect()]


def _docs(spark):
    return spark.createDataFrame(
        [(i, f"text {i}") for i in range(200)], "doc_id bigint, text string"
    )


def test_keyed_shuffle_deterministic_and_seed_sensitive(spark):
    d = _docs(spark)
    a = _ids(epoch_reshuffle(d, seed=42, key_col="doc_id"))
    b = _ids(epoch_reshuffle(d, seed=42, key_col="doc_id"))
    c = _ids(epoch_reshuffle(d, seed=7, key_col="doc_id"))
    e = _ids(epoch_reshuffle(d, seed=42, key_col="doc_id", epoch=1))
    assert a == b
    assert a != c
    assert a != e
    assert sorted(a) == sorted(c) == list(range(200))  # permutations


def test_keyed_shuffle_invariant_to_partitioning(spark):
    """8 partitions or 1 — identical epoch order. rand(seed) cannot give
    this (it streams per partition); the md5 key is a pure row function,
    so the permutation survives any cluster-size change."""
    d = _docs(spark)
    a = _ids(epoch_reshuffle(d.coalesce(1), seed=42, key_col="doc_id"))
    b = _ids(epoch_reshuffle(d.repartition(8), seed=42, key_col="doc_id"))
    assert a == b


def test_rand_shuffle_deterministic_same_plan(spark):
    """The literal orderBy(rand(seed)) idiom: same seed + same partitioning
    => same order within Spark (the reference's reproducible-run story)."""
    d = _docs(spark).repartition(4, "doc_id")
    a = _ids(epoch_reshuffle_rand(d, seed=42))
    b = _ids(epoch_reshuffle_rand(d, seed=42))
    assert a == b
    assert sorted(a) == list(range(200))
