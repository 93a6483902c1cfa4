"""Dedup operator semantics + the hot-shingle frequency cap (scale guard)."""

from __future__ import annotations

from pyspark.sql import functions as F

from vietnamese_ocr_spark.operators.dedup import jaccard_candidates


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_jaccard_exact_on_small_pairs(spark):
    d = _docs(
        spark,
        [
            (1, "a b c d e"),            # shingles: {a b c, b c d, c d e}
            (2, "a b c d x"),            # shingles: {a b c, b c d, c d x}
            (3, "p q r s t"),            # disjoint
        ],
    )
    out = {(r["da"], r["db"]): r["jaccard"] for r in jaccard_candidates(d, threshold=0.3).collect()}
    # |{a b c, b c d}| / |{a b c, b c d, c d e, c d x}| = 2/4
    assert out == {(1, 2): 0.5}


def test_threshold_applies_to_unrounded_ratio(spark):
    # shingles {a b c, b c d} vs {a b c, b c e}: jaccard = 1/3 exactly;
    # round(.,6) = 0.333333 < 1/3 — a rounded-then-filtered implementation
    # would drop this pair at threshold 1/3 while the SQL oracle keeps it
    d = _docs(spark, [(1, "a b c d"), (2, "a b c e")])
    pairs = jaccard_candidates(d, threshold=1 / 3).collect()
    assert len(pairs) == 1
    assert pairs[0]["jaccard"] == 0.333333


def test_hot_shingle_cap_bounds_candidate_pairs(spark):
    """A boilerplate shingle shared by every doc must NOT produce O(n^2)
    candidate pairs: with the frequency cap it contributes none, and only
    genuinely-similar pairs survive."""
    boiler = "all rights reserved"
    rows = [(i, f"{boiler} unique{i} tail{i} words{i}") for i in range(40)]
    # two true near-dups that share real content beyond the boilerplate
    rows += [(100, "x y z w v u t"), (101, "x y z w v q t")]
    d = _docs(spark, rows)

    capped = jaccard_candidates(d, threshold=0.1, max_shingle_df=5)
    got = [(r["da"], r["db"]) for r in capped.collect()]
    assert got == [(100, 101)]

    # and the candidate-pair stage itself stayed bounded: without the cap
    # the boilerplate shingle alone yields 40*39/2 = 780 candidate pairs
    uncapped = jaccard_candidates(d, threshold=0.0, max_shingle_df=None)
    assert uncapped.count() >= 780
