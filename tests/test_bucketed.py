"""Bucketed co-located joins are exchange-free (sources/bucketed.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from vietnamese_ocr_spark.sources.bucketed import read_bucketed, write_bucketed


def test_bucketed_join_is_shuffle_free_and_correct(spark, tmp_path):
    left = spark.range(0, 1000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 7).alias("grp")
    )
    right = spark.range(0, 1000, 3).select(
        F.col("id").alias("doc_id"), (F.col("id") * 2).alias("val")
    )
    write_bucketed(left, "b_left", str(tmp_path / "l"), buckets=8)
    write_bucketed(right, "b_right", str(tmp_path / "r"), buckets=8)
    # tiny test tables would broadcast (a BroadcastExchange), hiding the
    # point; force the sort-merge path a big-big join would take
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        bl, br = read_bucketed(spark, "b_left"), read_bucketed(spark, "b_right")
        joined = bl.join(br, "doc_id")
        plan = joined._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
            joined._jdf.queryExecution(), "formatted"
        )
        assert "Exchange" not in plan, plan
        # and no per-task sort either: both sides were written sortBy(key)
        got = {(r["doc_id"], r["grp"], r["val"]) for r in joined.collect()}
        want = {(i, i % 7, i * 2) for i in range(0, 1000, 3)}
        assert got == want
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("drop table if exists b_left")
        spark.sql("drop table if exists b_right")


def test_partitioned_write_prunes_partitions(spark, tmp_path):
    from vietnamese_ocr_spark.sources.bucketed import write_partitioned

    df = spark.range(0, 300).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 3 == 0, "vi").when(F.col("id") % 3 == 1, "en")
        .otherwise("fr").alias("lang"),
    )
    path = str(tmp_path / "by_lang")
    write_partitioned(df, path, "lang")
    filtered = spark.read.parquet(path).filter(F.col("lang") == "vi")
    plan = filtered._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        filtered._jdf.queryExecution(), "formatted"
    )
    # the lang predicate lands in PartitionFilters (directory pruning),
    # not in the data filter — the other two partitions are never read
    assert "PartitionFilters" in plan and "lang" in plan.split("PartitionFilters")[1].split("]")[0]
    assert filtered.count() == 100


def test_unbucketed_same_join_shuffles(spark):
    """Control: the identical join without bucketing plans an Exchange —
    i.e. the bucketing is what removed it."""
    left = spark.range(0, 1000).select(F.col("id").alias("doc_id"))
    right = spark.range(0, 1000, 3).select(F.col("id").alias("doc_id"))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = left.join(right, "doc_id")
        plan = joined._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
            joined._jdf.queryExecution(), "formatted"
        )
        assert "Exchange" in plan, plan
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
