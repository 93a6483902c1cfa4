"""Bucketed tables: co-located, shuffle-free joins.

At 100 TB the dominant cost of a repeated big-big equi-join (e.g.
documents x media on media_ref, or any fact-fact join) is the shuffle.
Writing both sides bucketed by the join key with the same bucket count
pins rows to buckets by hash at WRITE time, so every later join on that
key is exchange-free: Spark reads bucket i of both sides into the same
task. Pay the shuffle once when the table is laid down, never again —
the parquet/Hive-bucketing equivalent of an Iceberg bucket partition
transform.

tests/test_bucketed.py asserts the join plan contains NO Exchange and
that results equal the plain-join results.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    path: str,
    key: str = "doc_id",
    buckets: int = 32,
) -> None:
    """Write `df` as a bucketed external parquet table registered as
    `table_name`. `buckets` must match across tables meant to co-join;
    sortBy(key) additionally makes the per-bucket merge sort-free."""
    (
        df.write.mode("overwrite")
        .bucketBy(buckets, key)
        .sortBy(key)
        .option("path", path)
        .format("parquet")
        .saveAsTable(table_name)
    )


def write_partitioned(df: DataFrame, path: str, *keys: str) -> None:
    """Hive-style partitioned layout (`path/key=value/...`): reads that
    filter on a partition key scan only matching directories (partition
    pruning — PartitionFilters in the plan, zero IO for the rest). Use
    for low-cardinality routing columns (lang, source, date); use
    bucketing (above) for high-cardinality join keys."""
    df.write.mode("overwrite").partitionBy(*keys).parquet(path)


def read_bucketed(spark: SparkSession, table_name: str) -> DataFrame:
    """Catalog read — bucketing metadata only survives via the catalog;
    spark.read.parquet(path) on the same files would NOT know the layout
    and would shuffle again."""
    return spark.table(table_name)
