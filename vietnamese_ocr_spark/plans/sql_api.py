"""SQL API surface: register the corpus as temp views and query with
spark.sql — the same Catalyst plans as the DataFrame API, for users who
drive the engine from SQL (SURVEY.md §1.2 'DataFrame/SQL API throughout')."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def register_corpus_views(
    spark: SparkSession, documents_path: str, media_path: str
) -> None:
    spark.read.parquet(documents_path).createOrReplaceTempView("documents_v")
    spark.read.parquet(media_path).drop("truth").createOrReplaceTempView("media_v")


SPAN_STATS_SQL = """
    SELECT s.kind,
           COUNT(*)                        AS n_spans,
           COUNT(DISTINCT d.doc_id)        AS n_docs,
           SUM(LENGTH(s.text))             AS text_chars
    FROM documents_v d
    LATERAL VIEW EXPLODE(d.spans) AS s
    GROUP BY s.kind
"""

MEDIA_SIZE_SQL = """
    SELECT width_bucket, COUNT(*) AS n,
           CAST(SUM(size_b) AS BIGINT) AS bytes
    FROM (SELECT CAST(FLOOR(width / 64) AS INT) AS width_bucket, size_b
          FROM media_v)
    GROUP BY width_bucket
"""


def span_stats(spark: SparkSession) -> DataFrame:
    return spark.sql(SPAN_STATS_SQL)


def media_size_histogram(spark: SparkSession) -> DataFrame:
    return spark.sql(MEDIA_SIZE_SQL)
