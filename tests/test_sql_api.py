import pyarrow.parquet as pq

from vietnamese_ocr_spark.plans.sql_api import (
    media_size_histogram,
    register_corpus_views,
    span_stats,
)


def test_sql_span_stats_matches_raw_counts(spark, corpus):
    register_corpus_views(spark, corpus["documents"], corpus["media"])
    rows = {r["kind"]: r for r in span_stats(spark).collect()}
    docs = pq.read_table(corpus["documents"]).to_pylist()
    want_text = sum(1 for d in docs for s in d["spans"] if s["kind"] == "text")
    want_media = sum(1 for d in docs for s in d["spans"] if s["kind"] == "media")
    assert rows["text"]["n_spans"] == want_text
    assert rows["media"]["n_spans"] == want_media


def test_sql_media_histogram_covers_all_rows(spark, corpus):
    register_corpus_views(spark, corpus["documents"], corpus["media"])
    rows = media_size_histogram(spark).collect()
    n_media = pq.read_table(corpus["media"]).num_rows
    assert sum(r["n"] for r in rows) == n_media
    # the generator-private truth column must not leak into the view
    assert "truth" not in spark.table("media_v").columns
