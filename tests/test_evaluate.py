"""Quality gate: the engine genuinely READS the synthetic corpus.

Corpus CER (reference metric, src/utils/cer.py) of the Spark pipeline's
recognition against the golden labels must be 0 for single-line payloads
that fit the canvas — not just deterministic, but correct."""

from __future__ import annotations

import pyspark.sql.functions as F

from vietnamese_ocr_spark.plans.evaluate import corpus_cer
from vietnamese_ocr_spark.plans.extract import broadcast_weights, recognize_media_df


def test_corpus_cer_zero_on_clean_single_line(spark, corpus):
    media = spark.read.parquet(corpus["media"])
    labels = spark.read.parquet(corpus["labels"])
    clean = labels.filter(
        (F.length("text") <= 32) & (F.length("text") > 0) & (~F.col("text").contains("\n"))
    )
    rec = recognize_media_df(
        media.select("media_ref", "png", "size_b"), broadcast_weights(spark)
    ).select("media_ref", "rec_text")
    row = corpus_cer(rec, clean).collect()[0]
    assert row["total_chars"] > 500
    assert row["total_errors"] == 0
    assert row["cer"] == 0.0


def test_corpus_cer_zero_on_multiline(spark, corpus):
    """Multi-line media too: the tight band crop (detector.tighten_band)
    scale-normalizes each detected line to its standalone render, so the
    detection+recognition chain is template-exact, not merely stable."""
    media = spark.read.parquet(corpus["media"])
    labels = spark.read.parquet(corpus["labels"])
    multi = labels.filter(F.col("text").contains("\n"))
    assert multi.count() > 0, "corpus must contain multi-line media"
    rec = recognize_media_df(
        media.select("media_ref", "png", "size_b"), broadcast_weights(spark)
    ).select("media_ref", "rec_text")
    row = corpus_cer(rec, multi).collect()[0]
    assert row["total_chars"] > 0
    assert row["total_errors"] == 0
    assert row["cer"] == 0.0
