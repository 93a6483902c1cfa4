"""Evaluation: corpus CER between recognized text and golden labels.

Reference semantics (src/utils/cer.py:18-37 + src/model/trainer.py:131-134):
corpus CER = sum(levenshtein(pred, target)) / sum(len(target)) — a
partial+final aggregation (sums commute), so it runs as one map-side-
combined agg; levenshtein is Spark's JVM built-in, not a UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def corpus_cer(rec: DataFrame, labels: DataFrame) -> DataFrame:
    """rec(media_ref, rec_text) x labels(media_ref, text) -> one-row CER.

    Inner join mirrors the reference's KeyError-drop lookup (J1,
    src/utils/dataloader.py:48).
    """
    joined = rec.join(labels, "media_ref").select(
        F.levenshtein("rec_text", "text").alias("errors"),
        F.length("text").alias("chars"),
    )
    return joined.agg(
        F.sum("errors").cast("long").alias("total_errors"),
        F.sum("chars").cast("long").alias("total_chars"),
        F.round(F.sum("errors") / F.sum("chars"), 6).alias("cer"),
    )
