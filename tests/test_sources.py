"""Source operators: TSV labels (S4), vocab build from labels (A1)."""

from __future__ import annotations

import pyspark.sql.functions as F

from vietnamese_ocr_spark.model.vocab import Vocabulary


def test_tsv_label_source_matches_parquet(spark, corpus):
    """S4: spark.read.csv(sep='\\t') over the reference TSV format equals
    the parquet labels table (single-line rows; empty-text rows — the
    'a'-fallback media — are dropped by the CSV reader as null text,
    mirroring vocab.py:8-9 trailing-empty handling)."""
    tsv = spark.read.option("sep", "\t").csv(
        corpus["labels_tsv"], schema="media_ref string, text string"
    )
    par = (
        spark.read.parquet(corpus["labels"])
        .filter(~F.col("text").contains("\n"))
        .filter(F.length("text") > 0)
    )
    got = {r["media_ref"]: r["text"] for r in tsv.filter(F.col("text").isNotNull()).collect()}
    want = {r["media_ref"]: r["text"] for r in par.collect()}
    assert got == want
    assert len(got) > 100


def test_vocab_build_from_labels_subset_of_engine_vocab(spark, corpus):
    """A1 on the fixture corpus: corpus-built vocab ids are dense from 3,
    sorted by codepoint, and the charset is inside the engine domain."""
    labels = spark.read.parquet(corpus["labels"])
    chars = (
        labels.select(F.explode(F.split("text", "")).alias("ch"))
        .filter((F.col("ch") != "") & (F.col("ch") != "\n"))
        .distinct()
        .orderBy("ch")
    )
    built = [r["ch"] for r in chars.collect()]
    assert built == sorted(built)
    engine = set(Vocabulary().letters)
    assert set(built) <= engine
