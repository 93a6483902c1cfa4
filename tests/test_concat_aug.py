"""Image-side ConcatAug (reference src/utils/concat_aug.py:25-43):
deterministic pairing, geometry chain, and label concatenation."""

from __future__ import annotations

import hashlib

import pyspark.sql.functions as F

from vietnamese_ocr_spark.functions.imaging import png_decode
from vietnamese_ocr_spark.operators.concat_aug import concat_aug_images


def _labeled_media(spark, corpus):
    media = spark.read.parquet(corpus["media"])
    labels = spark.read.parquet(corpus["labels"])
    return (
        media.join(labels, "media_ref")
        .filter(~F.col("text").contains("\n"))
        .select("media_ref", "png", "text")
    )


def test_concat_aug_shapes_and_labels(spark, corpus):
    lm = _labeled_media(spark, corpus)
    n_in = lm.count()
    out = concat_aug_images(lm, seed=42)
    rows = out.collect()
    assert len(rows) == n_in // 2  # one sample per adjacent pair
    labels = {r["media_ref"]: r["text"] for r in lm.collect()}
    for r in rows:
        assert (r["height"], r["width"]) == (64, 256)
        img = png_decode(r["png"])
        assert img.shape == (64, 256)
        ref1, ref2 = r["pair_id"].split("+")
        # label = label1 + label2, no separator (concat_aug.py:42)
        assert r["label"] == labels[ref1] + labels[ref2]


def test_concat_aug_deterministic_and_seed_sensitive(spark, corpus):
    lm = _labeled_media(spark, corpus)

    def digest(seed):
        rows = concat_aug_images(lm, seed=seed).collect()
        return hashlib.md5(
            "".join(
                f"{r['pair_id']}|{r['label']}|{hashlib.md5(bytes(r['png'])).hexdigest()}"
                for r in sorted(rows, key=lambda r: r["pair_id"])
            ).encode()
        ).hexdigest()

    assert digest(42) == digest(42)
    assert digest(42) != digest(7)
