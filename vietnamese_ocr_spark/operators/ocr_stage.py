"""The single vectorized OCR stage: mapInPandas over Arrow batches.

This is the engine's only Python-side operator on the media path. Each Arrow
batch (<= spark.sql.execution.arrow.maxRecordsPerBatch rows of PNG bytes) is
decoded and preprocessed with NumPy, stacked (legal because P4 canonicalizes
every image to 64x256, src/utils/transform.py:46-53), and pushed through the
shared Recognizer in sub-batches of 32 (the reference's inference batch
size, src/utils/inference.py:44). Never per-row Python at the Spark level.

Weights travel as ONE broadcast of the .npz bytes and are hydrated into a
module-level singleton on first use per Python worker — the Spark analog of
the reference loading its checkpoint once per process
(src/utils/inference.py:20-28; SURVEY.md §4 X8).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark import TaskContext
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..model.pipeline import recognize_png_batch
from ..model.recognizer import Recognizer, weights_from_bytes

OCR_OUTPUT_SCHEMA = (
    "media_ref string, rec_text string, conf_hist array<bigint>, "
    "n_tokens bigint, decode_ok boolean, part_id int"
)

_RECOGNIZER: Recognizer | None = None


def _hydrate(weights_bc) -> Recognizer:
    global _RECOGNIZER
    if _RECOGNIZER is None:
        _RECOGNIZER = Recognizer(weights_from_bytes(weights_bc.value))
    return _RECOGNIZER


def make_ocr_stage(weights_bc):
    """Returns the mapInPandas function closure over the weights broadcast."""

    def ocr_stage(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rec = _hydrate(weights_bc)
        ctx = TaskContext.get()
        part_id = ctx.partitionId() if ctx is not None else -1
        for pdf in batches:
            if len(pdf) == 0:
                continue
            refs = pdf["media_ref"].tolist()
            texts, hist, ok = recognize_png_batch(pdf["png"].tolist(), rec)
            yield pd.DataFrame(
                {
                    "media_ref": refs,
                    "rec_text": texts,
                    "conf_hist": hist.tolist(),
                    "n_tokens": [int(x) for x in hist.sum(axis=1)],
                    "decode_ok": ok,
                    "part_id": part_id,
                }
            )

    return ocr_stage


def size_bucket(col: Column, bucket_bytes: int = 4096) -> Column:
    """Coarse payload-size bucket used as the salting dimension."""
    return (col / F.lit(bucket_bytes)).cast("int")


def salted_repartition(df: DataFrame, n_partitions: int, weight_col: str = "size_b",
                       salts_per_bucket: int | None = None) -> DataFrame:
    """Skew-defeating repartition before the OCR stage (north_rule; X-skew).

    AQE's skew-join handling only rebalances *join* shuffles — a UDF stage
    fed by a skewed key distribution still stalls on its whale partitions.
    We shuffle on (size_bucket, salt) so same-cost rows spread uniformly:
    every partition receives a similar mix of cheap and expensive images,
    which keeps the mapInPandas stage's task times flat (SURVEY.md §4).

    The salt space MUST comfortably exceed the partition count: payload
    sizes cluster into very few buckets, so (bucket x salt) is the real key
    cardinality — with only ~8 salts most partitions receive zero rows
    (measured: median task 0 rows, max 4.8k). Hash partitioning places
    whole (bucket, salt) CELLS binomially, so per-partition row-count
    variance ~ 1/sqrt(cells per partition): with one dominant size bucket
    the round-3 64x multiplier left ~12% count spread at 8 partitions
    (measured in the round-4 skew probe); 512x pushes it under ~4% while
    the shuffle key stays tiny.
    """
    if salts_per_bucket is None:
        salts_per_bucket = n_partitions * 512
    salted = df.withColumn("_bucket", size_bucket(F.col(weight_col))).withColumn(
        "_salt", F.pmod(F.xxhash64(F.col("media_ref")), F.lit(salts_per_bucket))
    )
    return salted.repartition(n_partitions, "_bucket", "_salt").drop("_bucket", "_salt")
