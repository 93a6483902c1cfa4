"""Stateful streaming dedup: duplicates across micro-batches are dropped."""

from __future__ import annotations

import glob
import os
import shutil

from vietnamese_ocr_spark.streaming.dedup_stream import first_seen_stream
from vietnamese_ocr_spark.streaming.stream_extract import DOCUMENTS_DDL


def test_first_seen_dedup_across_microbatches(spark, corpus, tmp_path):
    stream_dir = str(tmp_path / "in")
    os.makedirs(stream_dir)
    src = corpus["documents"]
    parts = sorted(glob.glob(src + "/*.parquet")) if os.path.isdir(src) else [src]
    # batch 0 = originals; batch 1 = the SAME file again (duplicate content)
    shutil.copy(parts[0], os.path.join(stream_dir, "batch-0.parquet"))
    shutil.copy(parts[0], os.path.join(stream_dir, "batch-1.parquet"))

    stream = (
        spark.readStream.schema(DOCUMENTS_DDL)
        .option("maxFilesPerTrigger", "1")
        .parquet(stream_dir)
    )
    q = (
        first_seen_stream(stream)
        .writeStream.format("memory")
        .queryName("first_seen")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    out = spark.sql("select * from first_seen").collect()
    n_docs = spark.read.parquet(corpus["documents"]).count()
    digests = [r["digest"] for r in out]
    # every digest exactly once, despite the duplicated micro-batch
    assert len(digests) == len(set(digests))
    assert len(digests) == n_docs
