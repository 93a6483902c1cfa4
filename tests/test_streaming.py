"""Streaming variant: file-stream in -> same span-equality out."""

from __future__ import annotations

import glob
import os
import shutil

from vietnamese_ocr_spark.streaming.stream_extract import stream_extract


def test_stream_extract_matches_oracle(spark, corpus, golden, tmp_path):
    # split the documents table into an append-only stream dir
    stream_dir = str(tmp_path / "stream_in")
    os.makedirs(stream_dir)
    src = corpus["documents"]
    parts = sorted(glob.glob(src + "/*.parquet")) if os.path.isdir(src) else [src]
    for i, p in enumerate(parts):
        shutil.copy(p, os.path.join(stream_dir, f"batch-{i:04d}.parquet"))

    out = str(tmp_path / "stream_out")
    q = stream_extract(
        spark, stream_dir, corpus["media"], out,
        checkpoint_dir=str(tmp_path / "ckpt"), max_files_per_trigger=1,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    rows = spark.read.parquet(out + "/extracted").collect()
    got = {
        r["doc_id"]: [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in r["spans"]]
        for r in rows
    }
    assert got == golden
    # lineage was committed per epoch
    lin = spark.read.parquet(out + "/lineage")
    assert lin.count() >= 1
