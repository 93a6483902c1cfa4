"""Streaming near-dup detection (streaming/neardup_stream.py)."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

from vietnamese_ocr_spark.streaming.neardup_stream import neardup_stream

BASE = ("one two three four five six seven eight nine ten eleven twelve "
        "thirteen fourteen fifteen sixteen")


def _write(stream_dir, name, rows):
    tbl = pa.table({"doc_id": [d for d, _ in rows], "text": [t for _, t in rows]})
    pq.write_table(tbl, os.path.join(stream_dir, name + ".parquet"))


def test_neardup_stream_flags_duplicates_across_batches(spark, tmp_path):
    stream_dir = str(tmp_path / "in")
    os.makedirs(stream_dir)
    _write(stream_dir, "b0", [("orig", BASE), ("other", "completely different "
            "prose about sailing boats and rivers beyond any shingle overlap "
            "with the original text here")])

    stream = (
        spark.readStream.schema("doc_id string, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(stream_dir)
    )
    q = (
        neardup_stream(stream, threshold=0.75)
        .writeStream.format("memory")
        .queryName("neardups")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        assert spark.table("neardups").count() == 0  # first sightings

        # an exact duplicate arriving later -> flagged against the original
        _write(stream_dir, "b1", [("dup", BASE)])
        q.processAllAvailable()
        rows = spark.table("neardups").collect()
        assert [(r["doc_id"], r["matched_doc"], r["est_jaccard"]) for r in rows] == [
            ("dup", "orig", 1.0)
        ]

        # fresh text is admitted, not flagged
        _write(stream_dir, "b2", [("fresh", "totally new words nowhere else "
                "in this stream forming their own shingle universe entirely")])
        q.processAllAvailable()
        assert spark.table("neardups").count() == 1
    finally:
        q.stop()


def test_neardup_state_cap_evicts_fifo():
    """Pure-function check of the bounded-state discipline."""
    import pandas as pd

    from vietnamese_ocr_spark.streaming.neardup_stream import _neardup_fn

    class FakeState:
        exists = False

        def update(self, v):
            self.exists = True
            self.val = v

        @property
        def get(self):
            return self.val

    fn = _neardup_fn(cap=3, threshold=0.99)
    state = FakeState()
    batch = pd.DataFrame(
        {"doc_id": [f"d{i}" for i in range(5)],
         "sig": [f"s{i}a|s{i}b|s{i}c|s{i}d" for i in range(5)]}
    )
    list(fn(("xx",), iter([batch]), state))
    doc_ids, sigs = state.val
    assert len(doc_ids) == 3 == len(sigs)      # capped
    assert doc_ids == ["d2", "d3", "d4"]       # FIFO: oldest evicted
