"""Watermarked windowed aggregation: emit-once on window close, drop
late events (streaming/windowed_metrics.py)."""

from __future__ import annotations

import datetime
import os

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from vietnamese_ocr_spark.streaming.windowed_metrics import windowed_kind_counts

SCHEMA = "kind string, event_time timestamp"


def _write_batch(stream_dir: str, name: str, rows: list[tuple[str, str]]):
    # one flat parquet FILE per micro-batch: Spark's file-stream source
    # lists files at the top level, not nested dataframe-writer dirs
    ts = [datetime.datetime.fromisoformat(t) for _, t in rows]
    tbl = pa.table(
        {"kind": [k for k, _ in rows], "event_time": pa.array(ts, pa.timestamp("us"))}
    )
    pq.write_table(tbl, os.path.join(stream_dir, name + ".parquet"))


def test_windowed_counts_emit_once_and_drop_late(spark, tmp_path):
    stream_dir = str(tmp_path / "in")
    os.makedirs(stream_dir)
    # batch 0 present before the stream starts (readStream needs >=1 file)
    _write_batch(stream_dir, "b0", [
        ("text", "2026-01-01 00:01:00"),   # window W1 [00:00, 00:10)
        ("media", "2026-01-01 00:02:00"),  # W1
        ("text", "2026-01-01 00:11:00"),   # W2 [00:10, 00:20)
    ])

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(stream_dir)
    )
    q = (
        windowed_kind_counts(stream, "10 minutes", "5 minutes")
        .writeStream.format("memory")
        .queryName("wmetrics")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        # watermark so far: 00:11 - 5m = 00:06 < W1.end -> nothing emitted
        assert spark.table("wmetrics").count() == 0

        # 00:21 advances the watermark to 00:16 > W1.end -> W1 emits
        _write_batch(stream_dir, "b1", [("text", "2026-01-01 00:21:00")])
        q.processAllAvailable()
        w1 = {(r["kind"], r["n_spans"]) for r in spark.table("wmetrics").collect()}
        assert w1 == {("text", 1), ("media", 1)}

        # a LATE event for the already-closed W1 (00:03 < watermark) plus a
        # row that pushes the watermark past W2.end
        _write_batch(stream_dir, "b2", [
            ("text", "2026-01-01 00:03:00"),
            ("text", "2026-01-01 00:31:00"),
        ])
        q.processAllAvailable()
        _write_batch(stream_dir, "b3", [("text", "2026-01-01 00:41:00")])
        q.processAllAvailable()
    finally:
        q.stop()

    got = {
        (str(r["window_start"]), r["kind"]): r["n_spans"]
        for r in spark.table("wmetrics").collect()
    }
    # W1 emitted exactly once with its on-time counts; the late 00:03 text
    # event was dropped (count stayed 1, no duplicate W1 row appeared)
    assert got == {
        ("2026-01-01 00:00:00", "text"): 1,
        ("2026-01-01 00:00:00", "media"): 1,
        ("2026-01-01 00:10:00", "text"): 1,
        ("2026-01-01 00:20:00", "text"): 1,  # W3 closed by the 00:41 row
        # W4 [00:30, 00:40) and W5 still open -> withheld
    }


def test_session_windows_merge_and_finalize(spark, tmp_path):
    from vietnamese_ocr_spark.streaming.windowed_metrics import session_event_counts

    stream_dir = str(tmp_path / "in")
    os.makedirs(stream_dir)

    def wb(name, rows):
        ts = [datetime.datetime.fromisoformat(t) for _, t in rows]
        tbl = pa.table(
            {"user_id": [u for u, _ in rows], "event_time": pa.array(ts, pa.timestamp("us"))}
        )
        pq.write_table(tbl, os.path.join(stream_dir, name + ".parquet"))

    # two events 10 min apart -> ONE session (gap 30m) ending 00:10+30m
    wb("b0", [(1, "2026-01-01 00:00:00"), (1, "2026-01-01 00:10:00")])
    stream = (
        spark.readStream.schema("user_id bigint, event_time timestamp")
        .option("maxFilesPerTrigger", "1")
        .parquet(stream_dir)
    )
    q = (
        session_event_counts(stream, gap="30 minutes", watermark="10 minutes")
        .writeStream.format("memory")
        .queryName("sessions")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        assert spark.table("sessions").count() == 0  # session still open
        # 02:00 -> watermark 01:50 > 00:40 closes session 1; opens session 2
        wb("b1", [(1, "2026-01-01 02:00:00")])
        q.processAllAvailable()
        # 03:00 -> watermark 02:50 > 02:30 closes session 2
        wb("b2", [(1, "2026-01-01 03:00:00")])
        q.processAllAvailable()
    finally:
        q.stop()

    got = {
        (str(r["session_start"]), str(r["session_end"])): r["n_events"]
        for r in spark.table("sessions").collect()
    }
    assert got == {
        ("2026-01-01 00:00:00", "2026-01-01 00:40:00"): 2,  # merged pair
        ("2026-01-01 02:00:00", "2026-01-01 02:30:00"): 1,
        # session from 03:00 still open -> withheld
    }


def test_windowed_counts_batch_plan_shape(spark):
    """The same operator runs on a batch frame (watermark is a no-op) —
    value check of the window/count logic itself."""
    df = spark.createDataFrame(
        [("text", "2026-01-01 00:01:00"), ("text", "2026-01-01 00:09:00"),
         ("media", "2026-01-01 00:12:00")],
        "kind string, event_time string",
    ).select("kind", F.col("event_time").cast("timestamp"))
    got = {
        (str(r["window_start"]), r["kind"]): r["n_spans"]
        for r in windowed_kind_counts(df).collect()
    }
    assert got == {
        ("2026-01-01 00:00:00", "text"): 2,
        ("2026-01-01 00:10:00", "media"): 1,
    }
