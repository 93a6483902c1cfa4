"""Event-time windowed throughput metrics with watermarked late-data
handling.

The batch pipeline's lineage table answers "what did this run do"; on a
continuous ingest the operations question is "spans/sec by kind, per
event-time window, tolerating stragglers" — the canonical Structured
Streaming shape: `withWatermark` + `groupBy(window(...))` in append mode.
State is bounded by the watermark (Spark drops a window's state once the
watermark passes its end), so this runs forever at constant memory —
unlike a raw groupBy on event_time, which grows without bound.

Append-mode semantics (asserted in tests/test_windowed_metrics.py):
a window emits exactly once, when the watermark passes its end; events
later than the watermark are dropped, never double-counted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def session_event_counts(
    stream: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "10 minutes",
    key: str = "user_id",
    time_col: str = "event_time",
) -> DataFrame:
    """Streaming sessionization: `session_window` merges events within
    `gap` of each other into one growing session per key; a session
    finalizes (emits once, state dropped) when the watermark passes its
    end (= last event + gap). The streaming-native form of the batch
    `sessionize` query (plans/queries.py) — same gap semantics, but
    incremental with bounded state instead of a full-history window scan.
    """
    return (
        stream.withWatermark(time_col, watermark)
        .groupBy(F.session_window(time_col, gap).alias("w"), key)
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            key,
            "n_events",
        )
    )


def windowed_kind_counts(
    stream: DataFrame,
    window_len: str = "10 minutes",
    watermark: str = "5 minutes",
    time_col: str = "event_time",
) -> DataFrame:
    """spans stream (kind, event_time) -> one row per (window, kind) with
    the span count, emitted once the watermark closes the window.

    Works on a batch DataFrame too (Spark ignores the watermark there),
    which is how the plan shape is unit-checkable without a stream.
    """
    return (
        stream.withWatermark(time_col, watermark)
        .groupBy(F.window(time_col, window_len).alias("w"), "kind")
        .agg(F.count("*").alias("n_spans"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "kind",
            "n_spans",
        )
    )
