"""Scoped tracking of operator-internal persisted frames.

Operators persist frames that several of their own subtrees consume
(shingle sets, band tables, the exploded span projection). The caller
receives lazy DataFrames, so the operator can never unpersist safely
itself — instead every internal persist registers here and the
session-level consumer (bench loop, curate/extract CLI, test harness)
calls release_persisted() once the action is done. This is the scoped
alternative to blanket spark.catalog.clearCache(): it frees exactly the
frames the engine created and nothing the application cached on
purpose.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame

_TRACKED: list[DataFrame] = []


def persist_tracked(
    df: DataFrame, level: StorageLevel = StorageLevel.MEMORY_AND_DISK
) -> DataFrame:
    df = df.persist(level)
    _TRACKED.append(df)
    return df


def release_persisted() -> int:
    """Unpersist every tracked frame created since the last call;
    returns how many were released."""
    n = 0
    for df in _TRACKED:
        try:
            df.unpersist()
            n += 1
        except Exception:
            pass  # session already stopped — nothing to release
    _TRACKED.clear()
    return n
