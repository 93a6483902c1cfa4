"""Table profiling: per-column QA stats in one pass.

Before a 100-TB corpus enters training, someone asks: how many NULLs,
how many distincts, what ranges? This computes, for every requested
column, (rows, nulls, distincts, min, max) — a single full scan with
map-side-combined aggregates, emitted long-form (one row per column) so
the result is stable regardless of column count. min/max stringify so
heterogeneous column types share one output schema.
"""

from __future__ import annotations

import functools

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """df -> (column, n_rows, n_nulls, n_distinct, min_str, max_str)."""
    cols = columns if columns is not None else df.columns
    agg_exprs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        agg_exprs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).cast("long").alias(f"{c}__nulls"),
            F.count_distinct(F.col(c)).alias(f"{c}__distinct"),
            F.min(F.col(c)).cast("string").alias(f"{c}__min"),
            F.max(F.col(c)).cast("string").alias(f"{c}__max"),
        ]
    wide = df.agg(*agg_exprs)
    parts = [
        wide.select(
            F.lit(c).alias("column"),
            F.col("n_rows").cast("long").alias("n_rows"),
            F.col(f"{c}__nulls").alias("n_nulls"),
            F.col(f"{c}__distinct").cast("long").alias("n_distinct"),
            F.col(f"{c}__min").alias("min_str"),
            F.col(f"{c}__max").alias("max_str"),
        )
        for c in cols
    ]
    return functools.reduce(lambda a, b: a.unionByName(b), parts)
