"""As-of join — an operator Spark lacks natively (pyspark guide: bucketize
or merge_asof). This implementation is the scalable union-tag idiom:

  union the two sides with a side tag, order within the join key by
  (time, side), and carry the right side's latest values forward with
  last(ignoreNulls) over an unbounded-preceding window; keep left rows.

One shuffle on the key, no Python, no range-bucket tuning. DuckDB has a
native ASOF JOIN, which is the oracle for the driver check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    value_cols: list[str],
    tie_right_first: bool = True,
) -> DataFrame:
    """For each left row: values from the right row with the greatest
    right_time <= left_time (strict < when tie_right_first=False) within
    the same `on` key. Output = left columns + asof_<col> (NULL when no
    prior right row exists)."""
    lt = left.withColumn("_t", F.col(left_time)).withColumn("_side", F.lit(1))
    for c in value_cols:
        lt = lt.withColumn(f"_r_{c}", F.lit(None).cast(right.schema[c].dataType))
    rt = right.select(
        on,
        F.col(right_time).alias("_t"),
        F.lit(0 if tie_right_first else 2).alias("_side"),
        *[F.col(c).alias(f"_r_{c}") for c in value_cols],
    )
    unioned = lt.unionByName(rt, allowMissingColumns=True)
    w = (
        Window.partitionBy(on)
        .orderBy("_t", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        "*",
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"asof_{c}")
            for c in value_cols
        ],
    )
    return filled.filter(F.col("_side") == 1).drop(
        "_t", "_side", *[f"_r_{c}" for c in value_cols]
    )
