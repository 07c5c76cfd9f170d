"""AS-OF join — "for each left row, the most recent right row at or
before its timestamp, per key".

Spark has no native ASOF JOIN (DuckDB/Pandas do); the naive formulations
are a range join that degenerates to a per-key cross product, or a
windowed subquery per left row. The scalable composition (standard in
time-series engines) is UNION + LAST_VALUE:

1. tag left (probe) and right (reference) rows and union them on a
   common shape;
2. ONE shuffle: partition by key, sort by (time, side) with right rows
   first at equal timestamps (inclusive ``>=`` semantics);
3. ``last(value, ignorenulls=True)`` over (key) ordered rows between
   unbounded preceding and current row — a streaming window frame, O(1)
   state per row, no partition buffering;
4. keep the left rows: each now carries the latest right value at-or-
   before its time.

Cost: one shuffle of |L|+|R| rows — never the O(|L|x|R|) blowup of the
inequality join. Skew = rows per key, same bound as any windowed op.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def asof_join(left: DataFrame, right: DataFrame, on: list[str],
              left_time: str, right_time: str,
              value_cols: list[str], suffix: str = "_asof") -> DataFrame:
    """For every ``left`` row: the ``value_cols`` of the latest ``right``
    row with ``right_time <= left_time`` and equal ``on`` keys (nulls when
    no such row exists). Output = left columns + ``<value_col><suffix>``.
    """
    lcols = left.columns
    probe = left.select(
        *lcols,
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_v_{c}")
          for c in value_cols])
    ref = right.select(
        *[F.col(c) if c in right.columns else F.lit(None).alias(c)
          for c in on],
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in lcols if c not in on],
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_side"),
        *[F.col(c).alias(f"_v_{c}") for c in value_cols],
    ).select(*lcols, "_t", "_side", *[f"_v_{c}" for c in value_cols])
    u = probe.unionByName(ref)
    w = (Window.partitionBy(*on)
         .orderBy(F.col("_t").asc(), F.col("_side").asc())
         .rowsBetween(Window.unboundedPreceding, 0))
    for c in value_cols:
        u = u.withColumn(f"_f_{c}", F.last(f"_v_{c}", ignorenulls=True).over(w))
    return (u.filter(F.col("_side") == 1)
             .select(*lcols,
                     *[F.col(f"_f_{c}").alias(f"{c}{suffix}")
                       for c in value_cols]))
