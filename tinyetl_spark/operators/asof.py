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
3. fold the value columns into ONE struct column, non-null exactly on
   right rows, and take ``last(struct, ignorenulls=True)`` over (key)
   ordered rows between unbounded preceding and current row — a
   streaming window frame, O(1) state per row, no partition buffering.
   The struct tag is what distinguishes "no right row at or before t"
   (null struct → null outputs) from "the matching right row's value is
   NULL" (non-null struct with a null field → the null VALUE wins, it
   does not fall through to an older right row) — matching
   DuckDB/pandas ASOF JOIN semantics;
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
    from pyspark.sql.types import StructField, StructType

    lcols = left.columns
    vtype = StructType([StructField(c, right.schema[c].dataType)
                        for c in value_cols])
    probe = left.select(
        *lcols,
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(vtype).alias("_v"))
    ref = right.select(
        *[F.col(c) if c in right.columns else F.lit(None).alias(c)
          for c in on],
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in lcols if c not in on],
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_side"),
        # always non-null on right rows, even when every value col is null
        F.struct(*[F.col(c).alias(c) for c in value_cols]).alias("_v"),
    ).select(*lcols, "_t", "_side", "_v")
    u = probe.unionByName(ref)
    w = (Window.partitionBy(*on)
         .orderBy(F.col("_t").asc(), F.col("_side").asc())
         .rowsBetween(Window.unboundedPreceding, 0))
    u = u.withColumn("_f", F.last("_v", ignorenulls=True).over(w))
    return (u.filter(F.col("_side") == 1)
             .select(*lcols,
                     *[F.col("_f").getField(c).alias(f"{c}{suffix}")
                       for c in value_cols]))
