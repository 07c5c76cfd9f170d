"""Range (interval) join — "left rows paired with right rows whose time
falls in [left_time - lower, left_time + upper], per key".

The naive formulation is an inequality join, which Spark plans as a
per-key cross product (BroadcastNestedLoop at best) — O(|L|x|R|) within a
key, a scale-killer for hot keys. The bucketed composition (standard in
interval-join engines, e.g. Flink's interval join):

1. choose a bin width >= the window span; assign every right row to
   bin(right_time);
2. every left row's window overlaps AT MOST two consecutive bins —
   explode left over exactly those bins;
3. ONE equi-join shuffle on (key, bin) produces the candidate pairs;
4. an exact range filter on the raw timestamps keeps true matches.

Cost: |L|x2 + |R| shuffled rows and only in-bin candidates — never a
cross product. Skew = per (key, bin) density, bounded by the window.
"""

from __future__ import annotations

import functools

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def range_join(left: DataFrame, right: DataFrame, on: list[str],
               left_time: str, right_time: str,
               lower_seconds: float, upper_seconds: float) -> DataFrame:
    """Inner range join; output = all left columns + all right columns
    (key columns appear once). Matches: equal ``on`` keys AND
    ``left_time - lower <= right_time <= left_time + upper``."""
    span = max(int(lower_seconds + upper_seconds) + 1, 1)
    # bin via second-truncated epoch (monotone; exactness comes from the
    # final raw-timestamp filter, the bins only bound the candidates)
    lbin_lo = F.floor((F.unix_timestamp(F.col(left_time))
                       - F.lit(int(lower_seconds))) / span)
    lbin_hi = F.floor((F.unix_timestamp(F.col(left_time))
                       + F.lit(int(upper_seconds))) / span)
    l = left.withColumn(
        "_bin", F.explode(F.array_distinct(F.sequence(lbin_lo, lbin_hi))))
    r = right.select(
        *[F.col(c).alias(f"_r_{c}") for c in on],
        *[c for c in right.columns if c not in on],
        F.floor(F.unix_timestamp(F.col(right_time)) / span).alias("_rbin"))
    cond = [l["_bin"] == r["_rbin"]]
    for c in on:
        cond.append(l[c] == r[f"_r_{c}"])
    lo_ok = F.col(right_time) >= F.col(left_time) - F.expr(
        f"INTERVAL {int(lower_seconds)} SECONDS")
    hi_ok = F.col(right_time) <= F.col(left_time) + F.expr(
        f"INTERVAL {int(upper_seconds)} SECONDS")
    drop = ["_bin", "_rbin"] + [f"_r_{c}" for c in on]
    return (l.join(r, functools.reduce(lambda a, b: a & b, cond), "inner")
             .filter(lo_ok & hi_ok)
             .drop(*drop))
