"""Stream-stream interval join — watermarked, state-bounded.

The missing piece between the batch range join (operators/ranges.py)
and the streaming surface: join two live event streams on equal keys
where the right event's time falls in ``[left_time - lower,
left_time + upper]`` (the ad-tech impressions/clicks shape, Spark's own
canonical stream-stream example).

Spark's built-in stream-stream inner join (symmetric hash join) is the
right physical operator here — each side buffers state keyed by join
key and the TIME-RANGE predicate in the join condition is what lets
the state store evict: with watermarks on both sides, a buffered left
row can be dropped once the right watermark passes ``left_time +
upper``, and vice versa. Without the range condition the state grows
unboundedly; that is why this helper builds the condition rather than
leaving it to callers.

Output contract matches ``ranges.range_join``: all left columns + all
right non-key columns, keys once. Inner joins only — outer stream-
stream joins emit nulls on watermark expiry and belong to a later
layer.

Scale shape: ONE shuffle per side on the join keys (state store
partitioning); state per key bounded by the interval span x event
rate; no cross product anywhere (the range predicate prunes within a
key's buffered rows).
"""

from __future__ import annotations

import functools

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def interval_join_streams(left: DataFrame, right: DataFrame,
                          on: list[str], left_time: str, right_time: str,
                          lower_seconds: float, upper_seconds: float,
                          watermark_seconds: float = 0.0) -> DataFrame:
    """Watermarked inner interval join of two STREAMING frames.

    ``watermark_seconds`` is the lateness allowance for the LEFT
    stream; the right stream's watermark is widened by the interval
    span automatically (a right row may legitimately arrive up to
    ``upper`` after its matching left row — Spark's documented
    guidance for the impressions→clicks pattern).
    """
    span = int(lower_seconds + upper_seconds)
    wm_l = int(watermark_seconds)
    wm_r = int(watermark_seconds + span) + 1
    l = left.withWatermark(left_time, f"{wm_l} seconds") \
        if wm_l > 0 else left.withWatermark(left_time, "0 seconds")
    r0 = right.withWatermark(right_time, f"{wm_r} seconds")
    r = r0.select(
        *[F.col(c).alias(f"_r_{c}") for c in on],
        *[c for c in right.columns if c not in on])
    cond = [l[c] == r[f"_r_{c}"] for c in on]
    cond.append(r[right_time] >= l[left_time] - F.expr(
        f"INTERVAL {int(lower_seconds)} SECONDS"))
    cond.append(r[right_time] <= l[left_time] + F.expr(
        f"INTERVAL {int(upper_seconds)} SECONDS"))
    return (l.join(r, functools.reduce(lambda a, b: a & b, cond), "inner")
             .drop(*[f"_r_{c}" for c in on]))
