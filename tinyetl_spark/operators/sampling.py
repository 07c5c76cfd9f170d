"""Deterministic sampling for training-data mixes.

A 100-TB corpus is never trained on whole: pipelines draw per-language /
per-source mixes ("2 parts en, 1 part code, 0.1 parts everything else").
`df.sample()` is seed-dependent on partitioning and task retries, so it
is NOT stable under replay — unacceptable in a CDC engine whose whole
contract is "recompute reconverges to the same bytes". Everything here
keys off a content hash of the row id instead: the decision for a row is
a pure function of (id, seed), independent of partitioning, task
scheduling, cluster size, or engine (DuckDB reproduces it verbatim,
which is what the oracle checks).

Scale shape:
- `bernoulli_sample` / `stratified_sample`: map-only filter — no
  shuffle, pushes through scans, linear in input.
- `topk_per_stratum`: exact k rows per stratum without sorting whole
  strata through single reducers — partition-local prune to ≤k per
  (stratum, input-partition) first, then the global rank only sees
  O(k × partitions) rows per stratum (same two-stage pattern as
  similarity.cosine_topk). A hot stratum ("en" is half the crawl)
  never funnels through one task.

No reference equivalent (TinyETL samples nothing; its preview takes the
first N rows of a transfer, src/transfer.rs:201-316) — this is part of
the training-data operator set (SURVEY.md §2.2).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

# The hash bucket is the first 8 hex chars of md5("<id>:<seed>") read as
# an unsigned 32-bit int — uniform on [0, 2^32), trivially reproduced in
# SQL as ('0x' || substr(md5(id || ':' || seed), 1, 8))::bigint.
_BUCKETS = 1 << 32


def hash_bucket(id_col: Column, seed: int = 0) -> Column:
    """Uniform deterministic bucket in [0, 2^32) from (id, seed)."""
    h = F.md5(F.concat(id_col.cast("string"), F.lit(f":{seed}")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long")


def threshold(rate: float) -> int:
    """The integer cutoff for a sampling rate (kept integral so engines
    compare longs, never floats)."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    return int(rate * _BUCKETS)


def bernoulli_sample(df: DataFrame, id_col: str, rate: float,
                     seed: int = 0) -> DataFrame:
    """Keep each row iff hash_bucket(id) < rate·2^32 — deterministic,
    partition-independent, replay-stable. Map-only."""
    return df.filter(hash_bucket(F.col(id_col), seed) < threshold(rate))


def stratified_sample(df: DataFrame, strata_col: str, id_col: str,
                      rates: dict[str, float], default_rate: float = 0.0,
                      seed: int = 0) -> DataFrame:
    """Per-stratum Bernoulli rates (a training-mix spec): rows in
    stratum s survive iff hash_bucket(id) < rates.get(s, default)·2^32.
    One map-only pass; the rate table rides along as a CASE expression
    (never a join — it is driver-side config, not data)."""
    cut = F.lit(threshold(default_rate))
    for s, r in sorted(rates.items()):
        cut = F.when(F.col(strata_col) == s, F.lit(threshold(r))) \
               .otherwise(cut)
    return df.filter(hash_bucket(F.col(id_col), seed) < cut)


def topk_per_stratum(df: DataFrame, strata_col: str, id_col: str, k: int,
                     seed: int = 0) -> DataFrame:
    """Exactly min(k, |stratum|) rows per stratum, chosen by hash order
    (a deterministic 'random' sample of fixed size). Ties are impossible
    in practice (32-bit bucket) but (bucket, id) ordering makes the
    result total-order-stable anyway.

    Two-stage: stage 1 ranks within (stratum, input partition) — the
    shuffle key includes the partition id, so a stratum holding half the
    corpus spreads over all tasks; stage 2 ranks the ≤ k·P survivors.
    Output adds `sample_rank` (1-based within stratum)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    b = hash_bucket(F.col(id_col), seed)
    scored = df.withColumn("_b", b).withColumn(
        "_pid", F.spark_partition_id())
    local = Window.partitionBy(strata_col, "_pid") \
                  .orderBy("_b", id_col)
    pruned = (scored.withColumn("_lr", F.row_number().over(local))
                    .filter(F.col("_lr") <= k).drop("_lr", "_pid"))
    final = Window.partitionBy(strata_col).orderBy("_b", id_col)
    return (pruned.withColumn("sample_rank", F.row_number().over(final))
                  .filter(F.col("sample_rank") <= k)
                  .drop("_b"))
