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


# ---------------------------------------------------------------------------
# DSIR — Data Selection via Importance Resampling (Xie et al., NeurIPS 2023)
#
# Select the k corpus docs that look most like a (small) target corpus:
# fit hashed bag-of-ngrams models p̂ (target) and q̂ (raw corpus), weight
# each doc by log p̂(x)/q̂(x), then draw without replacement via the
# Gumbel-top-k trick.  Everything is deterministic and fixed-point so a
# replay — or the DuckDB oracle — reproduces the selection bit-for-bit:
#
# - feature = first-8-hex-of-md5(word n-gram) mod n_buckets (hashed
#   unigrams+bigrams by default, the paper's feature space);
# - per-bucket log-ratio λ[h] = ln((p_c+1)/(p_tot+B)) − ln((q_c+1)/(q_tot+B))
#   (Laplace smoothing), stored ×1e6 rounded as BIGINT;
# - per-doc weight = Σ λ_fp over its gram stream — exact integer sum,
#   aggregation-order-independent;
# - Gumbel noise g_i = −ln(−ln(u_i)) with u_i from the SAME md5 hash
#   bucket as bernoulli_sample (pure function of (id, seed)), rounded
#   into the same 1e-6 fixed-point grid, so the top-k key is a BIGINT.
#
# Scale shape (10^10 docs): both count models reduce map-side to ≤ B
# rows (B ~ 10^4-10^5) — the λ table is broadcast, the corpus never
# shuffles its grams anywhere except the partial-aggregated per-doc sum
# (O(docs) shuffle), and the final selection is orderBy+limit =
# TakeOrderedAndProject (per-partition top-k, merge on driver).  The
# target corpus is small by construction (it is the thing you wish you
# had more of).  No reference equivalent (SURVEY.md §2.2).
# ---------------------------------------------------------------------------

from .decontam import ngram_hashes  # noqa: E402  (md5 word n-grams)

_LAM_FP = 1_000_000  # fixed-point grid for log-ratio weights


def gram_buckets(text_col: Column, n_buckets: int,
                 ns: tuple[int, ...] = (1, 2)) -> Column:
    """array<long> of hashed n-gram feature buckets for every n in
    ``ns``: first 8 hex chars of md5(gram) read as uint32, mod
    n_buckets. Pure Catalyst; DuckDB replays it verbatim."""
    arrs = [ngram_hashes(text_col, n) for n in ns]
    allg = F.concat(*arrs) if len(arrs) > 1 else arrs[0]
    return F.transform(
        allg,
        lambda g: F.pmod(F.conv(F.substring(g, 1, 8), 16, 10).cast("long"),
                         F.lit(n_buckets)))


def _bucket_counts(df: DataFrame, text_col: str, n_buckets: int,
                   ns: tuple[int, ...]) -> DataFrame:
    """(h, c): corpus-wide gram-bucket counts. Map-side combine shrinks
    every partition to ≤ n_buckets rows before the shuffle."""
    return (df.select(F.explode(gram_buckets(F.col(text_col), n_buckets,
                                             ns)).alias("h"))
              .groupBy("h").agg(F.count(F.lit(1)).alias("c")))


def dsir_log_ratios(corpus: DataFrame, target: DataFrame,
                    text_col: str = "text", n_buckets: int = 4096,
                    ns: tuple[int, ...] = (1, 2)) -> DataFrame:
    """The broadcastable λ table: (h, lam_fp) for every bucket observed
    in the corpus (buckets only the target hits can never be touched by
    a corpus doc, so a left join from the corpus side is complete)."""
    p = _bucket_counts(target, text_col, n_buckets, ns) \
        .withColumnRenamed("c", "pc")
    q = _bucket_counts(corpus, text_col, n_buckets, ns) \
        .withColumnRenamed("c", "qc")
    pt = p.agg(F.coalesce(F.sum("pc"), F.lit(0)).alias("pt"))
    qt = q.agg(F.coalesce(F.sum("qc"), F.lit(0)).alias("qt"))
    b = F.lit(float(n_buckets))
    lam = (F.log((F.coalesce(F.col("pc"), F.lit(0)) + F.lit(1.0))
                 / (F.col("pt") + b))
           - F.log((F.col("qc") + F.lit(1.0)) / (F.col("qt") + b)))
    return (q.join(p, "h", "left_outer")
             .crossJoin(F.broadcast(pt)).crossJoin(F.broadcast(qt))
             .select("h", F.round(lam * _LAM_FP, 0).cast("long")
                           .alias("lam_fp")))


def dsir_weights(corpus: DataFrame, target: DataFrame,
                 text_col: str = "text", id_col: str = "doc_id",
                 n_buckets: int = 4096,
                 ns: tuple[int, ...] = (1, 2)) -> DataFrame:
    """corpus + ``logw_fp`` (BIGINT, ×1e6): the DSIR importance
    log-weight Σ_g λ[h(g)]. Docs with no grams in-vocab score 0."""
    lam = dsir_log_ratios(corpus, target, text_col, n_buckets, ns)
    grams = corpus.select(
        F.col(id_col),
        F.explode(gram_buckets(F.col(text_col), n_buckets, ns)).alias("h"))
    w = (grams.join(F.broadcast(lam), "h", "left_outer")
              .groupBy(id_col)
              .agg(F.sum(F.coalesce(F.col("lam_fp"), F.lit(0)))
                    .alias("logw_fp")))
    return (corpus.join(w, id_col, "left_outer")
                  .withColumn("logw_fp",
                              F.coalesce(F.col("logw_fp"), F.lit(0))
                               .cast("long")))


def dsir_resample(corpus: DataFrame, target: DataFrame, k: int,
                  text_col: str = "text", id_col: str = "doc_id",
                  n_buckets: int = 4096, ns: tuple[int, ...] = (1, 2),
                  seed: int = 0) -> DataFrame:
    """Gumbel-top-k importance resampling: key_i = logw_i + g_i with
    deterministic per-id Gumbel noise, take the k largest. Equivalent
    to sampling k docs without replacement ∝ exp(logw) (Vieira 2014),
    but a pure function of (corpus, target, k, seed). Adds
    ``logw_fp`` and ``gumbel_key_fp``; plans as TakeOrderedAndProject."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    w = dsir_weights(corpus, target, text_col, id_col, n_buckets, ns)
    u = (hash_bucket(F.col(id_col), seed) + F.lit(0.5)) \
        / F.lit(float(_BUCKETS))
    g = -F.log(-F.log(u))
    key = (F.col("logw_fp")
           + F.round(g * _LAM_FP, 0).cast("long")).alias("gumbel_key_fp")
    return (w.withColumn("gumbel_key_fp", key)
             .orderBy(F.col("gumbel_key_fp").desc(), F.col(id_col))
             .limit(k))


# ---------------------------------------------------------------------------
# Temperature-scaled mix rebalancing (XLM-R / mT5 / UNIMAX style):
# resample strata (languages, sources) toward q_s ∝ p_s^α.  α=1 keeps
# the natural mix, α→0 flattens it.  Bernoulli realization: the stratum
# whose share must GROW the most gets rate 1 (can't upsample without
# replacement) and every other stratum downsamples proportionally —
# r_s = n_s^(α-1) / max_t n_t^(α-1), the standard head-language
# downsampling used on Common-Crawl-scale multilingual corpora.
#
# The rates are computed IN the plan from the corpus's own counts (one
# map-side-combined groupBy → a strata-sized table, broadcast back), so
# the operator stays a two-job map-only pipeline at any scale and the
# whole decision — counts, rates, thresholds, per-row hash — is replay-
# stable and engine-reproducible (the threshold is floor(r·2^32) as
# BIGINT; rows compare longs, never floats).
# ---------------------------------------------------------------------------


def temperature_thresholds(df: DataFrame, strata_col: str,
                           alpha: float) -> DataFrame:
    """(stratum, n, thr): per-stratum integer keep-threshold realizing
    the temperature-α mix. thr = floor(n^(α-1) / max_t n_t^(α-1) · 2^32)
    — the rarest stratum (for α<1) keeps everything."""
    if alpha <= 0:
        raise ValueError(f"alpha must be > 0, got {alpha}")
    cnt = df.groupBy(strata_col).agg(F.count(F.lit(1)).alias("n"))
    u = F.pow(F.col("n").cast("double"), F.lit(alpha - 1.0))
    m = cnt.agg(F.max(F.pow(F.col("n").cast("double"),
                            F.lit(alpha - 1.0))).alias("_m"))
    return (cnt.crossJoin(F.broadcast(m))
               .select(strata_col, "n",
                       F.floor(u / F.col("_m") * _BUCKETS).cast("long")
                        .alias("thr")))


def temperature_sample(df: DataFrame, strata_col: str, id_col: str,
                       alpha: float, seed: int = 0) -> DataFrame:
    """Keep each row iff hash_bucket(id) < its stratum's temperature
    threshold. Adds ``thr``; map-only over the corpus (the threshold
    table is strata-sized and broadcast)."""
    thr = temperature_thresholds(df, strata_col, alpha).drop("n")
    return (df.join(F.broadcast(thr), strata_col)
              .filter(hash_bucket(F.col(id_col), seed) < F.col("thr")))
