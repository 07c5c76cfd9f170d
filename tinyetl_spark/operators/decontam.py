"""Benchmark decontamination: drop training docs sharing any word
n-gram with an evaluation set.

The standard pre-training hygiene step (GPT-3 App. C used 13-gram
overlap; The Pile, Llama and successors the same shape): every doc
whose normalized text contains ANY n-gram that also appears in the
benchmark corpus is flagged and removed.

Scale shape (the part that matters at 100 TB):

- n-gram GENERATION is map-side Catalyst (sequence + slice + md5 over
  the token array) — no Python, no shuffle, fused into the scan.
- the benchmark side is tiny relative to the corpus (benchmarks are
  10^4-10^6 examples vs 10^10 docs), so its distinct gram-hash set is
  BROADCAST and the containment test is a broadcast LEFT SEMI join on
  the exploded corpus grams — zero corpus shuffle; the only shuffle is
  the final distinct over flagged doc ids, whose cardinality is
  bounded by the contamination rate, not the corpus.
- with ``broadcast_bench=False`` the explicit hint is dropped and AQE
  picks the strategy — the escape hatch for a benchmark too large to
  broadcast (then prefer a bloom-filter pre-pass; see PLANS.md).

No reference equivalent; part of the training-data surface
(SURVEY.md §2.2). Hashing is md5 hex so the DuckDB oracle reproduces
every gram bit-for-bit.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from .text import norm_text


def ngram_hashes(col: Column, n: int) -> Column:
    """array<string> of md5(space-joined word n-gram) over the
    normalized text. Docs shorter than n words yield an empty array.
    Pure Catalyst (sequence/transform/slice), whole-stage codegen."""
    toks = F.split(norm_text(col), " ")
    idx = F.sequence(F.lit(1), F.size(toks) - (n - 1))
    # sequence(1, k) runs DESCENDING for k < 1, so short docs need an
    # explicit empty guard rather than a greatest() clamp
    return F.when(
        F.size(toks) >= n,
        F.transform(idx,
                    lambda i: F.md5(F.array_join(F.slice(toks, i, n), " ")))
    ).otherwise(F.array().cast("array<string>"))


def bench_gram_set(bench: DataFrame, text_col: str = "text",
                   n: int = 13) -> DataFrame:
    """Distinct n-gram hashes of the benchmark corpus — the small side."""
    return (bench.select(F.explode(ngram_hashes(F.col(text_col), n))
                          .alias("g"))
                 .distinct())


def contaminated_ids(docs: DataFrame, bench: DataFrame,
                     text_col: str = "text", id_col: str = "doc_id",
                     n: int = 13, broadcast_bench: bool = True) -> DataFrame:
    """Distinct ids of docs sharing >= 1 n-gram with the benchmark."""
    grams = bench_gram_set(bench, text_col, n)
    if broadcast_bench:
        grams = F.broadcast(grams)
    corpus = docs.select(F.col(id_col),
                         F.explode(ngram_hashes(F.col(text_col), n))
                          .alias("g"))
    return corpus.join(grams, "g", "left_semi").select(id_col).distinct()


def mark_contaminated(docs: DataFrame, bench: DataFrame,
                      text_col: str = "text", id_col: str = "doc_id",
                      n: int = 13,
                      broadcast_bench: bool = True) -> DataFrame:
    """docs + boolean ``contaminated``. The hit set is small (bounded
    by contamination rate) so IT is broadcast back onto the corpus —
    the corpus itself never shuffles."""
    hits = contaminated_ids(docs, bench, text_col, id_col, n,
                            broadcast_bench)
    hits = F.broadcast(hits.withColumn("_hit", F.lit(True)))
    return (docs.join(hits, id_col, "left_outer")
                .withColumn("contaminated",
                            F.coalesce(F.col("_hit"), F.lit(False)))
                .drop("_hit"))


def decontaminate(docs: DataFrame, bench: DataFrame,
                  text_col: str = "text", id_col: str = "doc_id",
                  n: int = 13, broadcast_bench: bool = True) -> DataFrame:
    """The clean corpus: docs minus every contaminated one (left anti
    against the broadcast hit set)."""
    hits = F.broadcast(contaminated_ids(docs, bench, text_col, id_col, n,
                                        broadcast_bench))
    return docs.join(hits, id_col, "left_anti")


# ---------------------------------------------------------------------------
# Semantic decontamination: embedding-space eval-set leakage.
#
# n-gram decontamination misses paraphrased leakage (the benchmark
# question re-worded); the standard complement (e.g. the Llama-era
# "semantic dedup vs eval" hygiene pass) flags every corpus doc whose
# embedding is within cosine τ of ANY benchmark embedding.
#
# Scale shape: the benchmark is tiny (10^4-10^6 rows) next to the corpus
# (10^10), so the WHOLE benchmark packs into ONE broadcast row of
# (id, vec) structs and the max-cosine-vs-bench per corpus doc is a pure
# higher-order projection fused into the corpus scan — zero shuffle,
# zero explode, no join fan-out, linear in the corpus.  Cosines use the
# same fixed-order double fold as operators/similarity.py so the DuckDB
# oracle reproduces every value bit-for-bit.
# ---------------------------------------------------------------------------

from pyspark.sql import functions as hof  # noqa: E402  (HOF aliases)

from .similarity import cosine  # noqa: E402


def semantic_contaminated(corpus: DataFrame, bench: DataFrame,
                          threshold: float,
                          id_col: str = "vec_id",
                          vec_col: str = "embedding") -> DataFrame:
    """corpus + (``max_cos``, ``nearest_bench_id``, ``contaminated``):
    the max cosine against the benchmark set (self-pairs excluded, so a
    benchmark drawn from the corpus doesn't trivially flag itself),
    the bench id achieving it (smallest id on exact ties), and the
    ``max_cos >= threshold`` flag. Map-only at any corpus size."""
    packed = bench.agg(
        F.array_sort(
            F.collect_list(F.struct(F.col(id_col).alias("bid"),
                                    F.col(vec_col).alias("bvec"))))
         .alias("_bench"))
    j = corpus.crossJoin(F.broadcast(packed))
    others = F.filter(F.col("_bench"),
                      lambda b: b["bid"] != F.col(id_col))
    # struct max = (max cos, then max(-bid) = min bid): deterministic
    # argmax without an explode or a window.
    best = F.array_max(hof.transform(
        others,
        lambda b: F.struct(cosine(F.col(vec_col), b["bvec"]).alias("cos"),
                           (-b["bid"]).alias("nbid"))))
    return (j.withColumn("max_cos", best["cos"])
             .withColumn("nearest_bench_id", -best["nbid"])
             .withColumn("contaminated",
                         F.coalesce(F.col("max_cos") >= F.lit(threshold),
                                    F.lit(False)))
             .drop("_bench"))
