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
