"""BM25 relevance scoring — rank a web-text corpus against a small
query term set, entirely with Catalyst expressions.

This is the retrieval primitive a training-data pipeline uses for
quality-targeted sampling ("keep documents that score high against a
reference query mix") and for building eval retrieval sets. No
reference equivalent (TinyETL has no ranking surface); part of the
LLM-data operator family alongside dedup/quality/similarity.

Scale shape (the 100-TB question):
- the query is a handful of literal terms, so per-document term
  frequencies are pure whole-stage-codegen expressions
  (``split`` + higher-order ``filter``) — zero shuffle, zero explode,
  no inverted index needed for a fixed small query;
- corpus statistics (N, avgdl, per-term document frequency) reduce in
  ONE partial-aggregating pass to a single row, which is then
  broadcast-cross-joined back — the only shuffle is that O(1) global
  aggregate;
- scoring is a fixed-order sum of per-term contributions (float
  determinism for the oracle), with top-k via
  ``TakeOrderedAndProject`` (orderBy + limit), never a full sort.

Formula: Lucene-style BM25 with the +1-smoothed IDF that keeps every
contribution positive:

    idf(t)    = ln(1 + (N - df_t + 0.5) / (df_t + 0.5))
    score(d)  = sum_t idf(t) * tf * (k1+1) / (tf + k1*(1 - b + b*dl/avgdl))
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from .text import norm_text, token_count


def _tf(nt: Column, term: str) -> Column:
    """Occurrences of `term` among the whitespace tokens of normalized
    text — split + higher-order filter, no explode."""
    toks = F.when(nt == "", F.array()).otherwise(F.split(nt, " "))
    return F.size(F.filter(toks, lambda x: x == F.lit(term))).cast("long")


def bm25(df: DataFrame, query_terms: list[str], *, text_col: str = "text",
         id_col: str = "doc_id", k1: float = 1.2, b: float = 0.75,
         top_k: int | None = None) -> DataFrame:
    """Score every document against `query_terms`; return
    (id_col, dl, tf_<term>..., bm25) with bm25 rounded to 6dp.

    With `top_k`, orders by (bm25 desc, id_col) and limits — Spark
    plans this as TakeOrderedAndProject (per-partition heap + merge),
    not a global sort.
    """
    if not query_terms:
        raise ValueError("bm25 needs at least one query term")
    nt = norm_text(F.col(text_col))
    scored = df.select(
        F.col(id_col),
        token_count(F.col(text_col)).alias("dl"),
        *[_tf(nt, t).alias(f"tf_{t}") for t in query_terms],
    )
    # ONE single-row aggregate: N, avgdl, df per term. O(1) shuffle.
    stats = scored.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        *[F.sum((F.col(f"tf_{t}") > 0).cast("long")).alias(f"df_{t}")
          for t in query_terms],
    )
    # Single-row broadcast cross join: every executor gets the stats.
    joined = scored.crossJoin(F.broadcast(stats))

    norm = (F.lit(1.0) - F.lit(b)
            + F.lit(b) * F.col("dl").cast("double") / F.col("avgdl"))
    score = F.lit(0.0)
    for t in query_terms:  # fixed term order => deterministic float sum
        tf = F.col(f"tf_{t}").cast("double")
        idf = F.log(
            F.lit(1.0)
            + (F.col("n_docs").cast("double") - F.col(f"df_{t}") + F.lit(0.5))
            / (F.col(f"df_{t}").cast("double") + F.lit(0.5)))
        score = score + idf * tf * F.lit(k1 + 1.0) / (tf + F.lit(k1) * norm)

    out = joined.select(
        F.col(id_col), F.col("dl"),
        *[F.col(f"tf_{t}") for t in query_terms],
        F.round(score, 6).alias("bm25"),
    )
    if top_k is not None:
        out = out.orderBy(F.desc("bm25"), F.col(id_col)).limit(top_k)
    return out
