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


def lm_score(df: DataFrame, *, text_col: str = "text", id_col: str = "doc_id",
             vocab_k: int = 50_000, scale: int = 10_000) -> DataFrame:
    """CCNet-style unigram language-model quality scoring: train a
    Laplace-smoothed unigram LM on the corpus itself (top-`vocab_k`
    tokens; everything else is the OOV event) and score every document
    by its mean per-token surprisal in nats — low = close to the corpus
    LM (keep), high = gibberish/outlier (drop). Output:
    (id_col, dl, mean_nll, oov_frac), empty docs scoring (0, 0.0, 0.0).

    Scale shape:
    - pass 1 (train): explode -> count by token is ONE map-side-combined
      shuffle; the top-k vocab cut is TakeOrderedAndProject (count desc,
      token asc — deterministic tie-break); corpus totals are an O(1)
      scalar agg. The k-row LM is then broadcast.
    - pass 2 (score): explode stays in the map stage, broadcast-hash
      join against the LM, then ONE partial-aggregated shuffle of
      O(docs) rows. Nothing quadratic, no Python.

    Float determinism (the oracle contract): per-token surprisal is
    pinned to fixed-point — ``round(-ln(p) * scale)`` as a LONG — so
    the per-doc reduction is EXACT integer arithmetic, immune to
    partition/visit order on both engines; floats only reappear at the
    output boundary (mean = sum / scale / dl, rounded 6dp).

    p(token) = (c + 1) / (T + V + 1) with c its corpus count (0 if
    out-of-vocab), T total corpus tokens, V vocab size.
    """
    nt = norm_text(F.col(text_col))
    toks = (df.select(F.col(id_col), nt.alias("_nt"))
              .filter(F.col("_nt") != "")
              .select(F.col(id_col), F.explode(F.split("_nt", " ")).alias("token")))
    counts = toks.groupBy("token").agg(F.count(F.lit(1)).alias("c"))
    vocab = counts.orderBy(F.desc("c"), F.asc("token")).limit(vocab_k)
    # O(1) driver scalars: total corpus tokens + retained vocab size
    totals = counts.agg(F.sum("c"), F.count(F.lit(1))).collect()[0]
    t_total = int(totals[0] or 0)
    v_size = min(int(totals[1] or 0), vocab_k)
    denom = float(t_total + v_size + 1)

    c = F.coalesce(F.col("c"), F.lit(0)).cast("double")
    s_fp = F.round(-F.log((c + F.lit(1.0)) / F.lit(denom)) * F.lit(scale), 0).cast("long")
    scored = (toks.join(F.broadcast(vocab), "token", "left")
                  .select(F.col(id_col), s_fp.alias("s_fp"),
                          (F.col("c").isNull()).cast("long").alias("oov")))
    agg = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("dl"),
        F.sum("s_fp").alias("s"),
        F.sum("oov").alias("o"))
    return (df.select(id_col).join(agg, id_col, "left")
              .select(F.col(id_col),
                      F.coalesce(F.col("dl"), F.lit(0)).alias("dl"),
                      F.coalesce(
                          F.round(F.col("s") / F.lit(float(scale)) / F.col("dl"), 6),
                          F.lit(0.0)).alias("mean_nll"),
                      F.coalesce(
                          F.round(F.col("o").cast("double") / F.col("dl"), 6),
                          F.lit(0.0)).alias("oov_frac")))


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
