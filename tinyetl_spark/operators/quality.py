"""Gopher/C4-style document-quality rules for web-text curation.

The standard pre-training filter stack (Rae et al. 2021 "Scaling
Language Models: ... Gopher", App. A; Raffel et al. 2020 "C4"): reject
documents by word-count bounds, mean word length, symbol-to-word
ratio, alpha-word fraction, stopword presence, bullet/ellipsis line
structure, and intra-document repetition (duplicate-line fraction by
count and by character mass).

Everything here is a pure Catalyst expression over ONE row — no
shuffle, no UDF, whole-stage codegen end to end — so the filter stack
runs at scan speed on 100 TB and is trivially fused with predicate
pushdown when used as an actual filter. Each metric is deliberately
reproducible in ANSI-ish SQL (DuckDB list lambdas) so the oracle can
verify values bit-for-bit; fractional outputs are rounded to 6dp at
the boundary like the rest of the text surface (operators/text.py).

No reference equivalent (TinyETL has no text analytics); this is part
of the training-data surface the build plan adds on top
(SURVEY.md §2.2).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from .text import STOPWORDS, marker_hits, norm_text

# Gopher App. A defaults (word bounds scaled down so small synthetic
# corpora exercise BOTH outcomes of the rule; callers override).
DEFAULTS = {
    "min_words": 50,
    "max_words": 100_000,
    "min_mean_word_len": 3.0,
    "max_mean_word_len": 10.0,
    "max_symbol_word_ratio": 0.1,
    "min_alpha_word_frac": 0.8,
    "min_stop_hits": 2,
    "max_bullet_line_frac": 0.9,
    "max_ellipsis_line_frac": 0.3,
    "max_dup_line_frac": 0.3,
    "max_dup_line_char_frac": 0.2,
}


def _words(col: Column) -> Column:
    n = norm_text(col)
    return F.when(n == "", F.array().cast("array<string>")) \
            .otherwise(F.split(n, " "))


def _lines(col: Column) -> Column:
    """Non-empty trimmed lines of the RAW text (norm_text collapses
    newlines, so line-structure rules must see the original)."""
    return F.filter(F.transform(F.split(col, "\n"),
                                lambda x: F.trim(x)),
                    lambda x: x != F.lit(""))


def word_count(col: Column) -> Column:
    return F.size(_words(col)).cast("long")


def mean_word_len(col: Column) -> Column:
    """Mean characters per word; 0.0 for empty docs."""
    n = norm_text(col)
    wc = word_count(col)
    chars = F.length(F.replace(n, F.lit(" "), F.lit("")))
    return F.round(chars.cast("double") / F.greatest(wc, F.lit(1)), 6)


def symbol_word_ratio(col: Column) -> Column:
    """(# of '#' + # of '...' occurrences) / words — the Gopher "symbol
    to word ratio" proxy for markup/boilerplate."""
    hashes = F.length(col) - F.length(F.replace(col, F.lit("#"), F.lit("")))
    dots = F.floor((F.length(col)
                    - F.length(F.replace(col, F.lit("..."), F.lit("")))) / 3)
    wc = word_count(col)
    return F.round((hashes + dots).cast("double")
                   / F.greatest(wc, F.lit(1)), 6)


def alpha_word_frac(col: Column) -> Column:
    """Fraction of words containing at least one alphabetic char."""
    ws = _words(col)
    alpha = F.size(F.filter(ws, lambda w: w.rlike("[a-z]")))
    return F.round(alpha.cast("double")
                   / F.greatest(F.size(ws), F.lit(1)), 6)


def bullet_line_frac(col: Column) -> Column:
    ls = _lines(col)
    b = F.size(F.filter(ls, lambda x: x.rlike("^[-*•]")))
    return F.round(b.cast("double") / F.greatest(F.size(ls), F.lit(1)), 6)


def ellipsis_line_frac(col: Column) -> Column:
    ls = _lines(col)
    e = F.size(F.filter(ls, lambda x: x.rlike("(\\.\\.\\.|…)$")))
    return F.round(e.cast("double") / F.greatest(F.size(ls), F.lit(1)), 6)


def dup_line_frac(col: Column) -> Column:
    """1 - distinct/total over non-empty trimmed lines."""
    ls = _lines(col)
    return F.when(F.size(ls) == 0, F.lit(0.0)).otherwise(
        F.round(F.lit(1.0) - F.size(F.array_distinct(ls)).cast("double")
                / F.size(ls), 6))


def dup_line_char_frac(col: Column) -> Column:
    """Character mass of repeated lines / total line character mass —
    catches one huge duplicated block that dup_line_frac undercounts."""
    ls = _lines(col)
    tot = F.aggregate(ls, F.lit(0).cast("long"),
                      lambda acc, x: acc + F.length(x))
    dis = F.aggregate(F.array_distinct(ls), F.lit(0).cast("long"),
                      lambda acc, x: acc + F.length(x))
    return F.round((tot - dis).cast("double")
                   / F.greatest(tot, F.lit(1)), 6)


def dedup_lines(col: Column) -> Column:
    """Repetition removal: drop repeated lines keeping the FIRST
    occurrence (array_distinct preserves first-occurrence order)."""
    return F.array_join(F.array_distinct(_lines(col)), "\n")


def _grams_with_mult(col: Column, n: int) -> Column:
    """Word n-grams WITH multiplicity (unlike dedup.shingles, which
    dedups) — repetition metrics need every occurrence."""
    toks = F.split(norm_text(col), " ")
    idx = F.sequence(F.lit(1), F.size(toks) - (n - 1))
    return F.when(
        F.size(toks) >= n,
        F.transform(idx, lambda i: F.array_join(F.slice(toks, i, n), " "))
    ).otherwise(F.array().cast("array<string>"))


def repetition_metrics(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", top_n: int = 2,
                       dup_n: int = 5) -> DataFrame:
    """Gopher's inter-n-gram repetition signals, per document:

    - ``top_ngram_char_frac``: characters covered by every occurrence of
      the single most frequent ``top_n``-gram (count × gram length,
      spaces included) over the normalized text length;
    - ``dup_ngram_char_frac``: the same mass summed over ALL
      ``dup_n``-grams that occur more than once (overlapping
      occurrences each count, so the ratio may exceed 1 on
      pathologically repetitive docs — it is a reject signal, not a
      probability).

    Unlike the single-row rules in :func:`gopher_metrics`, the n-gram
    frequency table needs a per-(doc, gram) aggregation: explode →
    partial-agg count (map-side combine) → per-doc max/sum. Two keyed
    shuffles whose cardinality is O(total grams), the standard shape of
    every Gopher-style repetition pass at crawl scale. Rounded to 6dp;
    reproducible in DuckDB (oracle row text_repetition_ngrams).
    """
    c = F.col(text_col)
    base = df.select(F.col(id_col),
                     F.greatest(F.length(norm_text(c)), F.lit(1))
                      .alias("_total"),
                     _grams_with_mult(c, top_n).alias("_g_top"),
                     _grams_with_mult(c, dup_n).alias("_g_dup"))
    counts_top = (base.select(id_col, F.explode("_g_top").alias("g"))
                      .groupBy(id_col, "g")
                      .agg(F.count(F.lit(1)).alias("cnt"))
                      .groupBy(id_col)
                      .agg(F.max(F.col("cnt") * F.length("g"))
                            .alias("_top_mass")))
    counts_dup = (base.select(id_col, F.explode("_g_dup").alias("g"))
                      .groupBy(id_col, "g")
                      .agg(F.count(F.lit(1)).alias("cnt"))
                      .filter(F.col("cnt") >= 2)
                      .groupBy(id_col)
                      .agg(F.sum(F.col("cnt") * F.length("g"))
                            .alias("_dup_mass")))
    return (base.select(id_col, "_total")
                .join(counts_top, id_col, "left_outer")
                .join(counts_dup, id_col, "left_outer")
                .select(
                    F.col(id_col),
                    F.round(F.coalesce(F.col("_top_mass"), F.lit(0))
                            .cast("double") / F.col("_total"), 6)
                     .alias("top_ngram_char_frac"),
                    F.round(F.coalesce(F.col("_dup_mass"), F.lit(0))
                            .cast("double") / F.col("_total"), 6)
                     .alias("dup_ngram_char_frac")))


def gopher_metrics(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach every quality metric in one pass (one projection node)."""
    c = F.col(text_col)
    return (df.withColumn("n_words", word_count(c))
              .withColumn("mean_word_len", mean_word_len(c))
              .withColumn("symbol_word_ratio", symbol_word_ratio(c))
              .withColumn("alpha_word_frac", alpha_word_frac(c))
              .withColumn("stop_hits", marker_hits(c, STOPWORDS))
              .withColumn("bullet_line_frac", bullet_line_frac(c))
              .withColumn("ellipsis_line_frac", ellipsis_line_frac(c))
              .withColumn("dup_line_frac", dup_line_frac(c))
              .withColumn("dup_line_char_frac", dup_line_char_frac(c)))


def gopher_keep(df: DataFrame, text_col: str = "text",
                **overrides) -> DataFrame:
    """Metrics + one boolean per rule + the final ``keep`` flag.

    Still one map-side projection: used as ``.filter("keep")`` upstream
    of heavier stages (dedup, embedding) it removes rejected docs
    before any shuffle touches them.
    """
    p = {**DEFAULTS, **overrides}
    out = gopher_metrics(df, text_col)
    rules = {
        "ok_words": (F.col("n_words") >= p["min_words"])
                    & (F.col("n_words") <= p["max_words"]),
        "ok_mean_word_len": (F.col("mean_word_len") >= p["min_mean_word_len"])
                            & (F.col("mean_word_len") <= p["max_mean_word_len"]),
        "ok_symbol": F.col("symbol_word_ratio") <= p["max_symbol_word_ratio"],
        "ok_alpha": F.col("alpha_word_frac") >= p["min_alpha_word_frac"],
        "ok_stop": F.col("stop_hits") >= p["min_stop_hits"],
        "ok_bullet": F.col("bullet_line_frac") <= p["max_bullet_line_frac"],
        "ok_ellipsis": F.col("ellipsis_line_frac")
                       <= p["max_ellipsis_line_frac"],
        "ok_dup_lines": F.col("dup_line_frac") <= p["max_dup_line_frac"],
        "ok_dup_chars": F.col("dup_line_char_frac")
                        <= p["max_dup_line_char_frac"],
    }
    keep = F.lit(True)
    for name, cond in rules.items():
        out = out.withColumn(name, cond)
        keep = keep & cond
    return out.withColumn("keep", keep)


# ---------------------------------------------------------------------------
# Host-level rollup — the crawl-curation signal ABOVE the document:
# site-level spam decisions (drop the whole host) are cheaper and more
# robust than per-doc ones when a domain is mostly boilerplate mirrors.
# ONE map-side-combined groupBy(host): all aggregates are algebraic
# (count / sum / approx-free distinct via exact count of md5s), so a
# 100-TB corpus reduces to one row per host (~10^7 rows) in a single
# shuffle. A mega-host (wikipedia-scale) is still just one reduce key
# whose partial aggregates combined upstream — no skew pathology.

def host_rollup(df: DataFrame, url_col: str = "url",
                text_col: str = "text") -> DataFrame:
    """Per-host curation stats: ``n_docs``, ``n_unique`` (distinct text
    fingerprints), ``dup_frac`` (6dp), ``avg_tokens`` (6dp),
    ``avg_quality`` (6dp mean of the document quality score).

    Intra-host duplication (mirrored/templated pages under one domain)
    is the strongest host-spam signal; pair with a threshold filter to
    drop hosts wholesale before any per-doc work.
    """
    from .text import fingerprint, quality_score, token_count
    from tinyetl_spark.operators.normalize import url_host
    t = F.col(text_col)
    per_doc = df.select(
        url_host(F.col(url_col)).alias("host"),
        fingerprint(t).alias("_fp"),
        token_count(t).alias("_tok"),
        quality_score(t).alias("_q"))
    return (per_doc.groupBy("host")
            .agg(F.count("*").alias("n_docs"),
                 F.countDistinct("_fp").alias("n_unique"),
                 F.round(F.lit(1.0) - F.countDistinct("_fp")
                         / F.count("*").cast("double"), 6)
                  .alias("dup_frac"),
                 F.round(F.avg(F.col("_tok").cast("double")), 6)
                  .alias("avg_tokens"),
                 F.round(F.avg("_q"), 6).alias("avg_quality")))


def boilerplate_ngrams(df: DataFrame, text_col: str = "text",
                       n: int = 3, min_df: int = 2,
                       top_k: int = 100) -> DataFrame:
    """Corpus-level boilerplate mining: word n-grams ranked by DOCUMENT
    frequency (how many distinct docs contain the gram at least once).
    The grams that top this list ("all rights reserved", "click here
    to") are what line/gram scrubbers get configured with.

    Scale shape: per-doc grams are DISTINCT-ed inside the projection
    (array_distinct — a gram repeated within one doc counts once)
    BEFORE the explode, so the shuffle carries at most one row per
    (doc, gram); the groupBy(gram) count map-side-combines, and top-k
    is a TakeOrdered, never a global sort. Ties rank deterministically
    (df desc, gram asc).
    """
    nt = norm_text(F.col(text_col))
    words = F.filter(F.split(nt, " "), lambda w: w != "")
    grams = F.array_distinct(F.filter(
        F.transform(
            words,
            lambda w, i: F.when(
                i <= F.size(words) - n,
                F.array_join(F.slice(words, i + 1, n), " "))),
        lambda g: g.isNotNull()))
    return (df.select(F.explode(grams).alias("gram"))
              .groupBy("gram")
              .agg(F.count("*").alias("df"))
              .filter(F.col("df") >= min_df)
              .orderBy(F.desc("df"), F.asc("gram"))
              .limit(top_k))
