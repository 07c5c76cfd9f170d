"""Web-page metadata extraction and anchor-text aggregation.

The crawl-side structured-extraction surface a Common-Crawl pipeline
runs right after WARC parsing: pull the title / meta-description /
canonical link / published-time out of raw html, and aggregate incoming
anchor texts per target url (the classic off-page relevance signal —
what OTHER pages call a url is often a better description than its own
title).

No reference equivalent (TinyETL never looks inside payloads; its
transform stage is scalar Lua over typed cells —
/root/reference/src/transformer.rs:171-221). Part of the LLM-data /
web-crawl operator family.

Scale shape:
- ``page_metadata`` is a pure-Catalyst projection (regexp over the html
  column) — fuses into the scan, zero shuffle, zero Python.
- ``anchor_edges`` is the same projection plus ONE explode of the
  per-page anchor list (bounded by anchors-per-page, not corpus size).
- ``top_anchors`` is a two-level aggregation: count by (dst, anchor) —
  map-side combined, so a million identical "click here" rows collapse
  per task before the exchange — then a per-dst rank window over the
  tiny distinct-anchor set. Never a global sort.

All patterns live in the Java-regex ∩ RE2 subset (no backreferences,
no lookaround) so the DuckDB oracle runs the identical expressions;
``(?i)`` is supported by both engines.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

from tinyetl_spark.operators.text import canonical_url, norm_text

_TITLE_PAT = r"(?i)<title[^>]*>([^<]*)</title>"
_DESC_PAT = r"""(?i)<meta\s+name=["']description["']\s+content=["']([^"']*)["']"""
_CANON_PAT = r"""(?i)<link\s+rel=["']canonical["']\s+href=["']([^"'<>\s]+)["']"""
_PUBTIME_PAT = (r"""(?i)<meta\s+property=["']article:published_time["']"""
                r"""\s+content=["']([^"']*)["']""")
# one pattern, two capture groups: href (1) and inner text (2). The two
# regexp_extract_all calls below use the SAME pattern, so the group-1
# and group-2 arrays are always index-aligned for arrays_zip.
_ANCHOR_PAT = r"""(?i)<a\s[^>]*href=["']([^"'<>\s]+)["'][^>]*>([^<]*)</a>"""


def _html_str(col: Column) -> Column:
    """html columns arrive as binary from WARC ingest; cast via UTF-8."""
    return col.cast("string")


def page_metadata(df: DataFrame, url_col: str = "url",
                  html_col: str = "html") -> DataFrame:
    """Attach (title, meta_desc, canonical, published_time) extracted
    from the html column; absent fields are empty string (or null for
    the timestamp). canonical is normalized with canonical_url so it
    joins directly against the table key."""
    h = _html_str(F.col(html_col))
    canon_raw = F.regexp_extract(h, _CANON_PAT, 1)
    return df.select(
        F.col(url_col),
        F.trim(F.regexp_extract(h, _TITLE_PAT, 1)).alias("title"),
        F.trim(F.regexp_extract(h, _DESC_PAT, 1)).alias("meta_desc"),
        F.when(canon_raw == "", F.lit(""))
         .otherwise(canonical_url(canon_raw)).alias("canonical"),
        F.try_to_timestamp(F.regexp_extract(h, _PUBTIME_PAT, 1))
         .alias("published_time"))  # try_: absent field = '' -> null, not an ANSI cast error


def anchor_edges(df: DataFrame, url_col: str = "url",
                 html_col: str = "html") -> DataFrame:
    """One row (src, dst, anchor) per <a href=...>text</a> in each
    page: dst canonicalized, self-links dropped, anchor text normalized
    (lower, collapsed whitespace). Empty anchors survive (an image link
    is still a link — callers filter if they care)."""
    h = _html_str(F.col(html_col))
    hrefs = F.regexp_extract_all(h, F.lit(_ANCHOR_PAT), F.lit(1))
    texts = F.regexp_extract_all(h, F.lit(_ANCHOR_PAT), F.lit(2))
    pairs = F.arrays_zip(hrefs.alias("href"), texts.alias("txt"))
    return (df.select(F.col(url_col).alias("src"),
                      F.explode(pairs).alias("p"))
              .select("src",
                      canonical_url(F.col("p.href")).alias("dst"),
                      norm_text(F.col("p.txt")).alias("anchor"))
              .filter((F.col("dst") != "") & (F.col("dst") != F.col("src"))))


def top_anchors(edges: DataFrame, k: int = 3) -> DataFrame:
    """Per-dst top-k incoming anchor texts by count (count desc, anchor
    asc — deterministic). Output: (dst, anchor, n_links, rank).

    Count-by-(dst, anchor) is map-side combined — the hot "home" /
    "click here" anchors collapse per task before the shuffle — and the
    rank window runs over the per-dst DISTINCT anchor set, which is
    bounded by vocabulary, not by in-degree."""
    counts = (edges.filter(F.col("anchor") != "")
                   .groupBy("dst", "anchor")
                   .agg(F.count(F.lit(1)).alias("n_links")))
    w = Window.partitionBy("dst").orderBy(F.desc("n_links"), F.asc("anchor"))
    return (counts.withColumn("rank", F.row_number().over(w))
                  .filter(F.col("rank") <= k))
