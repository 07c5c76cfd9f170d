"""Web-graph operators: link extraction and PageRank.

No reference equivalent (TinyETL has no graph surface); this is the
crawl-side of the training-data pipeline — outlink extraction feeds URL
frontiers and site-level spam scoring, PageRank-style centrality is a
standard quality prior (a page linked by many ranked pages is likelier
to be worth keeping).

Scale shape:
- ``extract_links`` is a pure-Catalyst projection (regexp over the html
  column + canonical-url normalization) followed by one explode — no
  Python, no shuffle beyond what the caller does with the edges.
- ``pagerank`` is the textbook distributed iteration: each step is ONE
  shuffle join (ranks ⋈ edges on src) and ONE aggregation (sum by dst)
  — both hash-partitioned on the same key family, map-side combined.
  Ranks are persisted per iteration and the previous iteration is
  unpersisted, so lineage and memory stay O(1) in the iteration count;
  dangling-node mass is redistributed uniformly (one tiny scalar agg
  per step — O(1) rows to the driver, not a collect of data).
- Each iteration's ranks are rounded to 9 dp: float-sum partition-order
  jitter cannot compound across iterations, and the fixed-round rule is
  what lets an external engine (the DuckDB oracle) replay the identical
  arithmetic.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from tinyetl_spark.operators.dedup import register_cache
from tinyetl_spark.operators.text import canonical_url

# href extraction: double- or single-quoted attribute value, the
# Java-regex ∩ RE2 subset (no backreferences).
_HREF_PAT = r"""href=["']([^"'<>\s]+)["']"""


def extract_links(df: DataFrame, url_col: str = "url",
                  html_col: str = "html") -> DataFrame:
    """One edge row (src, dst) per href in the page html; dst is
    canonicalized (tracking params dropped, ports/fragments stripped)
    and self-links are removed. ``html_col`` may be string or binary
    (cast via UTF-8)."""
    html = F.col(html_col).cast("string")
    hrefs = F.regexp_extract_all(html, F.lit(_HREF_PAT), F.lit(1))
    return (df.select(F.col(url_col).alias("src"),
                      F.explode(hrefs).alias("_raw"))
              .select("src", canonical_url(F.col("_raw")).alias("dst"))
              .filter((F.col("dst") != "") & (F.col("dst") != F.col("src"))))


def pagerank(edges: DataFrame, iters: int = 10,
             damping: float = 0.85) -> DataFrame:
    """PageRank over an edge list (src, dst). Returns (url, rank) for
    every node that appears as src or dst; ranks sum to ~1.

    Deterministic: rank state is rounded to 9 dp after every iteration
    (see module docstring) and dangling mass is redistributed uniformly.
    """
    nodes = (edges.select(F.col("src").alias("url"))
                  .union(edges.select(F.col("dst").alias("url")))
                  .distinct())
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    out_deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    ranks = nodes.withColumn("rank", F.lit(1.0 / n)).persist()
    ranks.count()
    for _ in range(iters):
        linked = ranks.join(out_deg, ranks.url == out_deg.src, "left")
        # dangling mass: nodes with no out-links leak their rank;
        # redistribute uniformly (scalar to the driver, O(1) rows)
        dangling = (linked.filter(F.col("deg").isNull())
                          .agg(F.coalesce(F.sum("rank"), F.lit(0.0)))
                          .collect()[0][0])
        contribs = (ranks.join(edges, ranks.url == edges.src)
                         .join(out_deg, "src")
                         .select(F.col("dst").alias("url"),
                                 (F.col("rank") / F.col("deg"))
                                 .alias("c")))
        agg = contribs.groupBy("url").agg(F.sum("c").alias("in_mass"))
        base = (1.0 - damping) / n + damping * dangling / n
        new = (nodes.join(agg, "url", "left")
                    .select("url",
                            F.round(F.lit(base)
                                    + F.lit(damping)
                                    * F.coalesce("in_mass", F.lit(0.0)),
                                    9).alias("rank"))
                    .persist())
        new.count()
        ranks.unpersist()
        ranks = new
    # the returned frame stays persisted (callers reuse it across
    # actions); register it so release_caches() frees it on a
    # long-lived driver rather than pinning executor memory forever
    return register_cache(ranks)
