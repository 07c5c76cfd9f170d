"""Deterministic synthetic Common-Crawl-style pages + CDC change events.

Everything is generated distributed (``spark.range`` → column expressions),
never driver-side: the same (seed, n) always yields the same rows regardless
of partitioning, because every column is a pure function of the row id.

Input-table shape per BASELINE.json input_hint:
    (url:string, warc_ts:timestamp, html:binary, text:string, lang:string)

Change-event shape (the binlog/WAL-tail the streaming source emits):
    (event_seq:long, url:string, warc_ts:timestamp, op:string,
     html:binary, lang:string)

Skew: a configurable fraction of events hit a single hot domain
(``hot.example.com``) to exercise salting / AQE skew handling — mirrors
hot-domain skew in real crawl CDC feeds.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

LANGS = ["en", "de", "fr", "es", "pt", "it", "nl", "pl"]
DOMAINS = ["alpha.example.org", "beta.example.net", "gamma.example.io",
           "delta.example.dev", "epsilon.example.co"]
HOT_DOMAIN = "hot.example.com"

# Base epoch for warc_ts: 2025-01-01T00:00:00Z, expressed in seconds.
BASE_EPOCH = 1735689600


def _h(col, salt: int):
    """Deterministic per-row pseudo-random non-negative long."""
    return F.abs(F.xxhash64(col, F.lit(salt)))


def _url_expr(url_id, hot_fraction: float):
    """url as a pure function of url_id; first ``hot_fraction`` of id space
    lands on the hot domain (contiguous so skew is by-key, not by-partition)."""
    n_dom = len(DOMAINS)
    dom = F.when(
        F.pmod(_h(url_id, 101), 1000) < int(hot_fraction * 1000), F.lit(HOT_DOMAIN)
    ).otherwise(
        F.element_at(F.array(*[F.lit(d) for d in DOMAINS]),
                     (F.pmod(_h(url_id, 102), n_dom) + 1).cast("int"))
    )
    return F.concat(F.lit("https://"), dom, F.lit("/page/"), url_id.cast("string"))


def _html_expr(url, version):
    """Deterministic HTML body for (url, version) — built JVM-side.

    Contains title, script/style blocks (which extraction must drop),
    entities, and repeated paragraphs so documents have realistic size.
    """
    para = F.concat(
        F.lit("<p>Content of "), url, F.lit(" rev "), version.cast("string"),
        F.lit(" — token_"), F.pmod(_h(url, 7) + version, 99991).cast("string"),
        F.lit(" lorem &amp; ipsum &lt;dolor&gt; sit amet.</p>\n"),
    )
    body = F.concat(
        F.lit("<html><head><title>Page "), url, F.lit("</title>"),
        F.lit("<style>body{color:#000}</style>"),
        F.lit("<script>var x=1;</script></head><body>\n"),
        F.lit("<h1>Revision "), version.cast("string"), F.lit("</h1>\n"),
        F.concat_ws("", F.array_repeat(para, 8)),
        F.lit("</body></html>"),
    )
    return F.encode(body, "UTF-8")


def _lang_expr(url_id):
    return F.element_at(F.array(*[F.lit(x) for x in LANGS]),
                        (F.pmod(_h(url_id, 103), len(LANGS)) + 1).cast("int"))


def change_events(
    spark: SparkSession,
    n_events: int,
    n_urls: int,
    seed: int = 42,
    hot_fraction: float = 0.05,
    delete_pct: int = 5,
    out_of_order_pct: int = 10,
    num_partitions: int | None = None,
) -> DataFrame:
    """Deterministic CDC stream: event_seq is a global total order (the WAL
    position); warc_ts mostly advances with event_seq but ``out_of_order_pct``
    of events carry an older timestamp (late data)."""
    rng = spark.range(0, n_events, 1, num_partitions or spark.sparkContext.defaultParallelism)
    seq = F.col("id")
    url_id = F.pmod(_h(seq, seed), n_urls)
    url = _url_expr(url_id, hot_fraction)
    # timestamp: base + seq seconds, minus up to 1h for the late slice
    late = F.pmod(_h(seq, seed + 1), 100) < out_of_order_pct
    ts_secs = (
        F.lit(BASE_EPOCH) + seq
        - F.when(late, F.pmod(_h(seq, seed + 2), 3600)).otherwise(F.lit(0))
    )
    op = F.when(F.pmod(_h(seq, seed + 3), 100) < delete_pct, F.lit("delete")).otherwise(
        F.when(F.pmod(_h(seq, seed + 4), 100) < 40, F.lit("insert")).otherwise(F.lit("update"))
    )
    version = F.pmod(_h(seq, seed + 5), 1000)
    return rng.select(
        seq.alias("event_seq"),
        url.alias("url"),
        F.timestamp_seconds(ts_secs).alias("warc_ts"),
        op.alias("op"),
        F.when(op == "delete", F.lit(None).cast("binary"))
         .otherwise(_html_expr(url, version)).alias("html"),
        _lang_expr(url_id).alias("lang"),
    )


def pages(spark: SparkSession, n_urls: int, seed: int = 42,
          hot_fraction: float = 0.05) -> DataFrame:
    """A base pages table (insert-only snapshot) in input_hint shape."""
    rng = spark.range(0, n_urls)
    url_id = F.col("id")
    url = _url_expr(url_id, hot_fraction)
    return rng.select(
        url.alias("url"),
        F.timestamp_seconds(F.lit(BASE_EPOCH) + url_id).alias("warc_ts"),
        _html_expr(url, F.lit(0)).alias("html"),
        F.lit(None).cast("string").alias("text"),
        _lang_expr(url_id).alias("lang"),
    )
