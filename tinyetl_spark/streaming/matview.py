"""Incremental materialized aggregate views over a lake table's CDF.

A 100-TB crawl table is queried through rollups (pages per domain, bytes
per language, ...) far more often than directly; recomputing a rollup
from scratch per refresh is an O(table) job that a 10^10-row table turns
into the pipeline's dominant cost. This module maintains an aggregate
view INCREMENTALLY: each refresh tails the source table's change feed
(``read_changes`` — the engine's "binlog out"), derives the set of
TOUCHED groups, re-aggregates only those groups' current rows, and
MERGEs the resulting group rows into the view — which is itself a
LakeTable maintained by the same epoch-fenced exactly-once
``merge_apply`` as every other table (chained engines, like
``replicate``).

Why touched-group recompute instead of arithmetic +1/-1 deltas: the
merge-on-read change feed is a real binlog — upserts arrive WITHOUT a
preimage, so a consumer cannot know whether an upsert replaced an
existing page (count unchanged) or created one (+1) without keeping
per-url state of its own. Recomputing the touched groups from the source
table is preimage-free and always exact. Reference for the pattern:
Iceberg's incremental refresh by changed partition.

Scale shape: the touched-group set per refresh is tiny relative to the
group universe (a micro-batch touches the domains it saw), so it
BROADCASTs onto the source scan — the refresh plan is scan (column-
pruned to url + aggregated columns) → broadcast-hash semi-join →
partial agg → final agg, no full-table shuffle. The exactly-once cursor
is the view's epoch fence itself: ``batch_id = source snapshot
version``, so a replayed or concurrent refresh fences instead of
double-applying, and ``last_committed_batch`` IS the refresh cursor —
no side-channel state file.
"""

from __future__ import annotations

from collections.abc import Callable

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import types as T

from tinyetl_spark.lake import LakeTable, merge_apply
from tinyetl_spark.lake.merge import MergeStats, last_committed_batch
from tinyetl_spark.schema import PAGES_SCHEMA

#: default grouping: the url's host ("pages per domain")
def domain_of(url: Column) -> Column:
    return F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]+)", 1)


#: default aggregates over the source table's current rows
DEFAULT_AGGS: dict[str, Callable[[], Column]] = {
    "page_count": lambda: F.count(F.lit(1)).cast("long"),
    "text_bytes": lambda: F.coalesce(
        F.sum(F.length("text")), F.lit(0)).cast("long"),
}


def view_schema(agg_names: list[str] | None = None) -> T.StructType:
    """The view table's schema: the pages shape (so the standard merge
    machinery applies unchanged) plus one long column per aggregate."""
    names = list(agg_names or DEFAULT_AGGS)
    fields = list(PAGES_SCHEMA.fields)
    for n in names:
        fields.append(T.StructField(n, T.LongType(), True))
    return T.StructType(fields)


def create_view(spark: SparkSession, path: str,
                agg_names: list[str] | None = None,
                num_buckets: int = 8) -> LakeTable:
    return LakeTable.create(spark, path, view_schema(agg_names),
                            key_col="url", num_buckets=num_buckets)


def refresh_view(spark: SparkSession, src: LakeTable, view: LakeTable,
                 group_of: Callable[[Column], Column] = domain_of,
                 aggs: dict[str, Callable[[], Column]] | None = None,
                 stream_id: str = "matview",
                 broadcast_touched_max: int = 1_000_000,
                 ) -> MergeStats | None:
    """Bring ``view`` up to date with ``src``'s current snapshot.

    Returns the refresh's MergeStats, or None when the view is already
    current. Exactly-once under replay/crash: the merge is fenced on
    ``batch_id = src_version``, so re-running a refresh that already
    committed is a fenced no-op.

    ``broadcast_touched_max`` bounds the driver-side touched-set
    collect used to decide broadcast vs full refresh; a refresh that
    touched more groups than this (a backfill, not a tail) recomputes
    ALL groups instead — same result, better plan at that cardinality.
    """
    aggs = aggs or DEFAULT_AGGS
    src_v = src.current_version()
    last = last_committed_batch(view, stream_id)
    if src_v <= last:
        return None

    gcol = group_of(F.col("url"))
    agg_exprs = [fn().alias(name) for name, fn in aggs.items()]

    full_refresh = last < 0
    touched = None
    if not full_refresh:
        try:
            changed = src.read_changes(last, src_v)
        except ValueError:
            # CDF window expired (snapshot retention) — fall back to a
            # full recompute; still exact, just not incremental
            full_refresh = True
        else:
            touched = (changed.select(gcol.alias("_g"))
                              .where(F.col("_g").isNotNull())
                              .distinct())
            if touched.limit(broadcast_touched_max + 1).count() \
                    > broadcast_touched_max:
                full_refresh = True

    cur = src.read().select("url", "text").withColumn("_g", gcol)
    if not full_refresh:
        cur = cur.join(F.broadcast(touched), "_g")
    stats_df = cur.groupBy("_g").agg(*agg_exprs)

    ts = F.timestamp_micros(F.lit(src_v))
    base_cols = [
        F.col("_g").alias("url"),
        ts.alias("warc_ts"),
        F.lit(None).cast("binary").alias("html"),
        F.lit(None).cast("string").alias("lang"),
        F.lit(int(src_v)).alias("event_seq"),
    ]
    upserts = stats_df.select(*base_cols, F.lit("update").alias("op"),
                              *[F.col(n) for n in aggs])
    batch = upserts
    if not full_refresh:
        # touched groups whose current row-set emptied out: delete the
        # view row (a domain whose last page was deleted must vanish)
        gone = touched.join(stats_df.select("_g"), "_g", "left_anti")
        deletes = gone.select(*base_cols, F.lit("delete").alias("op"),
                              *[F.lit(None).cast("long").alias(n)
                                for n in aggs])
        batch = upserts.unionByName(deletes)

    return merge_apply(view, batch, batch_id=src_v, stream_id=stream_id,
                       extract=False)
