"""The streaming CDC pipeline: event-log tail → dedup → MERGE-apply.

Wiring::

    stream_event_log(...)                    # checkpointed offsets
      [.withWatermark("warc_ts", ...)        # optional in-stream guard
       .dropDuplicatesWithinWatermark(...)]
      .writeStream.foreachBatch(merge batch) # idempotent, epoch-fenced
      .option("checkpointLocation", ...)
      .trigger(availableNow=True | processingTime=...)

Exactly-once story (north rule):
- offsets: the file source checkpoint pins which log segments belong to
  each batchId; a restarted query replays the same slice.
- sink: ``merge_apply`` is idempotent (LWW on (warc_ts, event_seq)) AND
  epoch-fenced (snapshot property ``fence.<stream_id>`` = last committed
  batchId) — a replayed batch either fences out or re-merges to the same
  state. One lake snapshot per micro-batch = Iceberg's
  snapshot-per-commit.
- stream incarnation: ``stream_id`` is minted once per checkpoint dir and
  stored there. Wiping the checkpoint starts a new incarnation whose
  batchIds restart at 0 — the new id gets a fresh fence namespace, and
  full replay reconverges via idempotency instead of being wrongly fenced.

The watermark guard (``dedup_within_watermark=...``) drops exact
(url, event_seq) duplicates *in-stream* before they reach the merge —
cheap state-store dedup for at-least-once upstream agents. It is an
optimization, not a correctness requirement: merge is idempotent anyway.
"""

from __future__ import annotations

import os
import uuid
from dataclasses import dataclass, field
from typing import Any

import pyspark.sql.functions as F
from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQuery

from tinyetl_spark.lake import LakeTable, merge_apply
from tinyetl_spark.lake.merge import MergeStats
from tinyetl_spark.sources.eventlog import stream_event_log

STREAM_ID_FILE = "tinyetl_stream_id"


def _stream_incarnation(checkpoint_dir: str) -> str:
    os.makedirs(checkpoint_dir, exist_ok=True)
    p = os.path.join(checkpoint_dir, STREAM_ID_FILE)
    if os.path.exists(p):
        with open(p) as f:
            return f.read().strip()
    sid = uuid.uuid4().hex[:16]
    tmp = p + ".tmp"
    with open(tmp, "w") as f:
        f.write(sid)
    os.replace(tmp, p)
    return sid


@dataclass
class PipelineRun:
    query: StreamingQuery
    stream_id: str
    stats: list[MergeStats] = field(default_factory=list)

    def await_termination(self, timeout: int | None = None):
        return self.query.awaitTermination(timeout)


def run_pipeline(
    spark: SparkSession,
    log_dir: str,
    table_path: str,
    checkpoint_dir: str,
    trigger_available_now: bool = True,
    processing_time: str | None = None,
    max_files_per_trigger: int | None = None,
    extract: bool = True,
    dedup_within_watermark: str | None = None,
    query_name: str = "tinyetl-cdc",
    transform_fn=None,
    merge_mode: str = "auto",
    auto_compact_debt: int | None = 32,
    expire_every: int | None = None,
    expire_keep_last: int = 10,
    quarantine_dir: str | None = None,
    max_html_bytes: int | None = None,
    auto_rescale_rows_per_bucket: int | None = None,
    auto_rescale_max_buckets: int = 1 << 16,
    matview_dirs: list[str] | None = None,
    matview_every: int = 1,
    source_format: str = "eventlog",
) -> PipelineRun:
    """Start the CDC stream into an existing LakeTable at ``table_path``.

    ``source_format`` selects the landing-zone dialect: ``eventlog``
    (native parquet segments), ``debezium``, ``maxwell`` or ``canal``
    (json-lines envelopes via sources/debezium.py — same checkpointed
    file-source offsets, so resume/replay semantics are identical).

    Maintenance runs inline on a cadence so long streams stay healthy
    without an operator:

    - ``auto_compact_debt``: when the table's merge-on-read delta-file
      count crosses this threshold after a batch, ``compact_deltas()``
      fires (O(delta-touched buckets) rewrite) — read amplification stays
      bounded instead of growing with every MOR batch. None disables.
    - ``expire_every``/``expire_keep_last``: every N batches, expire
      snapshots beyond the last K — bounds the one-snapshot-per-micro-
      batch metadata growth over a long stream's lifetime (the CDF
      retention window shrinks accordingly). None disables (default:
      callers that time-travel or tail the CDF manage retention
      themselves).
    - ``quarantine_dir``: dead-letter queue. Structurally invalid events
      (null/empty url, null event_seq/warc_ts, unknown op, payloadless
      non-delete, oversized html — see streaming/quarantine.py) are
      diverted there per batch with machine-readable reasons instead of
      poisoning the merge or being dropped silently; the write is
      replay-idempotent (per-batch overwrite), so exactly-once survives.
      None disables (default: trusted-log deployments pay zero cost).
    - ``auto_rescale_rows_per_bucket``: bucket-count evolution on a
      signal the merge already computes. When the table's mean rows per
      bucket (total_rows / num_buckets, both from the committed
      snapshot summary — zero extra jobs) crosses this threshold after
      a batch, the bucket count DOUBLES via ``rescale_buckets`` (full
      rewrite, O(table) — it stalls that one micro-batch, the price of
      never letting per-bucket row counts grow unboundedly as the
      stream runs from 10^6 toward 10^10 rows). Doubling halves the
      mean, so the trigger naturally fires ~once per table doubling;
      ``auto_rescale_max_buckets`` caps runaway growth. None disables.
    - ``matview_dirs``: incremental materialized views
      (streaming/matview.py) refreshed inline every ``matview_every``
      batches. Each is a lake table created via ``matview.create_view``;
      refresh is exactly-once in its own right (fenced on the source
      snapshot version), so a crashed-and-replayed batch refreshes
      once. A skipped cadence only delays — each refresh catches up on
      every source commit since the last one. None disables.
    """
    table = LakeTable(spark, table_path)
    if not table.exists():
        raise ValueError(f"target table does not exist: {table_path}")
    stream_id = _stream_incarnation(checkpoint_dir)

    if source_format == "eventlog":
        events = stream_event_log(spark, log_dir, max_files_per_trigger)
    elif source_format == "debezium":
        from tinyetl_spark.sources.debezium import stream_debezium
        # with a DLQ configured, garbage envelopes pass through with
        # null fields (+ the raw string) so the quarantine rules divert
        # them with reasons instead of the parser dropping them blind
        events = stream_debezium(
            spark, log_dir, max_files_per_trigger=max_files_per_trigger,
            drop_invalid=quarantine_dir is None,
            raw_col="_raw_envelope" if quarantine_dir is not None else None)
    elif source_format == "maxwell":
        from tinyetl_spark.sources.debezium import stream_maxwell
        events = stream_maxwell(
            spark, log_dir, max_files_per_trigger=max_files_per_trigger,
            drop_invalid=quarantine_dir is None,
            raw_col="_raw_envelope" if quarantine_dir is not None else None)
    elif source_format == "canal":
        from tinyetl_spark.sources.debezium import stream_canal
        events = stream_canal(
            spark, log_dir, max_files_per_trigger=max_files_per_trigger,
            drop_invalid=quarantine_dir is None,
            raw_col="_raw_envelope" if quarantine_dir is not None else None)
    else:
        raise ValueError(f"unknown source_format: {source_format!r} "
                         "(eventlog | debezium | maxwell | canal)")
    if dedup_within_watermark:
        events = (events.withWatermark("warc_ts", dedup_within_watermark)
                        .dropDuplicatesWithinWatermark(["url", "event_seq"]))

    run_stats: list[MergeStats] = []

    def apply_batch(batch_df, batch_id: int):
        # fresh handle per batch: foreachBatch may run on a recovered query
        t = LakeTable(spark, table_path)
        n_quarantined = 0
        if quarantine_dir is not None:
            from tinyetl_spark.streaming.quarantine import (
                DEFAULT_MAX_HTML_BYTES, split_quarantine, write_quarantine)
            batch_df, rejects = split_quarantine(
                batch_df, max_html_bytes or DEFAULT_MAX_HTML_BYTES)
            n_quarantined = write_quarantine(rejects, quarantine_dir,
                                             batch_id)
            if "_raw_envelope" in batch_df.columns:
                # DLQ keeps the original wire bytes; the merge does not
                batch_df = batch_df.drop("_raw_envelope")
        stats = merge_apply(t, batch_df, batch_id, stream_id=stream_id,
                            extract=extract, transform_fn=transform_fn,
                            mode=merge_mode)
        stats.events_quarantined = n_quarantined
        run_stats.append(stats)
        if auto_compact_debt is not None and not stats.fenced:
            snap = t.snapshot()
            debt = sum(1 for f in snap.files if f.get("delta"))
            if debt >= auto_compact_debt:
                t.compact_deltas()
        if auto_rescale_rows_per_bucket is not None and not stats.fenced:
            snap = t.snapshot()
            total = int(snap.summary.get("total_rows") or 0)
            if (snap.num_buckets < auto_rescale_max_buckets
                    and total / snap.num_buckets
                    >= auto_rescale_rows_per_bucket):
                t.rescale_buckets(min(snap.num_buckets * 2,
                                      auto_rescale_max_buckets))
        if matview_dirs and (batch_id + 1) % max(matview_every, 1) == 0:
            from tinyetl_spark.streaming.matview import refresh_view
            for mv in matview_dirs:
                refresh_view(spark, t, LakeTable(spark, mv))
        if expire_every and (batch_id + 1) % expire_every == 0:
            t.expire_snapshots(keep_last=expire_keep_last)

    writer = (events.writeStream
              .queryName(query_name)
              .foreachBatch(apply_batch)
              .option("checkpointLocation", checkpoint_dir))
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    elif processing_time:
        writer = writer.trigger(processingTime=processing_time)
    q = writer.start()
    return PipelineRun(query=q, stream_id=stream_id, stats=run_stats)


def run_to_completion(spark: SparkSession, log_dir: str, table_path: str,
                      checkpoint_dir: str, **kw) -> list[MergeStats]:
    """availableNow run: drain everything currently in the log, then stop."""
    run = run_pipeline(spark, log_dir, table_path, checkpoint_dir,
                       trigger_available_now=True, **kw)
    run.await_termination()
    return run.stats


def replicate(spark: SparkSession, src_table: str, dst_table: str,
              checkpoint_dir: str, query_name: str = "tinyetl-replicate",
              ) -> list[MergeStats]:
    """Table replication by chaining engines: tail ``src_table``'s
    change-data-feed (the ``tinyetl_cdf`` streaming source) and MERGE
    each micro-batch into ``dst_table`` — an incremental mirror that
    never re-reads source state (the reference's only equivalent is a
    scheduled full re-copy). Checkpointed offsets (snapshot versions)
    plus the destination's own epoch fence give exactly-once end to end;
    the change rows carry (warc_ts, event_seq), so replay reconverges by
    LWW idempotency like any other event stream. Change rows already
    hold extracted text — the merge runs with extract=False and the
    mirror is byte-identical."""
    from tinyetl_spark.streaming.cdf_source import register_cdf_source
    register_cdf_source(spark)
    dst = LakeTable(spark, dst_table)
    if not dst.exists():
        raise ValueError(f"target table does not exist: {dst_table}")
    stream_id = _stream_incarnation(checkpoint_dir)
    run_stats: list[MergeStats] = []

    feed = (spark.readStream.format("tinyetl_cdf")
            .option("path", src_table).load())

    CDF_COLS = {"_change_type", "_commit_version", "_batch_id"}

    def apply_batch(batch_df, batch_id: int):
        events = (batch_df.withColumn(
                      "op", F.when(F.col("_change_type") == "delete",
                                   F.lit("delete")).otherwise(F.lit("update")))
                  .drop("_change_type", "_commit_version", "_batch_id",
                        "_deleted"))
        t = LakeTable(spark, dst_table)
        # source schema evolution propagates: columns the feed carries
        # that the mirror lacks would otherwise be conform-DROPPED
        # silently, and a feed column WIDER than the mirror's (int→long
        # upstream) would be conform-NARROWED — overflow values silently
        # wrap. Evolve the mirror first: add new columns, widen dtypes
        # along _WIDEN_OK (same rules as the source's own evolution); the
        # merge then conforms normally.
        from tinyetl_spark.lake.table import _WIDEN_OK
        mirror = {f.name: f for f in t.snapshot().schema.fields}
        skip = CDF_COLS | {"op"}
        extra, widened = [], False
        for f in events.schema.fields:
            if f.name in skip:
                continue
            cur = mirror.get(f.name)
            if cur is None:
                extra.append(f)
            elif (cur.dataType != f.dataType
                  and (cur.dataType.typeName(),
                       f.dataType.typeName()) in _WIDEN_OK):
                mirror[f.name] = cur.__class__(f.name, f.dataType,
                                               cur.nullable, cur.metadata)
                widened = True
        if extra or widened:
            from pyspark.sql.types import StructType as _ST
            t.evolve_schema(_ST(list(mirror.values()) + extra))
        run_stats.append(merge_apply(t, events, batch_id,
                                     stream_id=stream_id, extract=False))

    q = (feed.writeStream.queryName(query_name)
         .foreachBatch(apply_batch)
         .option("checkpointLocation", checkpoint_dir)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    return run_stats


def bootstrap_snapshot(table: LakeTable, snapshot, batch_id: int = 0,
                       stream_id: str = "bootstrap",
                       seq_col: str | None = None,
                       op_col: str | None = None,
                       extract: bool = True, transform_fn=None,
                       mode: str = "auto") -> MergeStats:
    """Initial-load half of the snapshot-then-stream CDC contract
    (Debezium's snapshot mode; the reference's closest analogue is the
    one-shot batch copy, /root/reference/src/transfer.rs — but with no
    way to switch to incremental afterwards).

    ``snapshot`` is a consistent read of the SOURCE table at some cut
    point T: plain rows (url, warc_ts, html/lang/extras...), no ``op``
    column. Each row becomes an ``update`` change event and the whole
    snapshot is merge-applied as one bulk batch under the ``stream_id``
    fence namespace — re-running the bootstrap (same batch_id) fences to
    a no-op, so a crashed initial load is safely retried.

    Reconvergence with the tail stream: start the log stream from any
    WAL position at or before T (its own checkpoint dir mints a separate
    incarnation, so its fences are independent). Replayed pre-snapshot
    events LOSE last-writer-wins against the snapshot row (their
    (warc_ts, event_seq) is at most the snapshot row's) or tie-reapply
    the identical state; post-snapshot events win. The only contract the
    caller owes is the standard CDC one: the log must retain events back
    to the snapshot cut, else the gap is unrecoverable by any engine.

    ``seq_col`` names a snapshot column carrying the source's last
    applied WAL position per row — pass it when the source exposes one
    (exact LWW ties). Without it the bootstrap stamps event_seq=0:
    a replayed event with the same warc_ts then wins the tie, which is
    convergent anyway — an event carrying the same timestamp as the
    snapshot row IS the write that produced it, so reapplying it yields
    byte-identical state.

    ``op_col`` names a snapshot column carrying 'update'/'delete' per
    row, for snapshots that include TOMBSTONES (recently-deleted keys
    with their deletion (warc_ts, seq) — e.g. another instance of this
    engine, or a log-compacted topic that retains tombstones). Why it
    matters: under (warc_ts, event_seq) LWW with out-of-order
    timestamps, a key deleted BEFORE the tail's start position but with
    a deletion warc_ts NEWER than some stale event the tail replays is
    invisible to a rows-only snapshot — the stale event would resurrect
    it. Tombstones in the snapshot close that gap exactly (the merge
    writes them as _deleted rows that win LWW). Without ``op_col``,
    exact reconvergence still holds whenever warc_ts is monotone with
    WAL position (in-order streams), or when the tail starts at the
    snapshot cut AND every post-cut event carries a post-cut timestamp.
    """
    cols = [
        (F.col(seq_col) if seq_col else F.lit(0)).cast("long")
        .alias("event_seq"),
        F.col("url"), F.col("warc_ts"),
        (F.col(op_col) if op_col else F.lit("update")).alias("op"),
    ]
    passthrough = [c for c in snapshot.columns
                   if c not in ("url", "warc_ts", "op", "event_seq")
                   and c not in (seq_col, op_col)]
    ev = snapshot.select(*cols, *[F.col(c) for c in passthrough])
    return merge_apply(table, ev, batch_id, stream_id=stream_id,
                       extract=extract, transform_fn=transform_fn,
                       mode=mode)


@dataclass
class FanoutRun:
    query: StreamingQuery
    stream_id: str
    # route -> MergeStats per batch, appended in batch order
    stats: dict[str, list[MergeStats]] = field(default_factory=dict)
    unrouted_events: int = 0

    def await_termination(self, timeout: int | None = None):
        return self.query.awaitTermination(timeout)


def run_fanout_pipeline(
    spark: SparkSession,
    log_dir: str,
    tables: dict[str, str],
    checkpoint_dir: str,
    route_col: str = "route",
    trigger_available_now: bool = True,
    processing_time: str | None = None,
    max_files_per_trigger: int | None = None,
    extract: bool = True,
    unknown_route_dir: str | None = None,
    query_name: str = "tinyetl-cdc-fanout",
    merge_mode: str = "auto",
) -> FanoutRun:
    """One CDC stream fanned out to MANY tables — the multi-table shape
    every real binlog tail has (a Debezium connector emits every table
    of the source database into one stream; the reference moves exactly
    one table per job, src/config.rs job = source->target pair).

    The log carries a ``route_col`` string next to the change-event
    columns; each micro-batch is split by route and merge-applied to the
    matching table in ``tables`` (route value -> table path).

    Exactly-once per TABLE, not per batch-group: every table keeps its
    own epoch fence under this stream's incarnation, so a crash after
    table A committed batch 7 but before table B did replays batch 7
    into A as a fenced no-op and into B as a normal merge. No cross-
    table transaction is needed — idempotence per sink composes.

    Events whose route has no table entry go to ``unknown_route_dir``
    as parquet under batch_id=N subdirs (overwrite per batch =>
    replay-idempotent), or are counted and dropped when None — never
    merged into a wrong table, never able to poison the stream.

    Scale shape: ONE persisted pass over the batch, then K route-pruned
    merges (each shuffles only its slice); route cardinality is the
    table count (tens), not the key count, so the split adds no shuffle
    of its own.
    """
    from pyspark.sql.types import StringType, StructField, StructType

    from tinyetl_spark.schema import EVENTS_SCHEMA
    routes = dict(tables)
    for route, path in routes.items():
        if not LakeTable(spark, path).exists():
            raise ValueError(
                f"fan-out target for route {route!r} does not exist: {path}")
    stream_id = _stream_incarnation(checkpoint_dir)
    # copy — StructType.add would mutate the shared EVENTS_SCHEMA
    schema = StructType(list(EVENTS_SCHEMA.fields)
                        + [StructField(route_col, StringType(), False)])
    events = stream_event_log(spark, log_dir, max_files_per_trigger,
                              schema=schema)

    run = FanoutRun(query=None, stream_id=stream_id,
                    stats={r: [] for r in routes})

    def apply_batch(batch_df, batch_id: int):
        batch_df = batch_df.persist()
        try:
            for route, path in routes.items():
                slice_df = (batch_df
                            .filter(F.col(route_col) == F.lit(route))
                            .drop(route_col))
                t = LakeTable(spark, path)
                run.stats[route].append(
                    merge_apply(t, slice_df, batch_id,
                                stream_id=stream_id, extract=extract,
                                mode=merge_mode))
            strays = batch_df.filter(
                ~F.col(route_col).isin(*routes) | F.col(route_col).isNull())
            n = strays.count()
            if n and unknown_route_dir is not None:
                # per-batch overwrite => replaying the batch rewrites the
                # same stray slice instead of duplicating it
                strays.write.mode("overwrite").parquet(
                    os.path.join(unknown_route_dir, f"batch_id={batch_id}"))
            run.unrouted_events += n
        finally:
            batch_df.unpersist()

    writer = (events.writeStream
              .queryName(query_name)
              .foreachBatch(apply_batch)
              .option("checkpointLocation", checkpoint_dir))
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    elif processing_time:
        writer = writer.trigger(processingTime=processing_time)
    run.query = writer.start()
    return run


def progress_summary(run: PipelineRun) -> dict[str, Any]:
    s = run.stats
    return {
        "batches": len(s),
        "events_in": sum(x.events_in for x in s),
        "upserts": sum(x.upserts for x in s),
        "deletes": sum(x.deletes for x in s),
        "dedup_drops": sum(x.dedup_drops for x in s),
        "fenced_batches": sum(1 for x in s if x.fenced),
        "events_quarantined": sum(x.events_quarantined for x in s),
        "max_skew_ratio": max((x.skew_ratio for x in s), default=0.0),
    }
