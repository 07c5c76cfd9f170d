"""Snapshot-then-stream bootstrap and multi-table fan-out routing.

Bootstrap: the Debezium initial-load contract — a consistent source
snapshot is bulk-merged, then the WAL tail streams from a position at or
before the snapshot cut; the overlap reconverges by LWW idempotency to
the exact full-replay state.

Fan-out: one change stream carrying a route column feeds MANY tables,
each with its own epoch fence (exactly-once per table, no cross-table
transaction).
"""

import os

import pyspark.sql.functions as F
from pyspark.sql import Window

from tinyetl_spark import datagen
from tinyetl_spark.lake import LakeTable, merge_apply
from tinyetl_spark.schema import PAGES_SCHEMA
from tinyetl_spark.sources.eventlog import append_events
from tinyetl_spark.streaming.pipeline import (bootstrap_snapshot,
                                              run_fanout_pipeline,
                                              run_to_completion)


def lww_snapshot(ev, cut, with_tombstones=False):
    """What a consistent read of the source at WAL position `cut` shows:
    the winning event per url among events before the cut — rows only,
    or rows + tombstones (deleted keys with their deletion stamp) for
    sources that retain them."""
    w = Window.partitionBy("url").orderBy(F.desc("warc_ts"),
                                          F.desc("event_seq"))
    winners = (ev.filter(F.col("event_seq") < cut)
                 .withColumn("rn", F.row_number().over(w))
                 .filter("rn = 1"))
    if not with_tombstones:
        winners = winners.filter("op <> 'delete'")
    return winners.select("url", "warc_ts", "html", "lang", "event_seq",
                          "op")


def full_state(spark, path):
    return sorted((r["url"], r["event_seq"], r["warc_ts"], r["text"])
                  for r in LakeTable(spark, path).read()
                  .select("url", "event_seq", "warc_ts", "text").collect())


def test_bootstrap_then_stream_equals_full_replay(spark, tmpdir_path):
    """Tombstone-carrying snapshot + overlapping tail == full replay,
    EXACTLY — even with out-of-order timestamps (datagen has 10% late
    events; a rows-only snapshot provably cannot reconverge here, see
    bootstrap_snapshot's op_col docs)."""
    ev = datagen.change_events(spark, 600, 80, seed=7)
    cut, overlap_start = 300, 200

    # engine under test: snapshot at cut, then tail from BEFORE the cut
    boot = f"{tmpdir_path}/boot"
    t = LakeTable.create(spark, boot, PAGES_SCHEMA, key_col="url",
                         num_buckets=8)
    stats = bootstrap_snapshot(t, lww_snapshot(ev, cut,
                                               with_tombstones=True),
                               seq_col="event_seq", op_col="op")
    assert stats.upserts > 0 and not stats.fenced
    log = f"{tmpdir_path}/log"
    append_events(ev.filter(F.col("event_seq") >= overlap_start), log,
                  segment_partitions=3)
    run_to_completion(spark, log, boot, f"{tmpdir_path}/ckpt")

    # oracle: plain full replay of every event
    full = f"{tmpdir_path}/full"
    t2 = LakeTable.create(spark, full, PAGES_SCHEMA, key_col="url",
                          num_buckets=8)
    merge_apply(t2, ev, 0)

    assert full_state(spark, boot) == full_state(spark, full)


def test_bootstrap_retry_fences(spark, tmpdir_path):
    ev = datagen.change_events(spark, 300, 50, seed=9)
    t = LakeTable.create(spark, f"{tmpdir_path}/t", PAGES_SCHEMA,
                         key_col="url", num_buckets=4)
    snap = lww_snapshot(ev, 300)
    s1 = bootstrap_snapshot(t, snap, seq_col="event_seq")
    s2 = bootstrap_snapshot(t, snap, seq_col="event_seq")   # crash retry
    assert not s1.fenced and s2.fenced and s2.upserts == 0
    assert t.read().count() == s1.upserts


def test_bootstrap_without_seq_col_converges(spark, tmpdir_path):
    """Rows-only, seq-less bootstrap (the weakest source: no WAL
    positions, no tombstones) on an IN-ORDER stream — the documented
    contract where it still reconverges exactly. Replayed same-ts
    events win the tie but carry identical content."""
    ev = datagen.change_events(spark, 400, 60, seed=11,
                               out_of_order_pct=0)
    boot = f"{tmpdir_path}/boot"
    t = LakeTable.create(spark, boot, PAGES_SCHEMA, key_col="url",
                         num_buckets=4)
    bootstrap_snapshot(t, lww_snapshot(ev, 200).drop("event_seq"))
    log = f"{tmpdir_path}/log"
    append_events(ev.filter("event_seq >= 100"), log, segment_partitions=2)
    run_to_completion(spark, log, boot, f"{tmpdir_path}/ckpt")

    full = f"{tmpdir_path}/full"
    t2 = LakeTable.create(spark, full, PAGES_SCHEMA, key_col="url",
                          num_buckets=4)
    merge_apply(t2, ev, 0)
    # urls + text bytes converge; event_seq may read 0 where the
    # snapshot row won the tie, so compare the content columns
    a = sorted((r["url"], r["warc_ts"], r["text"])
               for r in LakeTable(spark, boot).read()
               .select("url", "warc_ts", "text").collect())
    b = sorted((r["url"], r["warc_ts"], r["text"])
               for r in t2.read().select("url", "warc_ts", "text").collect())
    assert a == b


def routed_events(spark, n=800, urls=100, seed=13, stray_every=97):
    ev = datagen.change_events(spark, n, urls, seed=seed)
    route = (F.when(F.col("event_seq") % stray_every == 0, F.lit("zzz"))
             .when(F.pmod(F.xxhash64("url"), 2) == 0, F.lit("a"))
             .otherwise(F.lit("b")))
    return ev.withColumn("route", route)


def test_fanout_routes_to_matching_tables(spark, tmpdir_path):
    rev = routed_events(spark)
    log = f"{tmpdir_path}/log"
    append_events(rev, log, segment_partitions=4)
    paths = {r: f"{tmpdir_path}/{r}" for r in ("a", "b")}
    for p in paths.values():
        LakeTable.create(spark, p, PAGES_SCHEMA, key_col="url",
                         num_buckets=4)
    dlq = f"{tmpdir_path}/strays"
    run = run_fanout_pipeline(spark, log, paths, f"{tmpdir_path}/ckpt",
                              unknown_route_dir=dlq)
    run.await_termination()

    for r, p in paths.items():
        want = f"{tmpdir_path}/want_{r}"
        t = LakeTable.create(spark, want, PAGES_SCHEMA, key_col="url",
                             num_buckets=4)
        merge_apply(t, rev.filter(F.col("route") == r).drop("route"), 0)
        assert full_state(spark, p) == full_state(spark, want), r

    n_stray = rev.filter("route = 'zzz'").count()
    assert run.unrouted_events == n_stray > 0
    assert spark.read.parquet(dlq).count() == n_stray


def test_fanout_per_table_fences_are_independent(spark, tmpdir_path):
    """Crash-between-sinks shape: table A already committed batch 0
    under this stream's incarnation; the stream then replays batch 0 —
    A fences to a no-op, B applies normally, both end correct."""
    from tinyetl_spark.streaming.pipeline import _stream_incarnation
    rev = routed_events(spark, stray_every=10**9)   # no strays
    log = f"{tmpdir_path}/log"
    append_events(rev, log, segment_partitions=1)   # one batch
    paths = {r: f"{tmpdir_path}/{r}" for r in ("a", "b")}
    for p in paths.values():
        LakeTable.create(spark, p, PAGES_SCHEMA, key_col="url",
                         num_buckets=4)
    ckpt = f"{tmpdir_path}/ckpt"
    sid = _stream_incarnation(ckpt)     # mint the id the stream will use
    ta = LakeTable(spark, paths["a"])
    pre = merge_apply(ta, rev.filter("route = 'a'").drop("route"), 0,
                      stream_id=sid)
    assert not pre.fenced

    run = run_fanout_pipeline(spark, log, paths, ckpt)
    run.await_termination()
    assert [s.fenced for s in run.stats["a"]] == [True]
    assert [s.fenced for s in run.stats["b"]] == [False]
    for r, p in paths.items():
        want = f"{tmpdir_path}/want_{r}"
        t = LakeTable.create(spark, want, PAGES_SCHEMA, key_col="url",
                             num_buckets=4)
        merge_apply(t, rev.filter(F.col("route") == r).drop("route"), 0)
        assert full_state(spark, p) == full_state(spark, want), r


def test_fanout_unknown_route_dropped_when_no_dlq(spark, tmpdir_path):
    rev = routed_events(spark, n=300, urls=40, stray_every=50)
    log = f"{tmpdir_path}/log"
    append_events(rev, log, segment_partitions=2)
    paths = {r: f"{tmpdir_path}/{r}" for r in ("a", "b")}
    for p in paths.values():
        LakeTable.create(spark, p, PAGES_SCHEMA, key_col="url",
                         num_buckets=4)
    run = run_fanout_pipeline(spark, log, paths, f"{tmpdir_path}/ckpt")
    run.await_termination()
    assert run.unrouted_events == rev.filter("route = 'zzz'").count() > 0
    assert not os.path.exists(f"{tmpdir_path}/strays")
