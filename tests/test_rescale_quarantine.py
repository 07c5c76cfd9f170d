"""Round-5 scale features: online bucket rescale, time-clustered
compaction, and the dead-letter quarantine for malformed events."""

import os

import pyspark.sql.functions as F
from pyspark.sql import Row

from tinyetl_spark import datagen
from tinyetl_spark.lake import LakeTable, merge_apply
from tinyetl_spark.schema import EVENTS_SCHEMA, PAGES_SCHEMA
from tinyetl_spark.sources.eventlog import append_events
from tinyetl_spark.streaming.pipeline import run_to_completion
from tinyetl_spark.streaming.quarantine import (read_quarantine,
                                                split_quarantine)
from tests.test_merge import brute_force_state


def _state(t: LakeTable):
    return sorted((r["url"], r["event_seq"]) for r in t.read().collect())


# ------------------------------------------------------------- rescale

def test_rescale_buckets_preserves_state_and_reroutes(spark, tmpdir_path):
    """Rescale 4 -> 16: resolved state identical, manifest bucket ids
    valid under the NEW spec, and later merges route under it too."""
    t = LakeTable.create(spark, f"{tmpdir_path}/t", PAGES_SCHEMA,
                         key_col="url", num_buckets=4)
    ev = datagen.change_events(spark, 1500, 200, seed=7)
    merge_apply(t, ev.filter("event_seq < 1000"), 0)
    before = _state(t)

    snap = t.rescale_buckets(16)
    assert snap.num_buckets == 16
    assert snap.summary["operation"] == "rescale"
    assert _state(t) == before
    buckets_seen = {b for f in snap.files for b in f["buckets"]}
    assert buckets_seen <= set(range(16))
    assert max(buckets_seen) >= 4     # keys actually spread past old spec

    # bucket ids inside the data files agree with the new spec everywhere
    raw = spark.read.parquet(*[f["path"] for f in snap.files])
    mismatch = raw.filter(
        F.col("_bucket") != F.pmod(F.xxhash64(F.col("url")), F.lit(16)))
    assert mismatch.count() == 0

    # stream keeps merging correctly against the new spec
    merge_apply(t, ev.filter("event_seq >= 1000"), 1)
    assert _state(t) == sorted(
        (r["url"], r["event_seq"]) for r in brute_force_state(ev).collect())


def test_rescale_preserves_fence_and_tombstones(spark, tmpdir_path):
    """Epoch fences (exactly-once replay protection) and delete
    tombstones survive the rewrite."""
    t = LakeTable.create(spark, f"{tmpdir_path}/t", PAGES_SCHEMA,
                         key_col="url", num_buckets=4)
    ev = datagen.change_events(spark, 1200, 120, seed=11, delete_pct=30)
    merge_apply(t, ev, 0, stream_id="s1")
    deleted_before = (t.read(include_tombstones=True)
                       .filter("_deleted").count())
    assert deleted_before > 0

    t.rescale_buckets(8)
    assert (t.read(include_tombstones=True).filter("_deleted").count()
            == deleted_before)
    # fence carried: replaying the same batch is a no-op
    s = merge_apply(t, ev, 0, stream_id="s1")
    assert s.fenced
    # stale-update vs tombstone ordering still enforced after rescale
    assert _state(t) == sorted(
        (r["url"], r["event_seq"]) for r in brute_force_state(ev).collect())


def test_rescale_noop_and_validation(spark, tmpdir_path):
    t = LakeTable.create(spark, f"{tmpdir_path}/t", PAGES_SCHEMA,
                         key_col="url", num_buckets=4)
    v = t.current_version()
    assert t.rescale_buckets(4).version == v    # same count: no commit
    try:
        t.rescale_buckets(0)
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


# --------------------------------------------------- clustered compact

def test_compact_cluster_by_ts_splits_and_prunes(spark, tmpdir_path):
    """files_per_bucket=3: each bucket comes back as 3 single-bucket
    files with near-disjoint ts zone maps, and a narrow time-window read
    prunes most files while returning exactly the right rows."""
    t = LakeTable.create(spark, f"{tmpdir_path}/t", PAGES_SCHEMA,
                         key_col="url", num_buckets=4)
    ev = datagen.change_events(spark, 3000, 600, seed=13)
    for i in range(3):
        merge_apply(t, ev.filter(f"event_seq % 3 = {i}"), i)
    before = _state(t)

    snap = t.compact(cluster_by_ts=True, files_per_bucket=3)
    assert snap.summary["clustered_by"] == "warc_ts"
    assert _state(t) == before

    per_bucket: dict[int, list] = {}
    for f in snap.files:
        assert len(f["buckets"]) == 1          # exact routing: 1 bucket/file
        assert "ts_range" in f
        per_bucket.setdefault(f["buckets"][0], []).append(f["ts_range"])
    for b, ranges in per_bucket.items():
        assert len(ranges) == 3
        ranges.sort()
        for (_, hi), (lo2, _) in zip(ranges, ranges[1:]):
            assert lo2 >= hi                   # time-disjoint slices

    # zone-map pruning: a window inside one slice reads < all files
    import datetime as dt
    lo = dt.datetime.fromtimestamp(datagen.BASE_EPOCH + 2500,
                                   dt.timezone.utc)
    pruned = t.read(ts_range=(lo, None))
    # correctness of the windowed read against a brute-force filter
    brute = sorted(
        (r["url"], r["event_seq"])
        for r in t.read().filter(F.col("warc_ts") >= F.lit(lo)).collect())
    assert sorted((r["url"], r["event_seq"])
                  for r in pruned.collect()) == brute
    overlapping = [f for f in snap.files
                   if f["ts_range"][1] >= int(lo.timestamp() * 1_000_000)]
    assert len(overlapping) < len(snap.files)  # manifest actually prunes


# ------------------------------------------------------------ quarantine

def _bad_rows(spark):
    """Malformed events. EVENTS_SCHEMA declares url/warc_ts/op required,
    so the frame uses a nullable copy — exactly what a broken upstream
    agent produces: data that VIOLATES the declared contract (parquet
    file sources do not enforce nullability on read, so these flow into
    the stream like any other rows)."""
    import datetime as dt

    from pyspark.sql.types import StructField, StructType
    nullable = StructType([StructField(f.name, f.dataType, True)
                           for f in EVENTS_SCHEMA.fields])
    ts = dt.datetime(2025, 1, 1, tzinfo=dt.timezone.utc)
    rows = [
        Row(event_seq=9001, url=None, warc_ts=ts, op="insert",
            html=b"x", lang="en"),                       # null_url
        Row(event_seq=9002, url="", warc_ts=ts, op="insert",
            html=b"x", lang="en"),                       # empty_url
        Row(event_seq=9003, url="http://a/", warc_ts=None, op="update",
            html=b"x", lang="en"),                       # null_warc_ts
        Row(event_seq=9004, url="http://b/", warc_ts=ts, op="upsert",
            html=b"x", lang="en"),                       # bad_op
        Row(event_seq=9005, url="http://c/", warc_ts=ts, op="insert",
            html=None, lang="en"),                       # missing_html
    ]
    return spark.createDataFrame(rows, nullable)


def test_split_quarantine_reasons(spark):
    good = datagen.change_events(spark, 50, 20, seed=5)
    mixed = good.unionByName(_bad_rows(spark))
    valid, rejects = split_quarantine(mixed)
    assert valid.count() == 50
    got = {r["event_seq"]: list(r["_reject_reasons"])
           for r in rejects.collect()}
    assert got == {9001: ["null_url"], 9002: ["empty_url"],
                   9003: ["null_warc_ts"], 9004: ["bad_op"],
                   9005: ["missing_html"]}


def test_split_quarantine_oversized_html(spark):
    import datetime as dt
    ts = dt.datetime(2025, 1, 1, tzinfo=dt.timezone.utc)
    df = spark.createDataFrame(
        [Row(event_seq=1, url="http://a/", warc_ts=ts, op="insert",
             html=b"x" * 100, lang="en")], EVENTS_SCHEMA)
    valid, rejects = split_quarantine(df, max_html_bytes=10)
    assert valid.count() == 0
    assert rejects.collect()[0]["_reject_reasons"] == ["oversized_html"]


def test_pipeline_quarantines_and_merges_valid(spark, tmpdir_path):
    """End-to-end: the stream diverts bad events to the DLQ, merges the
    valid remainder to the oracle state, and replaying from a fresh
    checkpoint is idempotent for BOTH sinks."""
    log = f"{tmpdir_path}/log"
    table = f"{tmpdir_path}/table"
    q = f"{tmpdir_path}/dlq"
    LakeTable.create(spark, table, PAGES_SCHEMA, key_col="url",
                     num_buckets=8)
    good = datagen.change_events(spark, 800, 100, seed=21)
    append_events(good.unionByName(_bad_rows(spark)), log,
                  segment_partitions=4)

    stats = run_to_completion(spark, log, table, f"{tmpdir_path}/ckpt",
                              quarantine_dir=q)
    assert sum(s.events_quarantined for s in stats) == 5
    t = LakeTable(spark, table)
    assert _state(t) == sorted(
        (r["url"], r["event_seq"])
        for r in brute_force_state(good).collect())

    dlq = read_quarantine(spark, q)
    assert dlq.count() == 5
    assert "batch_id" in dlq.columns and "_reject_reasons" in dlq.columns

    # full replay from a fresh checkpoint (new incarnation, so the merge
    # reconverges idempotently rather than fence-skipping): the DLQ's
    # per-batch overwrite keeps it duplicate-free and the table state is
    # unchanged
    import shutil
    shutil.rmtree(f"{tmpdir_path}/ckpt")
    run_to_completion(spark, log, table, f"{tmpdir_path}/ckpt",
                      quarantine_dir=q)
    assert read_quarantine(spark, q).count() == 5
    assert _state(t) == sorted(
        (r["url"], r["event_seq"])
        for r in brute_force_state(good).collect())
    # quarantine dir layout is per-batch (replay-idempotent overwrite)
    assert all(d.startswith("batch_id=") for d in os.listdir(q)
               if not d.startswith(("_", ".")))


def test_pipeline_auto_rescale_doubles_buckets(spark, tmpdir_path):
    """The maintenance cadence doubles the bucket count when mean rows
    per bucket crosses the threshold, and the stream's final state is
    unchanged by when the rescale fired."""
    log = f"{tmpdir_path}/log"
    table = f"{tmpdir_path}/table"
    LakeTable.create(spark, table, PAGES_SCHEMA, key_col="url",
                     num_buckets=2)
    ev = datagen.change_events(spark, 1000, 400, seed=33)
    append_events(ev, log, segment_partitions=5)

    run_to_completion(spark, log, table, f"{tmpdir_path}/ckpt",
                      max_files_per_trigger=1,
                      auto_rescale_rows_per_bucket=50)
    t = LakeTable(spark, table)
    snap = t.snapshot()
    assert snap.num_buckets > 2                # grew under load
    assert any(t.snapshot(v).summary.get("operation") == "rescale"
               for v in t.versions())
    assert _state(t) == sorted(
        (r["url"], r["event_seq"])
        for r in brute_force_state(ev).collect())
    # cap respected
    assert snap.num_buckets <= 1 << 16


# ----------------------------------------------------------------- CLI

def test_cli_maintain_rescale_and_clustered_compact(spark, tmpdir_path):
    """The ops surface: `maintain --rescale-buckets N` and
    `maintain --compact --cluster-by-ts --files-per-bucket K` drive the
    same code paths from the command line."""
    import subprocess
    import sys
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    table = f"{tmpdir_path}/table"
    t = LakeTable.create(spark, table, PAGES_SCHEMA, key_col="url",
                         num_buckets=4)
    ev = datagen.change_events(spark, 400, 120, seed=7)
    merge_apply(t, ev, 0)
    before = _state(t)

    env = {**os.environ, "PYTHONPATH": repo, "SPARK_GRAFT_CPUS": "4"}
    p = subprocess.run(
        [sys.executable, "-m", "tinyetl_spark.cli", "maintain", table,
         "--rescale-buckets", "8"],
        capture_output=True, text=True, cwd=repo, env=env)
    assert p.returncode == 0, p.stderr
    assert "rescaled" in p.stdout and "8 buckets" in p.stdout

    p = subprocess.run(
        [sys.executable, "-m", "tinyetl_spark.cli", "maintain", table,
         "--compact", "--cluster-by-ts", "--files-per-bucket", "2"],
        capture_output=True, text=True, cwd=repo, env=env)
    assert p.returncode == 0, p.stderr
    assert "compacted" in p.stdout

    t2 = LakeTable(spark, table)
    snap = t2.snapshot()
    assert snap.num_buckets == 8
    assert snap.summary.get("clustered_by") == "warc_ts"
    assert _state(t2) == before


def test_rescale_absorbs_mor_delta_debt(spark, tmpdir_path):
    """Rescaling a table that carries unresolved merge-on-read deltas
    must fold the delta rows into the new base files (it reads the
    RESOLVED state) and leave zero delta debt behind."""
    t = LakeTable.create(spark, f"{tmpdir_path}/t", PAGES_SCHEMA,
                         key_col="url", num_buckets=4)
    ev = datagen.change_events(spark, 900, 150, seed=21)
    merge_apply(t, ev.filter("event_seq < 600"), 0)
    merge_apply(t, ev.filter("event_seq >= 600"), 1, mode="mor")
    assert any(f.get("delta") for f in t.snapshot().files)  # debt exists

    t.rescale_buckets(16)
    snap = t.snapshot()
    assert snap.num_buckets == 16
    assert not any(f.get("delta") for f in snap.files)      # debt absorbed
    assert _state(t) == sorted(
        (r["url"], r["event_seq"])
        for r in brute_force_state(ev).collect())


def test_rescale_property_random_interleaving(spark, tmpdir_path):
    """Property check (hypothesis): a rescale interleaved at a RANDOM
    point in a random batch/strategy sequence — to a random target count
    (power-of-two or coprime with the old spec) — never changes the
    converged LWW state, and replay fencing survives the new spec."""
    import uuid

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from tests.test_merge import assert_state_equal, make_table
    ev = datagen.change_events(spark, 400, 60, seed=77).persist()
    ev.count()

    @settings(max_examples=6, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(data=st.data())
    def run(data):
        n_batches = data.draw(st.integers(2, 4), label="n_batches")
        cuts = sorted(data.draw(
            st.lists(st.integers(1, 399), min_size=n_batches - 1,
                     max_size=n_batches - 1, unique=True), label="cuts"))
        bounds = [0, *cuts, 400]
        modes = data.draw(st.lists(st.sampled_from(["auto", "cow", "mor"]),
                                   min_size=n_batches, max_size=n_batches),
                          label="modes")
        rescale_at = data.draw(st.integers(0, n_batches - 1),
                               label="rescale_at")
        new_n = data.draw(st.sampled_from([2, 3, 16, 17, 32]),
                          label="new_buckets")
        path = f"{tmpdir_path}/t_{uuid.uuid4().hex[:8]}"
        t = make_table(spark, path, buckets=8)
        for i in range(n_batches):
            b = ev.filter(f"event_seq >= {bounds[i]} and "
                          f"event_seq < {bounds[i+1]}")
            merge_apply(t, b, i, mode=modes[i])
            if i == rescale_at:
                t.rescale_buckets(new_n)
                # replay across the spec change: must still fence
                s = merge_apply(t, b, i, mode=modes[i])
                assert s.fenced
        assert t.snapshot().num_buckets == (new_n if new_n != 8 else 8)
        assert_state_equal(t, ev)

    run()
    ev.unpersist()
