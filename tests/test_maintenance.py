"""Snapshot expiry: metadata + orphan-file GC keeps the live window
readable and bounds storage growth from snapshot-per-micro-batch."""

import os

from tinyetl_spark import datagen
from tinyetl_spark.lake import LakeTable, merge_apply
from tinyetl_spark.schema import PAGES_SCHEMA


def count_parquet(root):
    return sum(1 for dp, _, fns in os.walk(root) for f in fns
               if f.endswith(".parquet"))


def test_expire_snapshots(spark, tmpdir_path):
    t = LakeTable.create(spark, f"{tmpdir_path}/t", PAGES_SCHEMA,
                         key_col="url", num_buckets=4)
    ev = datagen.change_events(spark, 800, 100, seed=3)
    for i in range(4):
        merge_apply(t, ev.filter(f"event_seq % 4 = {i}"), i)
    before_state = sorted((r["url"], r["event_seq"]) for r in t.read().collect())
    files_before = count_parquet(t.data_dir)
    v = t.current_version()

    out = t.expire_snapshots(keep_last=2)
    assert out["expired_snapshots"] > 0
    assert out["deleted_files"] > 0
    assert count_parquet(t.data_dir) < files_before

    # current state intact, kept window still time-travelable
    after_state = sorted((r["url"], r["event_seq"]) for r in t.read().collect())
    assert after_state == before_state
    assert t.read(version=v - 1).count() > 0
    # expired version gone
    assert not os.path.exists(os.path.join(t.meta_dir, "v0.json"))

    # merging continues to work after expiry
    s = merge_apply(t, ev.filter("event_seq % 4 = 0"), 99)
    assert s.snapshot_version == v + 1


def test_metrics_and_history_survive_expiry(spark, tmpdir_path):
    """ADVICE fix: merge_metrics/bucket_lineage/history used to open every
    v<N>.json from 0 and crashed with FileNotFoundError after expiry."""
    from tinyetl_spark.lineage import bucket_lineage, merge_metrics
    t = LakeTable.create(spark, f"{tmpdir_path}/t", PAGES_SCHEMA,
                         key_col="url", num_buckets=4)
    ev = datagen.change_events(spark, 400, 50, seed=5)
    for i in range(4):
        merge_apply(t, ev.filter(f"event_seq % 4 = {i}"), i)
    t.expire_snapshots(keep_last=2)
    assert t.oldest_version() > 0
    m = merge_metrics(t)
    assert m.count() >= 1                      # only live merge commits
    assert bucket_lineage(t).count() >= 1
    assert len(t.history()) == 2


def test_concurrent_commit_detected(spark, tmpdir_path):
    """ADVICE fix: a compaction racing a merge must fail the validated
    swap instead of silently dropping the other writer's files."""
    import pytest as _pytest
    from tinyetl_spark.lake.table import ConcurrentCommitError
    t = LakeTable.create(spark, f"{tmpdir_path}/t", PAGES_SCHEMA,
                         key_col="url", num_buckets=4)
    ev = datagen.change_events(spark, 200, 40, seed=6)
    merge_apply(t, ev, 0)
    base_v = t.current_version()
    snap = t.snapshot()
    # another writer commits in between (simulated merge)
    t.commit(files=snap.files, summary={"operation": "merge"},
             expected_base=base_v)
    # the first writer's planned commit must now be rejected
    with _pytest.raises(ConcurrentCommitError):
        t.commit(files=snap.files, summary={"operation": "compact"},
                 expected_base=base_v)
