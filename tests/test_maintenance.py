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
