"""LakeTable: snapshots, atomic commits, time travel, schema evolution,
bucket pruning, compaction."""

import os

import pyspark.sql.functions as F
import pytest
from pyspark.sql.types import (DoubleType, LongType, StringType, StructField,
                               StructType)

from tinyetl_spark.lake import LakeTable
from tinyetl_spark.lake.table import conform

SCHEMA = StructType([
    StructField("url", StringType(), False),
    StructField("n", LongType(), True),
])


def make_df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def test_create_and_read_empty(spark, tmpdir_path):
    t = LakeTable.create(spark, f"{tmpdir_path}/t", SCHEMA, key_col="url", num_buckets=4)
    assert t.exists()
    assert t.current_version() == 0
    assert t.read().count() == 0
    with pytest.raises(ValueError):
        LakeTable.create(spark, f"{tmpdir_path}/t", SCHEMA)


def test_overwrite_and_time_travel(spark, tmpdir_path):
    t = LakeTable.create(spark, f"{tmpdir_path}/t", SCHEMA, key_col="url", num_buckets=4)
    t.overwrite(make_df(spark, [("a", 1), ("b", 2)]))
    t.overwrite(make_df(spark, [("c", 3)]))
    assert t.read().count() == 1
    assert t.read(version=1).count() == 2          # time travel
    assert t.read(version=0).count() == 0
    hist = t.history()
    assert [h["version"] for h in hist] == [0, 1, 2]


def test_atomic_commit_conflict(spark, tmpdir_path):
    t = LakeTable.create(spark, f"{tmpdir_path}/t", SCHEMA, num_buckets=2)
    snap = t.snapshot()
    t.commit(files=snap.files, summary={"operation": "noop"})
    # a second committer that read the old version loses the race:
    # the O_EXCL create of the same v-file must fail.
    path = os.path.join(t.meta_dir, "v1.json")
    with pytest.raises(FileExistsError):
        fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        os.close(fd)


def test_bucket_pruned_read(spark, tmpdir_path):
    t = LakeTable.create(spark, f"{tmpdir_path}/t", SCHEMA, key_col="url", num_buckets=4)
    t.overwrite(make_df(spark, [(f"u{i}", i) for i in range(100)]))
    snap = t.snapshot()
    buckets = {b for f in snap.files for b in f["buckets"]}
    assert len(buckets) > 1
    one = next(iter(buckets))
    pruned = t.read(buckets={one})
    full = t.read()
    assert 0 < pruned.count() < full.count()
    # pruned read only includes rows whose key hashes to that bucket
    bad = pruned.filter(t.bucket_expr() != one).count()
    assert bad == 0


def test_schema_evolution_add_and_widen(spark, tmpdir_path):
    t = LakeTable.create(spark, f"{tmpdir_path}/t", SCHEMA, key_col="url", num_buckets=2)
    t.overwrite(make_df(spark, [("a", 1)]))
    new = StructType([
        StructField("url", StringType(), False),
        StructField("n", DoubleType(), True),      # widen long -> double
        StructField("score", DoubleType(), True),  # add
    ])
    t.evolve_schema(new)
    df = t.read()
    assert [f.name for f in df.schema.fields] == ["url", "n", "score"]
    row = df.first()
    assert row["n"] == 1.0 and row["score"] is None
    # write in the new schema; old + new files coexist, reads conform both
    t2_df = spark.createDataFrame([("b", 2.5, 0.9)], new)
    entries = t.write_data(t2_df, t.current_version() + 1)
    snap = t.snapshot()
    t.commit(files=snap.files + entries, summary={"operation": "append"})
    out = {r["url"]: (r["n"], r["score"]) for r in t.read().collect()}
    assert out == {"a": (1.0, None), "b": (2.5, 0.9)}


def test_schema_evolution_rejects_drops_and_narrowing(spark, tmpdir_path):
    t = LakeTable.create(spark, f"{tmpdir_path}/t", SCHEMA, num_buckets=2)
    with pytest.raises(ValueError, match="drop"):
        t.evolve_schema(StructType([StructField("url", StringType(), False)]))
    with pytest.raises(ValueError, match="illegal type change"):
        t.evolve_schema(StructType([
            StructField("url", StringType(), False),
            StructField("n", StringType(), True),
        ]))


def test_compaction_preserves_state(spark, tmpdir_path):
    t = LakeTable.create(spark, f"{tmpdir_path}/t", SCHEMA, key_col="url", num_buckets=4)
    for i in range(3):
        df = make_df(spark, [(f"u{i}-{j}", j) for j in range(10)])
        entries = t.write_data(df, t.current_version() + 1)
        snap = t.snapshot()
        t.commit(files=snap.files + entries, summary={"operation": "append"})
    before = sorted((r["url"], r["n"]) for r in t.read().collect())
    n_files_before = len(t.snapshot().files)
    t.compact()
    after = sorted((r["url"], r["n"]) for r in t.read().collect())
    assert before == after
    assert len(t.snapshot().files) <= n_files_before


def test_conform_missing_extra_cast(spark):
    df = spark.createDataFrame([("a", "5", "junk")], "url string, n string, extra string")
    out = conform(df, SCHEMA)
    assert [f.name for f in out.schema.fields] == ["url", "n"]
    assert out.first()["n"] == 5


def test_change_feed_replays_to_same_state(spark, tmpdir_path):
    """CDF round-trip: the change rows read_changes() reports, replayed
    as change events into a FRESH table, reproduce the source table's
    final state exactly; per-commit change counts equal that commit's
    upserts+deletes; maintenance commits emit no changes."""
    import pyspark.sql.functions as F

    from tests.test_merge import make_table
    from tinyetl_spark import datagen
    from tinyetl_spark.lake import merge_apply

    t = make_table(spark, f"{tmpdir_path}/src", buckets=8)
    ev = datagen.change_events(spark, 1500, 200, seed=13)
    stats = []
    for i, mode in enumerate(["auto", "mor", "auto"]):
        stats.append(merge_apply(t, ev.filter(f"event_seq % 3 = {i}"), i,
                                 mode=mode))
    t.compact_deltas()          # maintenance: must not appear in the feed

    ch = t.read_changes(0)
    per_v = {r["_commit_version"]: r["count"]
             for r in ch.groupBy("_commit_version").count().collect()}
    for s in stats:
        assert per_v.get(s.snapshot_version, 0) == s.upserts + s.deletes
    assert set(per_v) == {s.snapshot_version for s in stats}

    # a bounded window: only the last commit's changes
    tail = t.read_changes(stats[-1].snapshot_version - 1,
                          stats[-1].snapshot_version)
    assert tail.count() == stats[-1].upserts + stats[-1].deletes

    # replay: change rows ARE change events (op from _change_type)
    t2 = make_table(spark, f"{tmpdir_path}/dst", buckets=4)
    for i, s in enumerate(stats):
        batch = (ch.filter(F.col("_commit_version") == s.snapshot_version)
                   .withColumn("op",
                               F.when(F.col("_change_type") == "delete",
                                      F.lit("delete"))
                                .otherwise(F.lit("update")))
                   .select("url", "warc_ts", "event_seq", "op", "html",
                           "lang"))
        merge_apply(t2, batch, i, extract=False)
    a = sorted((r["url"], r["event_seq"]) for r in t.read().collect())
    b = sorted((r["url"], r["event_seq"]) for r in t2.read().collect())
    assert a == b
