"""MERGE-apply semantics: LWW convergence vs brute-force oracle,
idempotency, epoch fencing, tombstones vs late data, datagen determinism."""

import pyspark.sql.functions as F
from pyspark.sql import Window

from tinyetl_spark import datagen
from tinyetl_spark.lake import LakeTable, merge_apply
from tinyetl_spark.schema import PAGES_SCHEMA


def brute_force_state(ev):
    """Independent oracle: winning event per url over the WHOLE stream,
    deletes removed."""
    w = Window.partitionBy("url").orderBy(F.desc("warc_ts"), F.desc("event_seq"))
    return (ev.withColumn("rn", F.row_number().over(w))
              .filter("rn = 1 and op <> 'delete'")
              .select("url", "event_seq"))


def assert_state_equal(table, ev):
    final = table.read().select("url", "event_seq")
    oracle = brute_force_state(ev)
    assert final.exceptAll(oracle).count() == 0
    assert oracle.exceptAll(final).count() == 0


def make_table(spark, path, buckets=8):
    return LakeTable.create(spark, path, PAGES_SCHEMA, key_col="url",
                            num_buckets=buckets)


def test_datagen_deterministic(spark):
    a = datagen.change_events(spark, 500, 100, seed=42, num_partitions=2)
    b = datagen.change_events(spark, 500, 100, seed=42, num_partitions=8)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    c = datagen.change_events(spark, 500, 100, seed=43)
    assert c.exceptAll(a).count() > 0


def test_merge_converges_to_oracle(spark, tmpdir_path):
    t = make_table(spark, f"{tmpdir_path}/t")
    ev = datagen.change_events(spark, 3000, 400, seed=42)
    for i, (lo, hi) in enumerate([(0, 1000), (1000, 2000), (2000, 3000)]):
        merge_apply(t, ev.filter(f"event_seq >= {lo} and event_seq < {hi}"), i,
                    )
    assert_state_equal(t, ev)


def test_merge_idempotent_reapply(spark, tmpdir_path):
    """Re-applying an already-applied batch under a NEW batch_id (fence
    passes) must not change state — LWW on (warc_ts, event_seq) is the
    idempotency guarantee."""
    t = make_table(spark, f"{tmpdir_path}/t")
    ev = datagen.change_events(spark, 1000, 200, seed=42)
    merge_apply(t, ev, 0)
    before = sorted((r["url"], r["event_seq"]) for r in t.read().collect())
    merge_apply(t, ev, 1)  # replay, new epoch
    after = sorted((r["url"], r["event_seq"]) for r in t.read().collect())
    assert before == after


def test_epoch_fence_skips_replayed_batch(spark, tmpdir_path):
    t = make_table(spark, f"{tmpdir_path}/t")
    ev = datagen.change_events(spark, 500, 100, seed=42)
    s0 = merge_apply(t, ev, 5)
    assert not s0.fenced
    v = t.current_version()
    s1 = merge_apply(t, ev, 5)      # same batch_id → fenced, no commit
    assert s1.fenced
    assert t.current_version() == v
    s2 = merge_apply(t, ev, 3)      # older batch_id → also fenced
    assert s2.fenced


def test_fences_are_per_stream(spark, tmpdir_path):
    t = make_table(spark, f"{tmpdir_path}/t")
    ev = datagen.change_events(spark, 200, 50, seed=42)
    merge_apply(t, ev, 0, stream_id="s1")
    s = merge_apply(t, ev, 0, stream_id="s2")
    assert not s.fenced
    assert merge_apply(t, ev, 0, stream_id="s1").fenced


def test_tombstone_blocks_late_resurrection(spark, tmpdir_path):
    """A delete wins LWW; an out-of-order upsert with an OLDER (warc_ts,
    event_seq) arriving in a later batch must NOT resurrect the row."""
    t = make_table(spark, f"{tmpdir_path}/t", buckets=2)
    from datetime import datetime
    ts = lambda s: datetime(2025, 1, 1, 0, 0, s)
    rows = [
        (10, "https://x/1", ts(10), "delete", None, "en"),
        (5, "https://x/1", ts(5), "update", b"<p>old</p>", "en"),
        (7, "https://x/2", ts(7), "insert", b"<p>keep</p>", "en"),
    ]
    df = spark.createDataFrame(
        rows, "event_seq long, url string, warc_ts timestamp, op string, html binary, lang string")
    merge_apply(t, df.filter("event_seq = 10"), 0)            # delete first
    merge_apply(t, df.filter("event_seq in (5, 7)"), 1)       # late upsert after
    urls = {r["url"] for r in t.read().select("url").collect()}
    assert urls == {"https://x/2"}
    # tombstone row still present internally
    tomb = t.read(include_tombstones=True).filter("_deleted").count()
    assert tomb == 1


def test_delete_then_newer_insert_resurrects(spark, tmpdir_path):
    t = make_table(spark, f"{tmpdir_path}/t", buckets=2)
    from datetime import datetime
    ts = lambda s: datetime(2025, 1, 1, 0, 0, s)
    df = spark.createDataFrame(
        [(1, "https://x/1", ts(1), "delete", None, "en"),
         (2, "https://x/1", ts(2), "insert", b"<p>new</p>", "en")],
        "event_seq long, url string, warc_ts timestamp, op string, html binary, lang string")
    merge_apply(t, df.filter("event_seq = 1"), 0)
    merge_apply(t, df.filter("event_seq = 2"), 1)
    rows = t.read().collect()
    assert len(rows) == 1 and rows[0]["event_seq"] == 2


def test_batch_split_invariance(spark, tmpdir_path):
    """Final state must not depend on how the stream is chopped into
    micro-batches."""
    ev = datagen.change_events(spark, 1200, 150, seed=9)
    t1 = make_table(spark, f"{tmpdir_path}/one")
    merge_apply(t1, ev, 0)
    t2 = make_table(spark, f"{tmpdir_path}/many")
    for i in range(6):
        merge_apply(t2, ev.filter(f"event_seq % 6 = {i}"), i)  # arbitrary interleave
    a = sorted((r["url"], r["event_seq"]) for r in t1.read().collect())
    b = sorted((r["url"], r["event_seq"]) for r in t2.read().collect())
    assert a == b


def test_merge_stats_and_lineage(spark, tmpdir_path):
    t = make_table(spark, f"{tmpdir_path}/t")
    ev = datagen.change_events(spark, 1000, 100, seed=42, hot_fraction=0.3)
    s = merge_apply(t, ev, 0)
    assert s.events_in == 1000
    assert s.upserts + s.deletes + s.dedup_drops == 1000
    assert s.skew_ratio >= 1.0
    snap = t.snapshot()
    assert snap.summary["events_in"] == 1000
    assert sum(e["events"] for e in snap.lineage) == s.upserts + s.deletes
