"""File-level zone maps (per-file warc_ts min/max in the manifest) and
time-window reads that prune whole files without IO."""

from datetime import datetime, timezone

import pyspark.sql.functions as F

from tinyetl_spark.lake import LakeTable, merge_apply
from tinyetl_spark.schema import PAGES_SCHEMA

SCH = ("event_seq long, url string, warc_ts timestamp, op string, "
       "html binary, lang string")


def ts(day):
    return datetime(2025, 1, day)


def mk_events(spark, seq0, day, n=40):
    rows = [(seq0 + i, f"https://z.example/{i}", ts(day), "update",
             b"<p>x</p>", "en") for i in range(n)]
    return spark.createDataFrame(rows, SCH)


def _us(day):
    return int(ts(day).replace(tzinfo=timezone.utc).timestamp() * 1_000_000)


def test_merge_records_ts_zone_map(spark, tmpdir_path):
    t = LakeTable.create(spark, f"{tmpdir_path}/t", PAGES_SCHEMA,
                         key_col="url", num_buckets=4)
    merge_apply(t, mk_events(spark, 0, day=1), 0)
    for f in t.snapshot().files:
        lo, hi = f["ts_range"]
        assert lo == hi == _us(1)


def test_ts_range_read_prunes_files_and_filters_rows(spark, tmpdir_path):
    """Three merges on distinct days into DISJOINT buckets (time-
    clustered files — the shape zone maps exist for); a one-day window
    must read ONLY that day's files (observable via inputFiles) and
    return exactly its rows."""
    t = LakeTable.create(spark, f"{tmpdir_path}/t", PAGES_SCHEMA,
                         key_col="url", num_buckets=4)
    # craft each day's urls to hash into its own bucket, so a day's COW
    # rewrite never merges another day's rows into its files
    cand = (spark.range(0, 600)
            .select(F.concat(F.lit("https://z.example/"),
                             F.col("id")).alias("url"))
            .withColumn("b", F.pmod(F.xxhash64("url"), F.lit(4))))
    by_bucket: dict[int, list[str]] = {}
    for r in cand.collect():
        by_bucket.setdefault(int(r["b"]), []).append(r["url"])
    day_urls = {1: by_bucket[0][:30], 10: by_bucket[1][:30],
                20: by_bucket[2][:30]}
    for i, day in enumerate([1, 10, 20]):
        rows = [(1000 * i + k, u, ts(day), "update", b"<p>x</p>", "en")
                for k, u in enumerate(day_urls[day])]
        merge_apply(t, spark.createDataFrame(rows, SCH), i)

    full = t.read()
    win = t.read(ts_range=(ts(9), ts(11)))
    assert win.count() == 30
    assert {r["url"] for r in win.select("url").collect()} \
        == set(day_urls[10])
    # file pruning happened: the windowed scan reads fewer parquet files
    assert len(win.inputFiles()) < len(full.inputFiles())
    # every read file's manifest range intersects the window
    snap = t.snapshot()
    byp = {f["path"]: f for f in snap.files}
    for p in win.inputFiles():
        path = p[7:] if p.startswith("file://") else p
        lo, hi = byp[path]["ts_range"]
        assert lo <= _us(11) and hi >= _us(9)
    # open-ended windows
    assert t.read(ts_range=(ts(15), None)).count() == 30
    assert t.read(ts_range=(None, ts(2))).count() == 30
    # equality of window read vs filter-on-full (value-level oracle)
    a = sorted((r["url"], r["event_seq"]) for r in win.collect())
    b = sorted((r["url"], r["event_seq"]) for r in
               full.filter((F.col("warc_ts") >= F.lit(ts(9)))
                           & (F.col("warc_ts") <= F.lit(ts(11)))).collect())
    assert a == b
    # epoch-µs int bounds: accepted by the PRUNER but formerly crashed
    # the residual row filter with DATATYPE_MISMATCH (round-5 advice) —
    # must now work end-to-end and agree with the datetime window
    win_us = t.read(ts_range=(_us(9), _us(11)))
    assert sorted((r["url"], r["event_seq"]) for r in win_us.collect()) == a
    assert t.read(ts_range=(_us(15), None)).count() == 30
    assert t.read(ts_range=(None, _us(2))).count() == 30


def test_ts_range_correct_with_mor_deltas(spark, tmpdir_path):
    """A MOR delta OUTSIDE the window shadows a base row INSIDE it: the
    shadowed version must NOT resurface in the window read (clean-only
    pruning), and compaction keeps the zone map."""
    t = LakeTable.create(spark, f"{tmpdir_path}/t", PAGES_SCHEMA,
                         key_col="url", num_buckets=2)
    base = [(k, f"https://m.example/{k}", ts(5), "update", b"<p>v1</p>", "en")
            for k in range(20)]
    merge_apply(t, spark.createDataFrame(base, SCH), 0)
    # newer versions (day 25) for half the urls, applied as MOR deltas
    newer = [(100 + k, f"https://m.example/{k}", ts(25), "update",
              b"<p>v2</p>", "en") for k in range(10)]
    merge_apply(t, spark.createDataFrame(newer, SCH), 1, mode="mor")

    win = t.read(ts_range=(ts(1), ts(10)))
    got = {r["url"]: r["event_seq"] for r in win.collect()}
    # urls 0-9 have a newer out-of-window version -> excluded entirely;
    # urls 10-19 still current at day 5 -> included
    assert set(got) == {f"https://m.example/{k}" for k in range(10, 20)}
    assert all(v < 100 for v in got.values())

    t.compact_deltas()
    snap = t.snapshot()
    assert not any(f.get("delta") for f in snap.files)
    assert all(f.get("ts_range") for f in snap.files)
    win2 = {r["url"]: r["event_seq"]
            for r in t.read(ts_range=(ts(1), ts(10))).collect()}
    assert win2 == got
