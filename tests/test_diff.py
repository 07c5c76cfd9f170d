"""Snapshot diff (lake/diff.py): net insert/update/delete change feed
between two table versions, vs a brute-force Python reference."""

import pyspark.sql.functions as F

from tinyetl_spark import datagen
from tinyetl_spark.lake import LakeTable, merge_apply
from tinyetl_spark.lake.diff import _changed_buckets, diff_snapshots
from tinyetl_spark.schema import PAGES_SCHEMA

import pytest


def make_table(spark, path, buckets=8):
    return LakeTable.create(spark, path, PAGES_SCHEMA, key_col="url",
                            num_buckets=buckets)


def state_dict(table, version):
    """Brute-force visible state: key -> payload tuple."""
    rows = table.read(version=version).collect()
    return {r["url"]: (r["warc_ts"], r["html"], r["text"], r["lang"],
                       r["event_seq"]) for r in rows}


def expected_diff(table, v_from, v_to):
    old, new = state_dict(table, v_from), state_dict(table, v_to)
    exp = {}
    for k in set(old) | set(new):
        if k not in old:
            exp[k] = ("insert", new[k])
        elif k not in new:
            exp[k] = ("delete", old[k])
        elif old[k] != new[k]:
            exp[k] = ("update", new[k])
    return exp


def actual_diff(table, v_from, v_to=None):
    rows = diff_snapshots(table, v_from, v_to).collect()
    return {r["url"]: (r["_change_type"],
                       (r["warc_ts"], r["html"], r["text"], r["lang"],
                        r["event_seq"])) for r in rows}


def test_diff_matches_brute_force(spark, tmpdir_path):
    t = make_table(spark, f"{tmpdir_path}/t")
    ev = datagen.change_events(spark, 3000, 300, seed=7)
    versions = []
    for i, (lo, hi) in enumerate([(0, 1000), (1000, 2000), (2000, 3000)]):
        merge_apply(t, ev.filter(f"event_seq >= {lo} and event_seq < {hi}"), i)
        versions.append(t.current_version())
    for v_from in versions[:-1]:
        assert actual_diff(t, v_from) == expected_diff(
            t, v_from, t.current_version())


def test_diff_classification_explicit(spark, tmpdir_path):
    """Hand-built insert / update / delete / unchanged, one of each."""
    import datetime as dt
    ts = dt.datetime(2026, 1, 1)
    t = make_table(spark, f"{tmpdir_path}/t", buckets=4)

    def batch(rows):
        return spark.createDataFrame(
            [(u, ts, None, None, "en", seq, op) for u, seq, op in rows],
            "url string, warc_ts timestamp, html binary, text string, "
            "lang string, event_seq long, op string")

    merge_apply(t, batch([("keep", 0, "update"), ("upd", 1, "update"),
                          ("gone", 2, "update")]), 0)
    v1 = t.current_version()
    merge_apply(t, batch([("upd", 3, "update"), ("gone", 4, "delete"),
                          ("new", 5, "update")]), 1)
    d = actual_diff(t, v1)
    assert {k: v[0] for k, v in d.items()} == {
        "upd": "update", "gone": "delete", "new": "insert"}
    assert d["upd"][1][4] == 3          # post-image for updates
    assert d["gone"][1][4] == 2         # pre-image for deletes
    assert "keep" not in d


def test_diff_immune_to_compaction(spark, tmpdir_path):
    t = make_table(spark, f"{tmpdir_path}/t")
    ev = datagen.change_events(spark, 1000, 150, seed=11)
    merge_apply(t, ev.filter("event_seq < 500"), 0)
    v1 = t.current_version()
    merge_apply(t, ev.filter("event_seq >= 500"), 1)
    v2 = t.current_version()
    t.compact()                    # bytes move, state doesn't
    assert diff_snapshots(t, v2).count() == 0
    assert actual_diff(t, v1, v2) == actual_diff(t, v1)   # same endpoint state
    assert actual_diff(t, v1) == expected_diff(t, v1, t.current_version())


def test_diff_bucket_pruning_reads_only_touched(spark, tmpdir_path):
    # sparse table (10 urls over 32 buckets) so merge takes the probed
    # sparse-COW path — the dense heuristic deliberately touch-alls
    t = make_table(spark, f"{tmpdir_path}/t", buckets=32)
    ev = datagen.change_events(spark, 500, 10, seed=3)
    merge_apply(t, ev.filter("event_seq < 450"), 0)
    v1 = t.current_version()
    one_url = ev.select("url").first()["url"]
    narrow = (ev.filter("event_seq >= 450")
                .filter(F.col("url") == one_url)
                .withColumn("warc_ts", F.col("warc_ts")
                            + F.expr("interval 10 hours"))
                .withColumn("event_seq", F.col("event_seq") + 10000))
    assert narrow.count() > 0
    merge_apply(t, narrow, 1)
    old_snap, new_snap = t.snapshot(v1), t.snapshot()
    changed = _changed_buckets(old_snap, new_snap)
    # path symmetric difference = exactly the files the narrow commit
    # added/replaced; their bucket union must be a strict subset of the
    # active buckets — that subset is all the diff will read
    touched = {b for f in new_snap.files for b in f["buckets"]
               if f["path"] not in {g["path"] for g in old_snap.files}}
    active = {b for f in old_snap.files for b in f["buckets"]}
    assert changed == touched
    assert changed and changed < active
    assert actual_diff(t, v1) == expected_diff(t, v1, t.current_version())


def test_diff_across_schema_evolution(spark, tmpdir_path):
    from pyspark.sql.types import (StringType, StructField, StructType)
    t = make_table(spark, f"{tmpdir_path}/t", buckets=4)
    ev = datagen.change_events(spark, 400, 80, seed=5)
    merge_apply(t, ev.filter("event_seq < 300"), 0)
    v1 = t.current_version()
    new_schema = StructType(
        t.snapshot().schema.fields
        + [StructField("mime", StringType(), True)])
    t.evolve_schema(new_schema)
    merge_apply(
        t,
        ev.filter("event_seq >= 300").withColumn("mime", F.lit("text/html")),
        1)
    d = diff_snapshots(t, v1)
    rows = {r["url"]: r for r in d.collect()}
    assert rows                                     # something changed
    assert "mime" in d.columns
    # every non-delete diff row carries the evolved column's post-image
    for r in rows.values():
        if r["_change_type"] != "delete":
            assert r["mime"] == "text/html"


def test_diff_across_rescale_disables_pruning_stays_exact(spark, tmpdir_path):
    t = make_table(spark, f"{tmpdir_path}/t", buckets=4)
    ev = datagen.change_events(spark, 1200, 200, seed=9)
    merge_apply(t, ev.filter("event_seq < 600"), 0)
    v1 = t.current_version()
    t.rescale_buckets(16)
    merge_apply(t, ev.filter("event_seq >= 600"), 1)
    assert _changed_buckets(t.snapshot(v1), t.snapshot()) is None
    assert actual_diff(t, v1) == expected_diff(t, v1, t.current_version())
    with pytest.raises(ValueError, match="bucket-count change"):
        diff_snapshots(t, v1, buckets={0})


def test_diff_column_projection(spark, tmpdir_path):
    """columns= restricts comparison+output; the scan must prune html."""
    t = make_table(spark, f"{tmpdir_path}/t", buckets=4)
    ev = datagen.change_events(spark, 800, 120, seed=13)
    merge_apply(t, ev.filter("event_seq < 500"), 0)
    v1 = t.current_version()
    merge_apply(t, ev.filter("event_seq >= 500"), 1)
    d = diff_snapshots(t, v1, columns=["event_seq"])
    assert d.columns == ["url", "event_seq", "_change_type",
                         "_from_version", "_to_version"]
    # event_seq is the unique winner id, so the narrow diff flags
    # exactly the keys the full diff flags
    full = actual_diff(t, v1)
    narrow = {r["url"]: (r["_change_type"], r["event_seq"])
              for r in d.collect()}
    assert narrow == {k: (v[0], v[1][4]) for k, v in full.items()}
    # projection reaches the parquet scan: html absent from ReadSchema
    import re
    plan = d._jdf.queryExecution().explainString(
        d._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"))
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    assert schemas and all("html" not in s for s in schemas)
    with pytest.raises(ValueError, match="not in the table payload"):
        diff_snapshots(t, v1, columns=["nope"])


def test_diff_empty_window_and_self(spark, tmpdir_path):
    t = make_table(spark, f"{tmpdir_path}/t", buckets=4)
    ev = datagen.change_events(spark, 500, 100, seed=1)
    merge_apply(t, ev, 0)
    v = t.current_version()
    assert diff_snapshots(t, v, v).count() == 0
    cols = diff_snapshots(t, v, v).columns
    assert cols[-3:] == ["_change_type", "_from_version", "_to_version"]
