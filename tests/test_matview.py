"""Incremental materialized aggregate views (streaming/matview.py)."""

import pyspark.sql.functions as F

from tinyetl_spark import datagen
from tinyetl_spark.lake import LakeTable, merge_apply
from tinyetl_spark.schema import PAGES_SCHEMA
from tinyetl_spark.streaming.matview import (create_view, domain_of,
                                             refresh_view)


def _mk_events(spark, n, urls, seed):
    """Change events whose urls spread over several domains (datagen's
    default urls share one host, which makes a one-group view)."""
    ev = datagen.change_events(spark, n, urls, seed=seed)
    return ev.withColumn(
        "url", F.concat(F.lit("https://d"),
                        (F.xxhash64("url") % 7 + 7) % 7,
                        F.lit(".example/p/"), F.md5("url")))


def _expected(src: LakeTable):
    return sorted(
        (r["url"], r["page_count"], r["text_bytes"]) for r in
        (src.read()
            .withColumn("_g", domain_of(F.col("url")))
            .groupBy("_g")
            .agg(F.count(F.lit(1)).cast("long").alias("page_count"),
                 F.coalesce(F.sum(F.length("text")), F.lit(0))
                  .cast("long").alias("text_bytes"))
            .select(F.col("_g").alias("url"), "page_count", "text_bytes")
            .collect()))


def _got(view: LakeTable):
    return sorted((r["url"], r["page_count"], r["text_bytes"])
                  for r in view.read()
                  .select("url", "page_count", "text_bytes").collect())


def test_matview_incremental_equals_full_recompute(spark, tmpdir_path):
    src = LakeTable.create(spark, f"{tmpdir_path}/src", PAGES_SCHEMA,
                           key_col="url", num_buckets=4)
    view = create_view(spark, f"{tmpdir_path}/view")
    ev = _mk_events(spark, 600, 120, seed=5)
    for i in range(3):
        merge_apply(src, ev.filter(f"event_seq % 3 = {i}"), i)
        s = refresh_view(spark, src, view)
        assert s is not None and not s.fenced
        assert _got(view) == _expected(src)   # exact after EVERY refresh

    # already current -> no-op, and a replayed refresh fences
    assert refresh_view(spark, src, view) is None


def test_matview_delete_empties_group(spark, tmpdir_path):
    src = LakeTable.create(spark, f"{tmpdir_path}/src", PAGES_SCHEMA,
                           key_col="url", num_buckets=4)
    view = create_view(spark, f"{tmpdir_path}/view")
    ev = _mk_events(spark, 300, 60, seed=9)
    merge_apply(src, ev, 0)
    refresh_view(spark, src, view)
    before = dict((u, c) for u, c, _ in _got(view))
    assert len(before) > 1

    # delete EVERY live page of one domain -> its view row must vanish
    victim = sorted(before)[0]
    live = src.read().filter(domain_of(F.col("url")) == victim)
    mx = src.read().agg(F.max("event_seq")).collect()[0][0]
    dels = live.select(
        "url",
        (F.col("warc_ts") + F.expr("interval 1 hour")).alias("warc_ts"),
        F.lit(None).cast("binary").alias("html"),
        F.lit(None).cast("string").alias("lang"),
        (F.lit(mx) + F.monotonically_increasing_id() + 1)
         .alias("event_seq"),
        F.lit("delete").alias("op"))
    merge_apply(src, dels, 1)
    refresh_view(spark, src, view)
    after = dict((u, c) for u, c, _ in _got(view))
    assert victim not in after
    assert _got(view) == _expected(src)


def test_matview_refresh_covers_multiple_src_commits(spark, tmpdir_path):
    src = LakeTable.create(spark, f"{tmpdir_path}/src", PAGES_SCHEMA,
                           key_col="url", num_buckets=4)
    view = create_view(spark, f"{tmpdir_path}/view")
    ev = _mk_events(spark, 400, 80, seed=13)
    for i in range(4):                       # 4 commits, ONE refresh
        merge_apply(src, ev.filter(f"event_seq % 4 = {i}"), i)
    s = refresh_view(spark, src, view)
    assert s is not None
    assert _got(view) == _expected(src)


def test_pipeline_refreshes_matview_inline(spark, tmpdir_path):
    """matview_dirs: the stream refreshes the view after each batch and
    the final view equals a from-scratch recompute."""
    from tinyetl_spark.sources.eventlog import append_events
    from tinyetl_spark.streaming.pipeline import run_to_completion
    src_path = f"{tmpdir_path}/src"
    LakeTable.create(spark, src_path, PAGES_SCHEMA,
                     key_col="url", num_buckets=4)
    view = create_view(spark, f"{tmpdir_path}/view")
    ev = _mk_events(spark, 500, 100, seed=17)
    append_events(ev, f"{tmpdir_path}/log", segment_partitions=4)
    run_to_completion(spark, f"{tmpdir_path}/log", src_path,
                      f"{tmpdir_path}/ckpt", max_files_per_trigger=2,
                      matview_dirs=[f"{tmpdir_path}/view"])
    src = LakeTable(spark, src_path)
    assert _got(view) == _expected(src)
    # view advanced past several source commits
    assert view.current_version() >= 2


def test_cli_materialize(spark, tmpdir_path):
    import os
    import subprocess
    import sys
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    src = LakeTable.create(spark, f"{tmpdir_path}/src", PAGES_SCHEMA,
                           key_col="url", num_buckets=4)
    merge_apply(src, _mk_events(spark, 200, 40, seed=3), 0)
    env = {**os.environ, "PYTHONPATH": repo, "SPARK_GRAFT_CPUS": "4"}
    args = [sys.executable, "-m", "tinyetl_spark.cli", "materialize",
            f"{tmpdir_path}/src", f"{tmpdir_path}/view"]
    p = subprocess.run(args, capture_output=True, text=True,
                       cwd=repo, env=env)
    assert p.returncode == 0, p.stderr
    assert "refreshed" in p.stdout and "group upserts" in p.stdout
    view = LakeTable(spark, f"{tmpdir_path}/view")
    assert _got(view) == _expected(src)
