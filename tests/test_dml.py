"""Row-level DML (lake/dml.py): DELETE FROM / UPDATE WHERE routed
through the merge path — state, tombstones, change feed and replication
all stay consistent."""

import pyspark.sql.functions as F

from tinyetl_spark import datagen
from tinyetl_spark.lake import LakeTable, merge_apply
from tinyetl_spark.lake.dml import delete_where, update_where
from tinyetl_spark.schema import PAGES_SCHEMA


def make_table(spark, path, n=600, urls=80, seed=17):
    t = LakeTable.create(spark, path, PAGES_SCHEMA, key_col="url",
                         num_buckets=8)
    ev = datagen.change_events(spark, n, urls, seed=seed)
    merge_apply(t, ev.filter("event_seq < 300"), 0)
    merge_apply(t, ev.filter("event_seq >= 300"), 1)
    return t, ev


def test_delete_where_erases_matches_only(spark, tmpdir_path):
    t, _ = make_table(spark, f"{tmpdir_path}/t")
    before = t.read()
    n_match = before.filter("url like '%7'").count()
    n_total = before.count()
    assert 0 < n_match < n_total

    s = delete_where(t, "url like '%7'")
    assert s.deletes == n_match and s.upserts == 0
    after = t.read()
    assert after.count() == n_total - n_match
    assert after.filter("url like '%7'").count() == 0


def test_delete_where_rerun_is_noop(spark, tmpdir_path):
    t, _ = make_table(spark, f"{tmpdir_path}/t")
    delete_where(t, "url like '%3'")
    n = t.read().count()
    s2 = delete_where(t, "url like '%3'")
    assert s2.deletes == 0 and t.read().count() == n


def test_delete_tombstone_blocks_late_resurrection(spark, tmpdir_path):
    """A late out-of-order event OLDER than the erased row must not
    resurrect it — the DML tombstone carries (row ts, seq+1)."""
    t, ev = make_table(spark, f"{tmpdir_path}/t")
    victim = t.read().filter("url like '%1'").limit(1).collect()[0]
    delete_where(t, f"url = '{victim['url']}'")
    late = spark.createDataFrame(
        [(victim["event_seq"] - 1 if victim["event_seq"] > 0 else 0,
          victim["url"], victim["warc_ts"], "update",
          bytearray(b"<p>zombie</p>"), "en")],
        "event_seq long, url string, warc_ts timestamp, op string, "
        "html binary, lang string")
    merge_apply(t, late, 99, stream_id="late")
    assert t.read().filter(f"url = '{victim['url']}'").count() == 0


def test_update_where_rewrites_matches_only(spark, tmpdir_path):
    t, _ = make_table(spark, f"{tmpdir_path}/t")
    before = {r["url"]: (r["text"], r["lang"])
              for r in t.read().select("url", "text", "lang").collect()}
    n_match = sum(1 for u in before if u.endswith("5"))
    assert n_match > 0

    s = update_where(t, "url like '%5'", {"lang": "'xx'",
                                          "text": "upper(text)"})
    assert s.upserts == n_match and s.deletes == 0
    after = {r["url"]: (r["text"], r["lang"])
             for r in t.read().select("url", "text", "lang").collect()}
    assert set(after) == set(before)            # no rows appear/vanish
    for u, (txt, lang) in after.items():
        if u.endswith("5"):
            assert lang == "xx" and txt == before[u][0].upper()
        else:
            assert (txt, lang) == before[u]


def test_update_where_rejects_key_and_system_columns(spark, tmpdir_path):
    t, _ = make_table(spark, f"{tmpdir_path}/t", n=100, urls=20)
    for col in ("url", "warc_ts", "event_seq", "_deleted"):
        try:
            update_where(t, "true", {col: "'x'"})
            assert False, col
        except ValueError:
            pass
    try:
        update_where(t, "true", {"nope": "'x'"})
        assert False
    except ValueError:
        pass


def test_dml_flows_through_change_feed_to_mirror(spark, tmpdir_path):
    """THE reason DML rides the merge path: a replicate() mirror synced
    before the DML reconverges after it — deletes and updates both."""
    from tinyetl_spark.streaming.pipeline import replicate
    t, _ = make_table(spark, f"{tmpdir_path}/src")
    LakeTable.create(spark, f"{tmpdir_path}/dst", PAGES_SCHEMA,
                     key_col="url", num_buckets=8)
    ck = f"{tmpdir_path}/ck"
    replicate(spark, f"{tmpdir_path}/src", f"{tmpdir_path}/dst", ck)

    delete_where(t, "url like '%9'")
    update_where(t, "url like '%2'", {"lang": "'fr'"})
    replicate(spark, f"{tmpdir_path}/src", f"{tmpdir_path}/dst", ck)

    s = t.read().select("url", "event_seq", "warc_ts", "text", "lang")
    d = (LakeTable(spark, f"{tmpdir_path}/dst").read()
         .select("url", "event_seq", "warc_ts", "text", "lang"))
    assert s.exceptAll(d).count() == 0 and d.exceptAll(s).count() == 0
    assert d.filter("url like '%9'").count() == 0
    assert (d.filter("url like '%2'").select("lang").distinct().collect()
            == [("fr",)] or
            d.filter("url like '%2'").count() == 0)


def test_dml_survives_compaction_and_time_travel(spark, tmpdir_path):
    t, _ = make_table(spark, f"{tmpdir_path}/t")
    v_before = t.current_version()
    n_before = t.read().count()
    delete_where(t, "url like '%4'")
    t.compact()
    assert t.read(version=v_before).count() == n_before  # history intact
    assert t.read().filter("url like '%4'").count() == 0


def test_transform_rows_reextracts_text(spark, tmpdir_path):
    """The reprocessing shape: blank out text, then re-derive it from
    stored html via the engine's extractor (extract=True, fn=None) —
    bytes must come back identical to the original extraction."""
    from tinyetl_spark.lake.dml import transform_rows, update_where
    t, _ = make_table(spark, f"{tmpdir_path}/t")
    orig = {r["url"]: r["text"] for r in
            t.read().select("url", "text").collect()}
    update_where(t, "true", {"text": "'corrupted'"})
    assert set(r["text"] for r in
               t.read().select("text").collect()) == {"corrupted"}
    s = transform_rows(t, "html is not null", None, extract=True)
    assert s.upserts > 0
    after = {r["url"]: r["text"] for r in
             t.read().select("url", "text").collect()}
    assert after == orig


def test_transform_rows_custom_fn(spark, tmpdir_path):
    from tinyetl_spark.lake.dml import transform_rows
    t, _ = make_table(spark, f"{tmpdir_path}/t")
    before = {r["url"]: r["lang"] for r in
              t.read().select("url", "lang").collect()}
    n_match = sum(1 for u in before if u.endswith("6"))
    s = transform_rows(
        t, "url like '%6'",
        lambda df: df.withColumn("lang", F.upper("lang")))
    assert s.upserts == n_match > 0
    after = {r["url"]: r["lang"] for r in
             t.read().select("url", "lang").collect()}
    for u, lang in after.items():
        want = before[u].upper() if u.endswith("6") else before[u]
        assert lang == want, u


def test_transform_rows_guards_identity_columns(spark, tmpdir_path):
    from tinyetl_spark.lake.dml import transform_rows
    t, _ = make_table(spark, f"{tmpdir_path}/t", n=100, urls=20)
    try:
        transform_rows(t, "true", lambda df: df.drop("warc_ts"))
        assert False
    except ValueError:
        pass
