"""WARC source/sink: roundtrip, gzip members, corrupt tails, CDC adapter."""
import gzip
import os

import pyspark.sql.functions as F
import pytest

from tinyetl_spark.sources import warc as W


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, f"https://ex{i % 3}.org/p/{i}",
          f"<html><body>doc {i} body</body></html>",
          f"2026-01-0{1 + i % 5}T00:00:0{i % 10}Z")
         for i in range(20)],
        ["doc_id", "url", "payload", "warc_date"])


def _roundtrip(spark, docs, tmp_path, compress):
    out = str(tmp_path / ("gz" if compress else "plain"))
    n = W.write_warc(docs.repartition(3), out, compress=compress)
    assert n == 20
    exts = {f.rsplit(".", 1)[-1] for f in os.listdir(out)}
    assert exts == ({"gz"} if compress else {"warc"})
    back = W.read_warc(spark, out)
    rows = {r["url"]: r for r in back.collect()}
    assert len(rows) == 20
    src = {r["url"]: r for r in docs.collect()}
    for url, r in rows.items():
        assert bytes(r["payload"]).decode() == src[url]["payload"]
        assert r["content_length"] == len(src[url]["payload"])
        assert r["warc_type"] == "response"
        assert r["warc_date"] == src[url]["warc_date"]
        assert r["record_id"].startswith("<urn:uuid:")
    return back


def test_warc_roundtrip_plain(spark, docs, tmp_path):
    _roundtrip(spark, docs, tmp_path, compress=False)


def test_warc_roundtrip_gzip(spark, docs, tmp_path):
    _roundtrip(spark, docs, tmp_path, compress=True)


def test_warc_multi_member_gzip(spark, tmp_path):
    # Common-Crawl layout: each record its OWN gzip member, concatenated
    recs = [W.format_warc_record(f"https://cc.org/{i}", "response",
                                 "2026-01-01T00:00:00Z", "text/html",
                                 f"body {i}".encode(), f"<urn:uuid:{i}>")
            for i in range(4)]
    blob = b"".join(gzip.compress(r, mtime=0) for r in recs)
    d = tmp_path / "cc"
    d.mkdir()
    (d / "members.warc.gz").write_bytes(blob)
    back = W.read_warc(spark, str(d)).orderBy("url").collect()
    assert [bytes(r["payload"]).decode() for r in back] == [
        "body 0", "body 1", "body 2", "body 3"]


def test_warc_truncated_tail_and_type_filter(spark, tmp_path):
    good = W.format_warc_record("https://a.org/1", "response",
                                "2026-01-01T00:00:00Z", "text/html",
                                b"alpha", "<urn:uuid:1>")
    req = W.format_warc_record("https://a.org/1", "request",
                               "2026-01-01T00:00:00Z", "text/plain",
                               b"GET /1", "<urn:uuid:1r>")
    bad = W.format_warc_record("https://a.org/2", "response",
                               "2026-01-01T00:00:00Z", "text/html",
                               b"omega", "<urn:uuid:2>")[:-10]  # cut payload
    d = tmp_path / "trunc"
    d.mkdir()
    (d / "t.warc").write_bytes(good + req + bad)
    all_recs = W.read_warc(spark, str(d)).collect()
    assert {r["warc_type"] for r in all_recs} == {"response", "request"}
    resp = W.read_warc(spark, str(d), warc_types=("response",)).collect()
    assert len(resp) == 1 and bytes(resp[0]["payload"]) == b"alpha"


def test_warc_to_change_events_merges(spark, docs, tmp_path):
    import tempfile

    from tinyetl_spark.lake import LakeTable, merge_apply
    from tinyetl_spark.schema import EVENTS_SCHEMA, PAGES_SCHEMA
    out = str(tmp_path / "crawl")
    W.write_warc(docs, out, compress=True)
    ev = W.warc_to_change_events(W.read_warc(spark, str(out)))
    assert [f.name for f in ev.schema.fields] == \
        [f.name for f in EVENTS_SCHEMA.fields]
    t = LakeTable.create(spark, tempfile.mkdtemp() + "/pages",
                         PAGES_SCHEMA, key_col="url", num_buckets=4)
    stats = merge_apply(t, ev, 0)
    assert stats.upserts == 20 and stats.deletes == 0
    got = t.read().select("url", "html").collect()
    assert len(got) == 20
    src = {r["url"]: r["payload"] for r in docs.collect()}
    for r in got:
        assert bytes(r["html"]).decode() == src[r["url"]]
