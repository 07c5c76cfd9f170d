"""SQLite (stdlib, rowid-range partitioned scan) and HTTP(S) staging
source — the reference's DB/protocol connectors re-expressed Spark-side."""

import os
import sqlite3

import pytest

from tinyetl_spark.sources.files import detect_format, read_source, write_sink
from tinyetl_spark.sources.http import fetch_to_staging, read_http
from tinyetl_spark.sources.sqlite_py import (read_sqlite, split_sqlite_uri,
                                             write_sqlite)


def make_db(path, n=500):
    conn = sqlite3.connect(path)
    conn.execute("CREATE TABLE items (id INTEGER, name TEXT, score REAL, "
                 "blob BLOB)")
    conn.executemany(
        "INSERT INTO items VALUES (?, ?, ?, ?)",
        [(i, f"name-{i}", i / 7.0, bytes([i % 256])) for i in range(n)])
    conn.commit()
    conn.close()


def test_sqlite_partitioned_read(spark, tmpdir_path):
    db = f"{tmpdir_path}/d.sqlite"
    make_db(db, 500)
    df = read_sqlite(spark, db, "items", num_partitions=4)
    assert df.rdd.getNumPartitions() == 4          # ranged, parallel
    assert df.count() == 500
    types = {f.name: f.dataType.typeName() for f in df.schema.fields}
    assert types == {"id": "long", "name": "string", "score": "double",
                     "blob": "binary"}
    rows = {r["id"]: r for r in df.collect()}
    assert rows[13]["name"] == "name-13"
    assert abs(rows[13]["score"] - 13 / 7.0) < 1e-9
    assert bytes(rows[13]["blob"]) == bytes([13])


def test_sqlite_partition_column_bounds(spark, tmpdir_path):
    db = f"{tmpdir_path}/d.sqlite"
    make_db(db, 100)
    df = read_sqlite(spark, db, "items", num_partitions=3,
                     partition_column="id", lower_bound=10, upper_bound=29)
    assert df.count() == 20                        # bounds prune the scan
    assert {r["id"] for r in df.collect()} == set(range(10, 30))


def test_sqlite_roundtrip_through_dispatch(spark, tmpdir_path):
    """reference connectors/sqlite.rs:50-212 — full write->read loop via
    the 'db.sqlite#table' URI shape the config layer produces."""
    df = spark.createDataFrame(
        [(1, "a", 2.5), (2, "b", -1.0), (3, None, 0.0)],
        "id long, s string, v double")
    uri = f"{tmpdir_path}/rt.sqlite#t1"
    write_sink(df, uri)
    back = read_source(spark, uri)
    assert sorted((r["id"], r["s"], r["v"]) for r in back.collect()) == \
           [(1, "a", 2.5), (2, "b", -1.0), (3, None, 0.0)]
    # append-first lifecycle; truncate replaces
    write_sink(df, uri)
    assert read_source(spark, uri).count() == 6
    write_sink(df, uri, truncate=True)
    assert read_source(spark, uri).count() == 3


def test_sqlite_uri_split():
    assert split_sqlite_uri("db.sqlite#t") == ("db.sqlite", "t")
    assert split_sqlite_uri("/x/y.db") == ("/x/y.db", None)
    assert detect_format("db.sqlite#t") == "sqlite"
    assert detect_format("sqlite:///x/y.sqlite#t") == "sqlite"


def test_http_fetch_headers_and_sniff(tmpdir_path):
    """file:// exercises the same urllib path as https (no network in the
    sandbox); header/auth plumbing is verified on the Request object."""
    src = f"{tmpdir_path}/data.csv"
    with open(src, "w") as f:
        f.write("id,name\n1,a\n2,b\n")
    path = fetch_to_staging(f"file://{src}")
    assert path.endswith(".csv") and os.path.exists(path)
    # extension-less URL: content sniff decides
    src2 = f"{tmpdir_path}/payload"
    with open(src2, "w") as f:
        f.write('[{"a": 1}, {"a": 2}]')
    assert fetch_to_staging(f"file://{src2}").endswith(".json")

    import urllib.request
    captured = {}
    real_open = urllib.request.urlopen

    def spy(req, timeout=None):
        captured.update(dict(req.header_items()))
        return real_open(req, timeout=timeout)

    urllib.request.urlopen, orig = spy, urllib.request.urlopen
    try:
        fetch_to_staging(f"file://{src}", headers={"X-Trace": "42"},
                         basic_auth=("bob", "pw"))
        assert captured.get("X-trace") == "42"
        assert captured.get("Authorization", "").startswith("Basic ")
        captured.clear()
        fetch_to_staging(f"file://{src}", bearer_token="tok123")
        assert captured.get("Authorization") == "Bearer tok123"
    finally:
        urllib.request.urlopen = orig


def test_http_read_source_end_to_end(spark, tmpdir_path):
    src = f"{tmpdir_path}/data.csv"
    with open(src, "w") as f:
        f.write("id,joined\n1,2023-01-05\n2,2023-02-06\n")
    # the sandbox has no network: drive the protocol layer with a file://
    # URL (same urllib path, same staging + dispatch as http/https)
    df = read_http(spark, f"file://{src}", options={}, date_sniff=True)
    assert df.count() == 2
    types = {f.name: f.dataType.typeName() for f in df.schema.fields}
    assert types["joined"] in ("timestamp", "date")


def test_duckdb_partitioned_roundtrip(spark, tmpdir_path):
    """reference connectors/duckdb.rs:116-354 — rowid-ranged parallel scan
    + single-writer sink through the db.duckdb#table URI shape."""
    df = spark.createDataFrame(
        [(i, f"n{i}", i / 7.0) for i in range(300)],
        "id long, name string, score double")
    uri = f"{tmpdir_path}/d.duckdb#items"
    write_sink(df, uri)
    back = read_source(spark, uri, options={"num_partitions": "4"})
    assert back.rdd.getNumPartitions() == 4
    assert back.count() == 300
    r = {x["id"]: x for x in back.collect()}
    assert r[13]["name"] == "n13" and abs(r[13]["score"] - 13 / 7.0) < 1e-9
    # append + truncate lifecycle
    write_sink(df, uri)
    assert read_source(spark, uri).count() == 600
    write_sink(df, uri, truncate=True)
    assert read_source(spark, uri).count() == 300
    assert detect_format("x.duckdb#t") == "duckdb"


def test_sqlite_custom_query_source(spark, tmpdir_path):
    """reference with_query (mssql.rs custom-query): arbitrary SQL as the
    source, partitioned when a numeric column is named."""
    db = f"{tmpdir_path}/q.sqlite"
    make_db(db, 200)
    q = ("select id, upper(name) as uname, score * 2 as s2 "
         "from items where id % 2 = 0")
    df = read_source(spark, db, options={"query": q})
    assert df.count() == 100
    r = {x["id"]: x for x in df.collect()}
    assert r[10]["uname"] == "NAME-10" and abs(r[10]["s2"] - 20 / 7.0) < 1e-9
    # partitioned variant
    dfp = read_source(spark, db, options={"query": q, "partition_column": "id",
                                          "num_partitions": "4"})
    assert dfp.rdd.getNumPartitions() == 4
    assert dfp.count() == 100
