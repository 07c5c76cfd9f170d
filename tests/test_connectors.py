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


def _serve(handler_cls):
    import http.server
    import threading
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), handler_cls)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return srv


def test_http_retry_transient_and_fail_fast_permanent(tmpdir_path):
    """Transient 503s are retried with backoff until success; permanent
    4xx raises immediately without burning retries (loopback server —
    real sockets, no external network)."""
    import http.server
    import urllib.error

    import pytest as _pytest

    payload = b"id,name\n1,a\n2,b\n"
    state = {"fails": 2, "hits": 0}

    class H(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            state["hits"] += 1
            if self.path == "/gone":
                self.send_response(404)
                self.end_headers()
                return
            if state["fails"] > 0:
                state["fails"] -= 1
                self.send_response(503)
                self.end_headers()
                return
            self.send_response(200)
            self.send_header("Content-Type", "text/csv")
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)

        def log_message(self, *a):
            pass

    srv = _serve(H)
    try:
        base = f"http://127.0.0.1:{srv.server_port}"
        path = fetch_to_staging(f"{base}/data.csv", retries=4, backoff=0.02,
                                staging_dir=str(tmpdir_path))
        with open(path, "rb") as f:
            assert f.read() == payload
        assert state["hits"] == 3                 # 2x503 then success
        state["hits"] = 0
        with _pytest.raises(urllib.error.HTTPError):
            fetch_to_staging(f"{base}/gone", retries=4, backoff=0.02,
                             staging_dir=str(tmpdir_path))
        assert state["hits"] == 1                 # fail-fast, no retries
        # retries exhausted -> RuntimeError chaining the last error
        state["fails"] = 99
        with _pytest.raises(RuntimeError, match="after 2 attempts"):
            fetch_to_staging(f"{base}/data.csv", retries=1, backoff=0.02,
                             staging_dir=str(tmpdir_path))
    finally:
        srv.shutdown()


def test_http_resume_after_midstream_drop(tmpdir_path):
    """A connection dropped mid-body resumes from the staged byte count
    via a Range request (server honors it with 206); the staged file is
    byte-identical to the full payload."""
    import http.server

    payload = b"id,name\n" + b"".join(
        f"{i},n{i:04d}\n".encode() for i in range(2000))
    state = {"drops": 1, "ranges": []}

    class H(http.server.BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def do_GET(self):
            rng = self.headers.get("Range")
            state["ranges"].append(rng)
            start = int(rng.split("=")[1].rstrip("-")) if rng else 0
            body = payload[start:]
            self.send_response(206 if rng else 200)
            self.send_header("Content-Type", "text/csv")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            if state["drops"] > 0:
                state["drops"] -= 1
                self.wfile.write(body[: len(body) // 2])
                self.wfile.flush()
                self.connection.close()           # mid-body drop
                return
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    srv = _serve(H)
    try:
        url = f"http://127.0.0.1:{srv.server_port}/data.csv"
        path = fetch_to_staging(url, retries=3, backoff=0.02,
                                staging_dir=str(tmpdir_path))
        with open(path, "rb") as f:
            assert f.read() == payload
        # second request carried a Range resume from the staged bytes
        assert state["ranges"][0] is None
        assert len(state["ranges"]) == 2
        assert state["ranges"][1].startswith("bytes=")
        assert int(state["ranges"][1][len("bytes="):-1]) > 0
    finally:
        srv.shutdown()


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


# ---------------------------------------------------------------- ssh/scp

FAKE_SCP = r"""#!/bin/sh
# fake scp for the no-network test suite: maps user@host:path to
# $FAKE_SSH_ROOT/path and records its argv for command-shape assertions.
echo "$@" >> "$FAKE_SSH_ROOT/scp.log"
for last; do :; done
DST="$last"
for a in "$@"; do SRC="$PREV"; PREV="$a"; done
case "$SRC" in
  *@*:*) RP="${SRC#*:}"; cp "$FAKE_SSH_ROOT$RP" "$DST" || exit 1 ;;
  *) RP="${DST#*:}"; mkdir -p "$(dirname "$FAKE_SSH_ROOT$RP")"; \
     cp "$SRC" "$FAKE_SSH_ROOT$RP" || exit 1 ;;
esac
"""


@pytest.fixture
def fake_scp(tmpdir_path, monkeypatch):
    root = f"{tmpdir_path}/sshroot"
    os.makedirs(root, exist_ok=True)
    bindir = f"{tmpdir_path}/bin"
    os.makedirs(bindir, exist_ok=True)
    scp = f"{bindir}/scp"
    with open(scp, "w") as f:
        f.write(FAKE_SCP)
    os.chmod(scp, 0o755)
    monkeypatch.setenv("PATH", f"{bindir}:{os.environ['PATH']}")
    monkeypatch.setenv("FAKE_SSH_ROOT", root)
    return root


def test_ssh_url_parse_reference_error_parity():
    from tinyetl_spark.sources.ssh import parse_ssh_url
    assert parse_ssh_url("ssh://alice@h1:2222/d/f.csv") == \
        ("alice", "h1", 2222, "/d/f.csv")
    assert parse_ssh_url("scp://bob@h2/f.json")[2] == 22   # default port
    with pytest.raises(ValueError, match="username"):
        parse_ssh_url("ssh://h1/d/f.csv")
    with pytest.raises(ValueError, match="file path"):
        parse_ssh_url("ssh://alice@h1/")


def test_ssh_fetch_and_read_source(spark, tmpdir_path, fake_scp):
    os.makedirs(f"{fake_scp}/data", exist_ok=True)
    with open(f"{fake_scp}/data/people.csv", "w") as f:
        f.write("id,name\n1,ann\n2,bo\n")
    df = read_source(spark, "ssh://alice@remote:2222/data/people.csv")
    assert {(r["id"], r["name"]) for r in df.collect()} == \
        {(1, "ann"), (2, "bo")}
    # command shape: reference scp flags + port + user@host:path
    log = open(f"{fake_scp}/scp.log").read()
    assert "-P 2222" in log and "StrictHostKeyChecking=no" in log
    assert "alice@remote:/data/people.csv" in log


def test_ssh_write_sink_roundtrip(spark, tmpdir_path, fake_scp):
    df = spark.createDataFrame([(1, "x"), (2, "y")], "id long, v string")
    write_sink(df, "ssh://alice@remote/out/export.json")
    back = spark.read.json(f"{fake_scp}/out/export.json")
    assert {(r["id"], r["v"]) for r in back.collect()} == {(1, "x"), (2, "y")}


def test_ssh_scp_failure_raises(tmpdir_path, fake_scp):
    from tinyetl_spark.sources.ssh import scp_fetch
    with pytest.raises(RuntimeError, match="SCP failed"):
        scp_fetch("ssh://alice@remote/missing/nope.csv")


# ------------------------------------------------------------- snowflake

SF_URL = ("snowflake://u:pw@acct.eu-1/SALES/PUBLIC"
          "?table=ORDERS&warehouse=WH1&role=R1")


def test_snowflake_url_parse_reference_error_parity():
    from tinyetl_spark.sources.snowflake import parse_snowflake_url
    c = parse_snowflake_url(SF_URL)
    assert (c.account, c.database, c.schema, c.table) == \
        ("acct.eu-1", "SALES", "PUBLIC", "ORDERS")
    assert c.warehouse == "WH1" and c.role == "R1"
    # one distinct error per missing part, as in snowflake.rs:47-118
    for bad, msg in [
        ("snowflake://acct/db/sc?table=T", "username"),
        ("snowflake://u@acct/db/sc?table=T", "password"),
        ("snowflake://u:pw@acct/onlydb?table=T", "database and schema"),
        ("snowflake://u:pw@acct/db/sc", "table parameter"),
    ]:
        with pytest.raises(ValueError, match=msg):
            parse_snowflake_url(bad)


def test_snowflake_stage_roundtrip_and_mock(spark, tmpdir_path):
    from tinyetl_spark.sources.snowflake import load_sql, unload_sql
    stage = f"{tmpdir_path}/stage"
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    # write -> stage parquet + the COPY INTO the warehouse runs
    from tinyetl_spark.sources.snowflake import (parse_snowflake_url,
                                                 write_snowflake)
    sql = write_snowflake(df, SF_URL, options={"stage_dir": stage})
    assert "COPY INTO SALES.PUBLIC.ORDERS" in sql
    # read scans the same stage path (distributed parquet)
    back = read_source(spark, SF_URL, options={"stage_dir": stage})
    assert {(r["id"], r["v"]) for r in back.collect()} == {(1, "a"), (2, "b")}
    # no stage_dir: the reference's 2-row mock sample requires an
    # explicit opt-in — a missing/misspelled stage_dir must fail loudly,
    # never silently feed fabricated data to a production job
    import pytest as _pytest
    with _pytest.raises(ValueError, match="stage_dir"):
        read_source(spark, SF_URL)
    mock = read_source(spark, SF_URL, options={"mock": "true"})
    assert mock.count() == 2 and "created_at" in mock.columns
    c = parse_snowflake_url(SF_URL)
    assert "FROM SALES.PUBLIC.ORDERS" in unload_sql(c)
    assert load_sql(c).startswith("COPY INTO SALES.PUBLIC.ORDERS")
