"""SQLite source & sink via Python's stdlib ``sqlite3`` — no JDBC jar.

Reference surface: /root/reference/src/connectors/sqlite.rs:50-212 (scan,
typed column mapping, batched insert) and the keyset-pagination scan
pattern of odbc.rs:233-256. The Spark-native translation:

- **read**: the driver inspects the table (PRAGMA table_info + rowid
  bounds), splits the rowid space into ``num_partitions`` ranges, and a
  ``mapInPandas`` over the range table has every task open the database
  file read-only and scan ONLY its range — the exact distributed analogue
  of the reference's keyset cursor ("remember the last key, fetch strictly
  beyond it"), with all ranges scanned in parallel instead of serially.
  A custom integer ``partition_column`` (with optional lower/upper bounds)
  is supported like ``spark.read.jdbc``'s partitionColumn options.
- **write**: SQLite is single-writer by design (so is the reference's
  connection); partitions stream to the driver via ``toLocalIterator``
  (bounded memory) and are inserted in batches inside one transaction.

Scale note: this connector is for operational sidecar DBs (job state,
small dims), not the 100 TB lake path — but the ranged scan keeps even a
multi-GB sqlite file parallel, and the same option shape
(partition_column/lower/upper/num_partitions) is what ``read_source``
passes to real JDBC sources on a cluster with driver jars.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (BinaryType, DoubleType, LongType, StringType,
                               StructField, StructType)

_AFFINITY = [
    ("INT", LongType()),
    ("CHAR", StringType()), ("CLOB", StringType()), ("TEXT", StringType()),
    ("BLOB", BinaryType()),
    ("REAL", DoubleType()), ("FLOA", DoubleType()), ("DOUB", DoubleType()),
    ("NUMERIC", DoubleType()), ("DECIMAL", DoubleType()),
]


def _spark_type(decl: str):
    """SQLite type-affinity rules (public docs §3.1) → Spark type."""
    decl = (decl or "").upper()
    for token, t in _AFFINITY:
        if token in decl:
            return t
    return StringType()


def _table_schema(db_path: str, table: str) -> StructType:
    import sqlite3
    with sqlite3.connect(f"file:{db_path}?mode=ro", uri=True) as conn:
        cols = conn.execute(f'PRAGMA table_info("{table}")').fetchall()
    if not cols:
        raise ValueError(f"sqlite: no such table {table!r} in {db_path}")
    return StructType([StructField(c[1], _spark_type(c[2]), True)
                       for c in cols])


def read_sqlite(spark: SparkSession, db_path: str, table: str,
                num_partitions: int | None = None,
                partition_column: str | None = None,
                lower_bound: int | None = None,
                upper_bound: int | None = None) -> DataFrame:
    """Partitioned parallel scan of one table (see module docstring)."""
    import sqlite3
    if not os.path.exists(db_path):
        raise FileNotFoundError(db_path)
    schema = _table_schema(db_path, table)
    key = partition_column or "rowid"
    with sqlite3.connect(f"file:{db_path}?mode=ro", uri=True) as conn:
        lo, hi = conn.execute(
            f'SELECT min("{key}"), max("{key}") FROM "{table}"').fetchone()
    if lo is None:                                   # empty table
        return spark.createDataFrame([], schema)
    lo = lower_bound if lower_bound is not None else int(lo)
    hi = upper_bound if upper_bound is not None else int(hi)
    n = num_partitions or min(spark.sparkContext.defaultParallelism, 16)
    n = max(1, min(n, hi - lo + 1))
    step = (hi - lo + n) // n
    ranges = [(lo + i * step, min(lo + (i + 1) * step - 1, hi))
              for i in range(n)]
    ranges = [(a, b) for a, b in ranges if a <= b]
    rdf = spark.createDataFrame(ranges, "lo long, hi long").repartition(len(ranges))
    col_names = [f.name for f in schema.fields]
    sel = ", ".join(f'"{c}"' for c in col_names)

    def scan(batches):
        import pandas as pd
        import sqlite3 as sq
        for pdf in batches:
            for lo_, hi_ in zip(pdf["lo"], pdf["hi"]):
                with sq.connect(f"file:{db_path}?mode=ro", uri=True) as c:
                    cur = c.execute(
                        f'SELECT {sel} FROM "{table}" '
                        f'WHERE "{key}" BETWEEN ? AND ?', (int(lo_), int(hi_)))
                    rows = cur.fetchall()
                yield pd.DataFrame(
                    {name: [r[i] for r in rows]
                     for i, name in enumerate(col_names)}
                    if rows else {name: [] for name in col_names})

    return rdf.mapInPandas(scan, schema=schema)


_SQLITE_DECL = {"long": "INTEGER", "integer": "INTEGER", "short": "INTEGER",
                "boolean": "INTEGER", "double": "REAL", "float": "REAL",
                "string": "TEXT", "binary": "BLOB",
                "date": "TEXT", "timestamp": "TEXT", "timestamp_ntz": "TEXT"}


def write_sqlite(df: DataFrame, db_path: str, table: str,
                 truncate: bool = False, batch_size: int = 2000) -> int:
    """Single-writer batched insert (append-first lifecycle; truncate →
    DELETE FROM, mirroring the reference's transfer contract)."""
    import datetime
    import sqlite3
    cols = df.schema.fields
    decls = ", ".join(
        f'"{f.name}" {_SQLITE_DECL.get(f.dataType.typeName(), "TEXT")}'
        for f in cols)
    placeholders = ", ".join("?" for _ in cols)
    names = ", ".join(f'"{f.name}"' for f in cols)

    def py(v):
        if isinstance(v, bool):
            return int(v)
        if isinstance(v, (datetime.datetime, datetime.date)):
            return v.isoformat()
        if isinstance(v, bytearray):
            return bytes(v)
        return v

    written = 0
    conn = sqlite3.connect(db_path)
    try:
        conn.execute(f'CREATE TABLE IF NOT EXISTS "{table}" ({decls})')
        if truncate:
            conn.execute(f'DELETE FROM "{table}"')
        buf = []
        for row in df.toLocalIterator():
            buf.append(tuple(py(v) for v in row))
            if len(buf) >= batch_size:
                conn.executemany(
                    f'INSERT INTO "{table}" ({names}) VALUES ({placeholders})', buf)
                written += len(buf)
                buf = []
        if buf:
            conn.executemany(
                f'INSERT INTO "{table}" ({names}) VALUES ({placeholders})', buf)
            written += len(buf)
        conn.commit()
    finally:
        conn.close()
    return written


def split_sqlite_uri(uri: str) -> tuple[str, str | None]:
    """'db.sqlite#mytable' / 'sqlite:///path/db.sqlite#t' -> (path, table)."""
    path, _, frag = uri.partition("#")
    if path.startswith("sqlite://"):
        path = path[len("sqlite://"):]
        if path.startswith("/") and os.name != "nt" and not os.path.exists(path) \
                and os.path.exists(path.lstrip("/")):
            path = path.lstrip("/")
    return path, (frag or None)


def _infer_schema_from_rows(cols: list[str], rows: list[tuple]) -> StructType:
    """Type inference for arbitrary-SQL results (no PRAGMA available on a
    derived table): vote per column over sampled python values, string on
    mixed/unknown — the reference's sampling rule (schema.rs:526-554)."""
    fields = []
    for i, name in enumerate(cols):
        seen = {type(r[i]) for r in rows if r[i] is not None}
        if seen <= {int}:
            t = LongType()
        elif seen <= {float, int} and float in seen:
            t = DoubleType()
        elif seen <= {bytes}:
            t = BinaryType()
        else:
            t = StringType()
        fields.append(StructField(name, t, True))
    return StructType(fields)


def read_sqlite_query(spark: SparkSession, db_path: str, query: str,
                      num_partitions: int | None = None,
                      partition_column: str | None = None) -> DataFrame:
    """Arbitrary-SQL source (reference ``with_query``, mssql.rs custom-
    query support): the query runs as a derived table. With a numeric
    ``partition_column`` the scan parallelizes exactly like spark JDBC
    (``SELECT * FROM (q) WHERE col BETWEEN lo AND hi`` per range);
    without one it is a single-stream driver fetch — same limitation as
    the reference's serial cursor."""
    import sqlite3
    with sqlite3.connect(f"file:{db_path}?mode=ro", uri=True) as conn:
        cur = conn.execute(f"SELECT * FROM ({query}) LIMIT 100")
        cols = [d[0] for d in cur.description]
        sample = cur.fetchall()
    schema = _infer_schema_from_rows(cols, sample)
    if not partition_column:
        with sqlite3.connect(f"file:{db_path}?mode=ro", uri=True) as conn:
            rows = conn.execute(query).fetchall()
        return spark.createDataFrame(rows, schema)
    with sqlite3.connect(f"file:{db_path}?mode=ro", uri=True) as conn:
        lo, hi = conn.execute(
            f'SELECT min("{partition_column}"), max("{partition_column}") '
            f'FROM ({query})').fetchone()
    if lo is None:
        return spark.createDataFrame([], schema)
    n = num_partitions or min(spark.sparkContext.defaultParallelism, 16)
    n = max(1, min(n, int(hi) - int(lo) + 1))
    step = (int(hi) - int(lo) + n) // n
    ranges = [(int(lo) + i * step, min(int(lo) + (i + 1) * step - 1, int(hi)))
              for i in range(n)]
    rdf = spark.createDataFrame([r for r in ranges if r[0] <= r[1]],
                                "lo long, hi long").repartition(n)

    def scan(batches):
        import pandas as pd
        import sqlite3 as sq
        for pdf in batches:
            for lo_, hi_ in zip(pdf["lo"], pdf["hi"]):
                with sq.connect(f"file:{db_path}?mode=ro", uri=True) as c:
                    rows = c.execute(
                        f'SELECT * FROM ({query}) '
                        f'WHERE "{partition_column}" BETWEEN ? AND ?',
                        (int(lo_), int(hi_))).fetchall()
                yield pd.DataFrame(
                    {name: [r[i] for r in rows]
                     for i, name in enumerate(cols)}
                    if rows else {name: [] for name in cols})

    return rdf.mapInPandas(scan, schema=schema)
