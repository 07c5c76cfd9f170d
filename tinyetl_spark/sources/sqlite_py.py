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


def _ro_connect(db_path: str):
    """Picklable read-only connection factory for executor-side scans."""
    from tinyetl_spark.sources.dbapi import ModuleConnect
    return ModuleConnect("sqlite3", f"file:{db_path}?mode=ro", uri=True)


def read_sqlite(spark: SparkSession, db_path: str, table: str,
                num_partitions: int | None = None,
                partition_column: str | None = None,
                lower_bound: int | None = None,
                upper_bound: int | None = None) -> DataFrame:
    """Partitioned parallel scan of one table (see module docstring).
    Since r4 the scan machinery is the shared DBAPI connector
    (sources/dbapi.py); this wrapper keeps the PRAGMA affinity schema
    and the implicit rowid partition key."""
    from tinyetl_spark.sources.dbapi import read_dbapi
    if not os.path.exists(db_path):
        raise FileNotFoundError(db_path)
    schema = _table_schema(db_path, table)
    return read_dbapi(spark, _ro_connect(db_path), table=table,
                      dialect="sqlite", schema=schema,
                      num_partitions=num_partitions,
                      partition_column=partition_column or "rowid",
                      lower_bound=lower_bound, upper_bound=upper_bound)


def write_sqlite(df: DataFrame, db_path: str, table: str,
                 truncate: bool = False, batch_size: int = 2000) -> int:
    """Single-writer batched insert (append-first lifecycle; truncate →
    DELETE FROM, mirroring the reference's transfer contract). Shared
    machinery: sources/dbapi.py serial sink, sqlite dialect."""
    from tinyetl_spark.sources.dbapi import ModuleConnect, write_dbapi
    return write_dbapi(df, ModuleConnect("sqlite3", db_path),
                       table, dialect="sqlite", truncate=truncate,
                       batch_size=batch_size)


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
    the reference's serial cursor. Shared machinery: sources/dbapi.py."""
    from tinyetl_spark.sources.dbapi import read_dbapi
    return read_dbapi(spark, _ro_connect(db_path), query=query,
                      dialect="sqlite", num_partitions=num_partitions,
                      partition_column=partition_column)
