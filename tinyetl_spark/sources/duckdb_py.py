"""DuckDB source & sink via the bundled ``duckdb`` Python module — no JDBC.

Reference surface: /root/reference/src/connectors/duckdb.rs:116-354 (scan
with DESCRIBE schema + LIMIT/OFFSET pagination, full value decode) and
:356-520 (sink). Same distributed shape as the SQLite connector: the
driver reads the schema (DESCRIBE) and rowid bounds, splits the rowid
space into ranges, and each ``mapInPandas`` task opens the file read-only
and scans ONLY its range — parallel keyset pagination instead of the
reference's serial OFFSET/LIMIT loop (which re-scans from the start on
every page; rowid ranges are O(range) each).

Write side: DuckDB is single-writer per file — partitions stream through
``toLocalIterator`` (bounded memory) into batched inserts, mirroring the
reference's append-first lifecycle (truncate → DELETE FROM).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (BinaryType, BooleanType, DateType, DoubleType,
                               FloatType, IntegerType, LongType, StringType,
                               StructField, StructType, TimestampType)

_DUCK_TO_SPARK = {
    "BIGINT": LongType(), "INTEGER": IntegerType(), "SMALLINT": IntegerType(),
    "TINYINT": IntegerType(), "HUGEINT": DoubleType(), "UBIGINT": DoubleType(),
    "DOUBLE": DoubleType(), "FLOAT": FloatType(), "DECIMAL": DoubleType(),
    "VARCHAR": StringType(), "BLOB": BinaryType(), "BOOLEAN": BooleanType(),
    "DATE": DateType(), "TIMESTAMP": TimestampType(),
}


def _spark_type(decl: str):
    decl = (decl or "").upper()
    for token, t in _DUCK_TO_SPARK.items():
        if decl.startswith(token):
            return t
    return StringType()


def read_duckdb(spark: SparkSession, db_path: str, table: str,
                num_partitions: int | None = None) -> DataFrame:
    import duckdb
    if not os.path.exists(db_path):
        raise FileNotFoundError(db_path)
    con = duckdb.connect(db_path, read_only=True)
    try:
        desc = con.execute(f'DESCRIBE "{table}"').fetchall()
        lo, hi = con.execute(
            f'SELECT min(rowid), max(rowid) FROM "{table}"').fetchone()
    finally:
        con.close()
    schema = StructType([StructField(d[0], _spark_type(d[1]), True)
                         for d in desc])
    if lo is None:
        return spark.createDataFrame([], schema)
    n = num_partitions or min(spark.sparkContext.defaultParallelism, 16)
    n = max(1, min(n, int(hi) - int(lo) + 1))
    step = (int(hi) - int(lo) + n) // n
    ranges = [(int(lo) + i * step, min(int(lo) + (i + 1) * step - 1, int(hi)))
              for i in range(n)]
    rdf = spark.createDataFrame([(a, b) for a, b in ranges if a <= b],
                                "lo long, hi long").repartition(n)
    cols = [f.name for f in schema.fields]
    sel = ", ".join(f'"{c}"' for c in cols)

    def scan(batches):
        import duckdb as dk
        import pandas as pd  # noqa: F401
        for pdf in batches:
            for lo_, hi_ in zip(pdf["lo"], pdf["hi"]):
                c = dk.connect(db_path, read_only=True)
                try:
                    out = c.execute(
                        f'SELECT {sel} FROM "{table}" '
                        f'WHERE rowid BETWEEN ? AND ?',
                        [int(lo_), int(hi_)]).fetch_df()
                finally:
                    c.close()
                yield out

    return rdf.mapInPandas(scan, schema=schema)


_DUCK_DECL = {"long": "BIGINT", "integer": "INTEGER", "double": "DOUBLE",
              "float": "FLOAT", "string": "VARCHAR", "binary": "BLOB",
              "boolean": "BOOLEAN", "date": "DATE", "timestamp": "TIMESTAMP",
              "timestamp_ntz": "TIMESTAMP"}


def write_duckdb(df: DataFrame, db_path: str, table: str,
                 truncate: bool = False, batch_size: int = 2000) -> int:
    import duckdb
    cols = df.schema.fields
    decls = ", ".join(
        f'"{f.name}" {_DUCK_DECL.get(f.dataType.typeName(), "VARCHAR")}'
        for f in cols)
    names = ", ".join(f'"{f.name}"' for f in cols)
    ph = ", ".join("?" for _ in cols)
    con = duckdb.connect(db_path)
    written = 0
    try:
        con.execute(f'CREATE TABLE IF NOT EXISTS "{table}" ({decls})')
        if truncate:
            con.execute(f'DELETE FROM "{table}"')
        buf = []
        for row in df.toLocalIterator():
            buf.append(tuple(bytes(v) if isinstance(v, bytearray) else v
                             for v in row))
            if len(buf) >= batch_size:
                con.executemany(
                    f'INSERT INTO "{table}" ({names}) VALUES ({ph})', buf)
                written += len(buf)
                buf = []
        if buf:
            con.executemany(
                f'INSERT INTO "{table}" ({names}) VALUES ({ph})', buf)
            written += len(buf)
    finally:
        con.close()
    return written
