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
    from tinyetl_spark.sources.dbapi import ModuleConnect, read_dbapi
    return read_dbapi(
        spark, ModuleConnect("duckdb", db_path, read_only=True),
        table=table, dialect="duckdb", schema=schema,
        num_partitions=num_partitions, partition_column="rowid",
        lower_bound=int(lo) if lo is not None else None,
        upper_bound=int(hi) if hi is not None else None)


_DUCK_DECL = {"long": "BIGINT", "integer": "INTEGER", "double": "DOUBLE",
              "float": "FLOAT", "string": "VARCHAR", "binary": "BLOB",
              "boolean": "BOOLEAN", "date": "DATE", "timestamp": "TIMESTAMP",
              "timestamp_ntz": "TIMESTAMP"}


def write_duckdb(df: DataFrame, db_path: str, table: str,
                 truncate: bool = False, batch_size: int = 2000) -> int:
    """Single-writer batched insert via the shared DBAPI sink
    (sources/dbapi.py) with duckdb type declarations."""
    import dataclasses

    from tinyetl_spark.sources.dbapi import (DIALECTS, ModuleConnect,
                                             write_dbapi)
    d = dataclasses.replace(DIALECTS["duckdb"], type_decls=dict(_DUCK_DECL))
    return write_dbapi(df, ModuleConnect("duckdb", db_path),
                       table, dialect=d, truncate=truncate,
                       batch_size=batch_size)
