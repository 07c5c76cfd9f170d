"""File/DB source & sink dispatch — the connector factory.

Reference: URL-shape dispatch at /root/reference/src/connectors/mod.rs:
179-239 (scheme → DB connector, extension → file format). Spark's
DataSource API already fuses transport+format (s3a://, hdfs://, file://),
so the protocol layer (http/ssh staging downloads,
/root/reference/src/protocols/) collapses into URI handling; JDBC covers
the five SQL connectors (sqlite/postgres/mysql/mssql/odbc scan+sink
pagination logic is subsumed by ``spark.read.jdbc`` partitioning).

Reference semantics preserved where visible:
- CSV: header row, per-cell type trial with date sniffing
  (connectors/csv.rs:82-111) → typed casts after inference; empty
  string → null; inferred columns always nullable (schema.rs:549-553 —
  Spark's inference already yields nullable columns);
- JSON: whole-file array-of-objects (multiLine) like connectors/json.rs;
  nested data stays structured instead of stringified (improvement);
- append-first table lifecycle: mode("append") default, truncate →
  overwrite (transfer.rs:89-118).
"""

from __future__ import annotations

import os
from urllib.parse import urlparse

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from tinyetl_spark.date_parser import might_be_date, parse_or_keep

_FILE_FORMATS = {".csv": "csv", ".tsv": "csv", ".json": "json",
                 ".ndjson": "json", ".parquet": "parquet", ".avro": "avro"}
_JDBC_SCHEMES = {"jdbc", "postgresql", "postgres", "mysql",
                 "mssql", "sqlserver", "odbc"}
_SQLITE_EXTS = {".sqlite", ".sqlite3", ".db"}
_DUCKDB_EXTS = {".duckdb", ".ddb"}


def detect_format(uri: str, explicit: str | None = None) -> str:
    if explicit:
        return explicit
    parsed = urlparse(uri)
    if parsed.scheme in ("http", "https"):
        return "http"
    if parsed.scheme in ("ssh", "scp", "sftp"):
        return "ssh"
    if parsed.scheme == "snowflake":
        return "snowflake"
    if parsed.scheme in _JDBC_SCHEMES:   # scheme wins over extension:
        return "jdbc"                    # postgresql://h/x.db is jdbc
    ext_nofrag = os.path.splitext(uri.partition("#")[0])[1].lower()
    if parsed.scheme == "sqlite" or ext_nofrag in _SQLITE_EXTS:
        return "sqlite"
    if parsed.scheme == "duckdb" or ext_nofrag in _DUCKDB_EXTS:
        return "duckdb"
    path = parsed.path or uri
    # extension wins even for directories: Spark-written datasets are
    # directories named like files (out.json/part-*.json)
    ext = os.path.splitext(path.rstrip("/"))[1].lower()
    if ext in _FILE_FORMATS:
        return _FILE_FORMATS[ext]
    if uri.endswith("/") or os.path.isdir(path):
        return "eventlog"
    raise ValueError(f"cannot determine format for {uri!r}; "
                     f"known extensions: {sorted(_FILE_FORMATS)}")


_AVRO_JVM_PROBE: dict[str, bool] = {}


def _avro_jvm_available(spark: SparkSession) -> bool:
    """True iff the spark-avro data source module is deployed. Probed once
    per SparkContext with Spark's own ``DataSource.lookupDataSource`` (a
    bare Class.forName is too weak: avro *classes* ship in the Spark
    distro without the data source being registered). An undeployed module
    routes to the pure-Python codec, while every OTHER avro error (bad
    path, corrupt container, schema mismatch, bad options) propagates.
    Keyed by applicationId — unique per SparkContext, unlike id() of the
    py4j handle, which a later context can reuse after GC."""
    key = spark.sparkContext.applicationId
    if key not in _AVRO_JVM_PROBE:
        jvm = spark._jvm
        try:
            jvm.org.apache.spark.sql.execution.datasources.DataSource \
               .lookupDataSource("avro",
                                 jvm.org.apache.spark.sql.internal.SQLConf.get())
            _AVRO_JVM_PROBE[key] = True
        except Exception:
            _AVRO_JVM_PROBE[key] = False
    return _AVRO_JVM_PROBE[key]


def read_source(spark: SparkSession, uri: str, fmt: str | None = None,
                options: dict | None = None, infer_schema: bool = True,
                date_sniff: bool = False) -> DataFrame:
    fmt = detect_format(uri, fmt)
    options = options or {}
    if fmt == "csv":
        reader = (spark.read.option("header", "true")
                  .option("inferSchema", str(infer_schema).lower())
                  .option("nullValue", "")            # empty cell -> null
                  .options(**options))
        if uri.endswith(".tsv"):
            reader = reader.option("sep", "\t")
        df = reader.csv(uri)
        if date_sniff:
            df = sniff_string_dates(df)
        return df
    if fmt == "json":
        # reference reads whole-file JSON arrays (connectors/json.rs); our
        # own sink (and most pipelines) write JSON-lines. Sniff: a file
        # starting with '[' is an array document -> multiLine.
        multi = options.pop("multiLine", None)
        if multi is None and os.path.isfile(uri):
            with open(uri, "rb") as fh:
                head = fh.read(64).lstrip()
            multi = "true" if head.startswith(b"[") else "false"
        return (spark.read.option("multiLine", multi or "false")
                .options(**options).json(uri))
    if fmt == "parquet":
        return spark.read.options(**options).parquet(uri)
    if fmt == "avro":
        if _avro_jvm_available(spark):
            return spark.read.format("avro").options(**options).load(uri)
        from tinyetl_spark.sources.avro_py import read_avro
        return read_avro(spark, uri)
    if fmt == "http":
        from tinyetl_spark.sources.http import read_http
        return read_http(spark, uri, options=options,
                         infer_schema=infer_schema, date_sniff=date_sniff)
    if fmt == "ssh":
        from tinyetl_spark.sources.ssh import read_ssh
        return read_ssh(spark, uri, options=options,
                        infer_schema=infer_schema, date_sniff=date_sniff)
    if fmt == "snowflake":
        from tinyetl_spark.sources.snowflake import read_snowflake
        return read_snowflake(spark, uri, options=options)
    if fmt == "sqlite":
        from tinyetl_spark.sources.sqlite_py import (read_sqlite,
                                                     read_sqlite_query,
                                                     split_sqlite_uri)
        path, table = split_sqlite_uri(uri)
        if "query" in options:   # reference with_query: arbitrary SQL source
            return read_sqlite_query(
                spark, path, options["query"],
                num_partitions=int(options["num_partitions"]) if "num_partitions" in options else None,
                partition_column=options.get("partition_column"))
        table = options.get("table", table)
        if not table:
            raise ValueError("sqlite source needs a table: 'db.sqlite#tbl'")
        return read_sqlite(
            spark, path, table,
            num_partitions=int(options["num_partitions"]) if "num_partitions" in options else None,
            partition_column=options.get("partition_column"),
            lower_bound=int(options["lower_bound"]) if "lower_bound" in options else None,
            upper_bound=int(options["upper_bound"]) if "upper_bound" in options else None)
    if fmt == "duckdb":
        from tinyetl_spark.sources.duckdb_py import read_duckdb
        from tinyetl_spark.sources.sqlite_py import split_sqlite_uri
        path, table = split_sqlite_uri(uri.replace("duckdb://", "", 1))
        table = options.get("table", table)
        if not table:
            raise ValueError("duckdb source needs a table: 'db.duckdb#tbl'")
        return read_duckdb(
            spark, path, table,
            num_partitions=int(options["num_partitions"]) if "num_partitions" in options else None)
    if fmt == "jdbc":
        # native DBAPI partitioned scan (sources/dbapi.py — the shared
        # machinery behind the sqlite/duckdb connectors) when a
        # psycopg2/pymysql/pyodbc driver module is deployed ...
        from tinyetl_spark.sources.dbapi import try_read_url
        native = try_read_url(spark, uri, options)
        if native is not None:
            return native
        # ... else the spark JDBC path: partitioned parallel read via the
        # standard partitionColumn/lowerBound/upperBound/numPartitions
        # options — the Spark analogue of the reference's keyset
        # pagination (odbc.rs:233-256); driver jars live on the cluster.
        return spark.read.format("jdbc").option("url", uri).options(**options).load()
    if fmt == "eventlog":
        from tinyetl_spark.sources.eventlog import read_event_log
        return read_event_log(spark, uri)
    raise ValueError(f"unsupported source format: {fmt}")


def sniff_string_dates(df: DataFrame, sample_rows: int = 1000) -> DataFrame:
    """Reference CSV behavior: a string column whose sampled non-null
    values ALL parse as dates becomes a timestamp column
    (connectors/csv.rs:82-111 + schema.rs:526-554 type vote)."""
    string_cols = [f.name for f in df.schema.fields
                   if f.dataType.typeName() == "string"]
    if not string_cols:
        return df
    sample = df.limit(sample_rows)
    aggs = []
    for c in string_cols:
        nn = F.count(F.col(c))
        parsed = F.count(F.when(might_be_date(F.col(c))
                                & parse_or_keep(F.col(c)).isNotNull(), 1))
        aggs.append(((nn > 0) & (nn == parsed)).alias(c))
    votes = sample.agg(*aggs).collect()[0]
    for c in string_cols:
        if votes[c]:
            df = df.withColumn(c, parse_or_keep(F.col(c)))
    return df


def write_sink(df: DataFrame, uri: str, fmt: str | None = None,
               options: dict | None = None, mode: str = "append",
               truncate: bool = False) -> None:
    """Append-first table lifecycle (reference transfer.rs:89-118):
    truncate → overwrite; else append where the format supports it.
    CSV is truncate-only in the reference (supports_append()=false,
    connectors/csv.rs) — mirrored by forcing overwrite."""
    fmt = detect_format(uri, fmt)
    options = options or {}
    mode = "overwrite" if truncate else mode
    if fmt == "csv":
        (df.coalesce(1) if options.pop("single_file", None) else df) \
            .write.mode("overwrite").option("header", "true") \
            .options(**options).csv(uri)
    elif fmt == "json":
        df.write.mode(mode).options(**options).json(uri)
    elif fmt == "parquet":
        df.write.mode(mode).options(**options).parquet(uri)
    elif fmt == "avro":
        if _avro_jvm_available(df.sparkSession):
            df.write.mode(mode).format("avro").options(**options).save(uri)
        else:
            from tinyetl_spark.sources.avro_py import write_avro
            write_avro(df, uri, mode=mode,
                       codec=options.get("compression", "deflate"))
    elif fmt == "sqlite":
        from tinyetl_spark.sources.sqlite_py import split_sqlite_uri, write_sqlite
        path, table = split_sqlite_uri(uri)
        table = options.get("table", table)
        if not table:
            raise ValueError("sqlite sink needs a table: 'db.sqlite#tbl'")
        write_sqlite(df, path, table, truncate=truncate)
    elif fmt == "duckdb":
        from tinyetl_spark.sources.duckdb_py import write_duckdb
        from tinyetl_spark.sources.sqlite_py import split_sqlite_uri
        path, table = split_sqlite_uri(uri.replace("duckdb://", "", 1))
        table = options.get("table", table)
        if not table:
            raise ValueError("duckdb sink needs a table: 'db.duckdb#tbl'")
        write_duckdb(df, path, table, truncate=truncate)
    elif fmt == "ssh":
        from tinyetl_spark.sources.ssh import write_ssh
        write_ssh(df, uri, options=options, truncate=truncate)
    elif fmt == "snowflake":
        from tinyetl_spark.sources.snowflake import write_snowflake
        write_snowflake(df, uri, options=options, truncate=truncate)
    elif fmt == "jdbc":
        from tinyetl_spark.sources.dbapi import try_write_url
        if try_write_url(df, uri, options, truncate=truncate) is None:
            (df.write.format("jdbc").option("url", uri)
               .options(**options).mode("overwrite" if truncate else mode).save())
    else:
        raise ValueError(f"unsupported sink format: {fmt}")
