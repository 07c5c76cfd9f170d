"""Change-event log source — the binlog/WAL tail.

The reference's closest analogue is the ODBC keyset cursor
(/root/reference/src/connectors/odbc.rs:233-256): remember the last key,
fetch strictly beyond it. Structured Streaming's file source generalizes
that: an append-only directory of event files with checkpointed offsets —
each micro-batch is "all files beyond the last committed offset", and
replay after failure re-reads exactly the same file slice.

In production this directory is the landing zone a CDC agent (Debezium,
DMS, a WAL shipper) writes parquet segments into; `append_events` is the
test/bench stand-in for that agent.

Scale: the file source lists the directory each trigger — at 10^10 events
keep segments coarse (the agent should roll files at 128-512 MB) and use
``maxFilesPerTrigger`` to bound micro-batch size so merge cost per batch
stays flat.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from tinyetl_spark.schema import EVENTS_SCHEMA


def append_events(df: DataFrame, log_dir: str, segment_partitions: int | None = None) -> None:
    """Append a batch of change events as new log segments (the CDC agent)."""
    out = df if segment_partitions is None else df.repartition(segment_partitions)
    out.write.mode("append").parquet(log_dir)


def read_event_log(spark: SparkSession, log_dir: str) -> DataFrame:
    """Batch read of the full log (bench / backfill path)."""
    return spark.read.schema(EVENTS_SCHEMA).parquet(log_dir)


def stream_event_log(spark: SparkSession, log_dir: str,
                     max_files_per_trigger: int | None = None,
                     schema=None) -> DataFrame:
    """Streaming tail of the log with checkpointed offsets.

    ``schema`` overrides the default change-event shape for logs that
    carry extra routing/envelope columns (e.g. the fan-out pipeline's
    per-event target-table column); file-source offsets and replay
    semantics are unchanged.
    """
    reader = spark.readStream.schema(schema or EVENTS_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(log_dir)
