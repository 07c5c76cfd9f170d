"""Custom stateful streaming operator via ``applyInPandasWithState``.

The merge pipeline keeps its state IN the lake table (fences + LWW rows),
which is the right design for the sink. This module covers the other
stateful shape the north rule's surface implies: an arbitrary per-key
running aggregate maintained in the state store across micro-batches —
Spark's ``applyInPandasWithState`` with Arrow-batched (never per-row)
user code.

``running_url_stats`` tracks, per url: change-event count, upsert/delete
split, and the latest ``warc_ts`` seen — the online profile a CDC
operator watches for hot keys. Its converged output is verified against
the batch ``groupBy`` over the same log in tests (replay determinism).

Scale notes: state is O(distinct keys) in the state store (RocksDB on a
real cluster), partitioned by key hash; each micro-batch shuffles only
its own events. Output mode "update" emits one row per key per batch the
key appeared in.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (LongType, StringType, StructField, StructType)

OUTPUT_SCHEMA = StructType([
    StructField("url", StringType(), False),
    StructField("n_events", LongType(), False),
    StructField("n_deletes", LongType(), False),
    StructField("last_warc_us", LongType(), True),
])

STATE_SCHEMA = StructType([
    StructField("n_events", LongType(), False),
    StructField("n_deletes", LongType(), False),
    StructField("last_warc_us", LongType(), True),
])


def _update_url_stats(key: tuple, pdfs: Iterator[pd.DataFrame],
                      state: GroupState) -> Iterator[pd.DataFrame]:
    n, nd, last_us = state.get if state.exists else (0, 0, None)
    for pdf in pdfs:
        n += len(pdf)
        nd += int((pdf["op"] == "delete").sum())
        mx = pdf["warc_ts"].max()
        if pd.notna(mx):
            us = int(pd.Timestamp(mx).value // 1000)
            last_us = us if last_us is None else max(last_us, us)
    state.update((n, nd, last_us))
    yield pd.DataFrame([{"url": key[0], "n_events": n, "n_deletes": nd,
                         "last_warc_us": last_us}])


def running_url_stats_stream(events: DataFrame) -> DataFrame:
    """Attach the stateful per-url profile operator to a STREAMING events
    frame (the event-log tail). Emits updated rows per key per batch."""
    return (events.groupBy("url")
            .applyInPandasWithState(
                _update_url_stats, OUTPUT_SCHEMA, STATE_SCHEMA,
                "update", GroupStateTimeout.NoTimeout))


def batch_url_stats(events: DataFrame) -> DataFrame:
    """The batch equivalent the streaming operator must converge to."""
    return (events.groupBy("url")
            .agg(F.count("*").alias("n_events"),
                 F.sum(F.when(F.col("op") == "delete", 1).otherwise(0))
                 .cast("long").alias("n_deletes"),
                 (F.unix_micros(F.max("warc_ts"))).alias("last_warc_us")))


def run_url_stats_to_completion(spark: SparkSession, log_dir: str,
                                checkpoint_dir: str,
                                query_name: str = "url-stats") -> DataFrame:
    """availableNow drain of the log through the stateful operator;
    returns the converged per-url profile FOR KEYS UPDATED THIS RUN (last
    update per key wins — n_events is monotone, so max(n_events) is the
    final row). Update mode only re-emits keys with new data: merge runs'
    outputs for a full view, or query the state store on a real cluster.
    Resuming from the same checkpoint restores the state store, so counts
    continue across runs (tested). The returned DataFrame reads this
    run's parquet output lazily and stays valid through ONE subsequent
    run on the same checkpoint; older runs' output is pruned at run
    start so a long-lived checkpoint does not accumulate dead files."""
    import os

    import shutil
    import time
    import uuid as _uuid

    from tinyetl_spark.sources.eventlog import stream_event_log
    events = stream_event_log(spark, log_dir)
    runs_root = os.path.join(checkpoint_dir, "url_stats_updates")
    # Each run writes under its own run-<ts>-<id> dir. Old runs' output
    # would otherwise accumulate forever on a long-lived checkpoint (only
    # same-batch-id retries overwrite), so prune all but the MOST RECENT
    # prior run now — that one stays because the caller may still hold
    # its (lazy) returned DataFrame; anything older is out of contract.
    # The checkpoint dir itself (offsets + state store) is untouched.
    if os.path.isdir(runs_root):
        prior = sorted(d for d in os.listdir(runs_root)
                       if d.startswith("run-"))
        for stale in prior[:-1]:
            shutil.rmtree(os.path.join(runs_root, stale), ignore_errors=True)
    out_dir = os.path.join(
        runs_root, f"run-{time.time_ns():020d}-{_uuid.uuid4().hex[:6]}")
    run_paths: list[str] = []

    # foreachBatch, not the memory sink: memory-sink queries refuse to
    # RECOVER from a checkpoint, and checkpointed state is the point here.
    # The sink APPENDS each batch's update-mode output to parquet — an
    # O(batch) distributed write, never a driver-side collect (at 10^8
    # distinct urls a driver drain OOMs). A fixed per-batch path with
    # mode=overwrite keeps foreachBatch retries idempotent; only the path
    # STRINGS (O(batches)) live on the driver.
    def sink(batch_df: DataFrame, batch_id: int) -> None:
        path = os.path.join(out_dir, f"batch-{batch_id:09d}")
        (batch_df.withColumn("_batch_id", F.lit(batch_id))
                 .write.mode("overwrite").parquet(path))
        run_paths.append(path)

    q = (running_url_stats_stream(events)
         .writeStream.queryName(query_name)
         .foreachBatch(sink)
         .outputMode("update")
         .option("checkpointLocation", checkpoint_dir)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    if not run_paths:
        return spark.createDataFrame([], OUTPUT_SCHEMA)
    # LWW resolution in Spark: the latest update per key this run
    # (batch_id is authoritative; n_events is monotone so it tie-breaks
    # identically on replays of the same batch).
    from pyspark.sql import Window
    w = Window.partitionBy("url").orderBy(F.desc("_batch_id"),
                                          F.desc("n_events"))
    return (spark.read.parquet(*run_paths)
                 .withColumn("_rn", F.row_number().over(w))
                 .filter("_rn = 1").drop("_rn", "_batch_id"))
