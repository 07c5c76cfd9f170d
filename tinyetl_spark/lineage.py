"""Lineage & metrics views over a LakeTable's commit history.

Every merge commit stores (a) summary stats (events applied, dedup drops,
deletes, touched buckets, skew ratio, epoch fence) and (b) per-bucket
lineage rows. These helpers expose them as DataFrames so operators can
monitor the stream with plain SQL — the north rule's "per-partition
lineage + metrics" requirement, and the Spark-native replacement for the
reference's TransferStats progress accounting
(/root/reference/src/transfer.rs:15-20, 124-198).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from tinyetl_spark.lake.table import LakeTable

METRICS_SCHEMA = ("version int, batch_id long, stream_id string, "
                  "events_in long, dedup_drops long, upserts long, "
                  "deletes long, touched_buckets int, skew_ratio double, "
                  "timestamp_ms long")

LINEAGE_SCHEMA = "version int, bucket int, rows long, events long"


def merge_metrics(table: LakeTable) -> DataFrame:
    """One row per LIVE merge commit (snapshots removed by
    expire_snapshots are skipped — iteration starts at oldest_version)."""
    rows = []
    for v in table.versions():
        s = table.snapshot(v)
        if s.summary.get("operation") != "merge":
            continue
        rows.append((
            v, int(s.summary.get("batch_id", -1)),
            str(s.summary.get("stream_id", "")),
            int(s.summary.get("events_in", 0)),
            int(s.summary.get("dedup_drops", 0)),
            int(s.summary.get("upserts", 0)),
            int(s.summary.get("deletes", 0)),
            int(s.summary.get("touched_buckets", 0)),
            float(s.summary.get("skew_ratio", 0.0)),
            s.timestamp_ms,
        ))
    return table.spark.createDataFrame(rows, METRICS_SCHEMA)


def bucket_lineage(table: LakeTable) -> DataFrame:
    """One row per (commit, bucket): rows now in the bucket + events this
    commit applied to it."""
    rows = []
    for v in table.versions():
        s = table.snapshot(v)
        for e in s.lineage:
            rows.append((v, int(e["bucket"]), int(e.get("rows", 0)),
                         int(e.get("events", 0))))
    return table.spark.createDataFrame(rows, LINEAGE_SCHEMA)
