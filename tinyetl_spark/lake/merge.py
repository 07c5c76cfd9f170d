"""MERGE-apply: idempotent, epoch-fenced upsert of a change-event batch.

Semantics (north rule): Trafodion-style last-writer-wins keyed on the url,
ordered by (warc_ts DESC, event_seq DESC); ``op='delete'`` events win like
any other event and leave a tombstone row (``_deleted=true``) so that a
*late* (out-of-order) upsert older than the delete cannot resurrect the row
— replay from any point reconverges to the same final state.

Equivalent Iceberg SQL (what this compiles to on a real catalog)::

    MERGE INTO pages t USING batch_winners s ON t.url = s.url
    WHEN MATCHED AND (s.warc_ts, s.event_seq) >= (t.warc_ts, t.event_seq)
        THEN UPDATE SET *          -- including _deleted for tombstones
    WHEN NOT MATCHED THEN INSERT *

Implementation is a bucket-pruned copy-on-write tuned to exactly THREE
Spark jobs per micro-batch (driver fixed costs + per-task overheads are
the scaling ceiling of a streaming pipeline — every saved job and every
avoided task is throughput; an earlier cached-multi-action shape spent
HALF its task time on task-deserialization lock contention):

1. per-bucket histogram of the batch → events_in + touched buckets;
2. ONE linear pipeline with ONE shuffle and no caching: union(current
   rows of touched buckets, batch) → repartition by bucket → sort within
   partitions (url ASC, warc_ts DESC, event_seq DESC) → a single fused
   mapInPandas pass doing LWW dedup (duplicates are adjacent; O(1)
   last-url carry across Arrow chunks) + vectorized text extraction for
   winning batch rows only → plain parquet write with no second exchange
   (no Hive partitionBy — measured ~10x the write cost for many small
   partitions);
3. columnar read-back of the fresh files: one aggregation yields manifest
   bucket-sets, per-bucket lineage, and upsert/delete/skew stats.

Untouched buckets' files carry over into the new snapshot unchanged
(manifest-level partition pruning: at 100 TB with 4096 buckets a
micro-batch rewrites only the buckets its urls hash into). The atomic
snapshot commit carries the (stream_id → batch_id) epoch fence and the
lineage rows.

Exactly-once: if foreachBatch retries a batch, either the fence shows it
committed (skip), or the merge re-runs — and re-running is a no-op because
LWW over (warc_ts, event_seq) is idempotent.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, asdict
from typing import Any

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window
from pyspark.sql.types import IntegerType, LongType, StructField, StructType

from tinyetl_spark.lake.table import LakeTable, conform


@dataclass
class MergeStats:
    batch_id: int
    events_in: int
    dedup_drops: int
    upserts: int
    deletes: int
    touched_buckets: int
    total_buckets: int
    skew_ratio: float
    fenced: bool = False
    snapshot_version: int | None = None

    def to_dict(self) -> dict[str, Any]:
        return asdict(self)


FENCE_PREFIX = "fence."


def last_committed_batch(table: LakeTable, stream_id: str) -> int:
    return int(table.snapshot().properties.get(FENCE_PREFIX + stream_id, -1))


def dedup_batch(batch: DataFrame, key: str = "url") -> DataFrame:
    """Last-writer-wins winner per key within a batch (stand-alone use;
    merge_apply folds this into its single window pass)."""
    w = Window.partitionBy(key).orderBy(
        F.col("warc_ts").desc(), F.col("event_seq").desc())
    return (batch.withColumn("_rn", F.row_number().over(w))
                 .filter(F.col("_rn") == 1).drop("_rn"))


def merge_apply(table: LakeTable, batch: DataFrame, batch_id: int,
                stream_id: str = "default",
                extract: bool = True, transform_fn=None) -> MergeStats:
    """Apply one micro-batch of change events to the table.

    ``batch`` columns: event_seq, url, warc_ts, op, html, lang (+ extras
    that exist in the table schema).

    ``extract=True`` derives ``text`` from ``html`` for winning batch rows
    inside the fused merge pass (vectorized pandas, byte-identical to the
    reference extractor). ``transform_fn(df) -> df`` is an optional
    df-level hook applied to the batch BEFORE merging (custom stages).
    """
    timing = os.environ.get("TINYETL_MERGE_TIMING") == "1"
    tmarks = [("start", time.time())]

    def mark(label):
        if timing:
            tmarks.append((label, time.time()))

    snap = table.snapshot()
    key = snap.key_col
    mark("snapshot")

    # ---- epoch fence: skip replayed batches that already committed
    if batch_id <= last_committed_batch(table, stream_id):
        return MergeStats(batch_id, 0, 0, 0, 0, 0, snap.num_buckets, 0.0,
                          fenced=True, snapshot_version=snap.version)

    if transform_fn is not None:
        batch = transform_fn(batch)

    # ---- job 1: events_in + touched buckets.
    # Adaptive pruning probe: the per-bucket histogram is only worth a
    # job when batches are SPARSE relative to the bucket count (then the
    # copy-on-write can skip most of the table). When the previous merge
    # touched most buckets, assume touch-all (always correct — a superset
    # of the real touch set) and pay only a metadata-cheap count().
    prev_active = int(snap.summary.get("active_buckets", 0))
    dense = prev_active > 0.5 * snap.num_buckets
    if dense:
        events_in = batch.count()   # parquet footer count, no column scan
        touched = set(range(snap.num_buckets))
    else:
        pre = (batch.groupBy(table.bucket_expr().alias("b")).count().collect())
        events_in = sum(int(r["count"]) for r in pre)
        touched = {int(r["b"]) for r in pre}
    mark("job1_probe")
    if events_in == 0:
        committed = table.commit(
            files=snap.files,
            summary={"operation": "merge", "stream_id": stream_id,
                     "batch_id": batch_id, "events_in": 0},
            properties={FENCE_PREFIX + stream_id: batch_id})
        return MergeStats(batch_id, 0, 0, 0, 0, 0, snap.num_buckets, 0.0,
                          snapshot_version=committed.version)

    # touch-closure: a data file may hold >1 bucket (logical bucketing);
    # rewriting bucket 5 out of a {5,9} file requires rewriting bucket 9
    # too, else 9's rows would survive in both old and new files. Fixpoint
    # over the manifest's bucket-sets (driver-side, tiny).
    while True:
        grown = set(touched)
        for f in snap.files:
            bs = set(f["buckets"])
            if bs & grown:
                grown |= bs
        if grown == touched:
            break
        touched = grown

    # ---- job 2 (ONE linear pipeline, ONE shuffle, no caching):
    # current(touched) ∪ batch → repartition by bucket → sort within
    # partitions by (url ASC, warc_ts DESC, event_seq DESC, _src ASC) →
    # one vectorized mapInPandas pass doing LWW-dedup (duplicates are
    # adjacent after the sort; an O(1) last-url carry handles Arrow chunk
    # boundaries) + text extraction for winning batch rows → parquet write
    # with NO second shuffle (output partitioning == bucket partitioning).
    #
    # Design note: expressing LWW as Window.partitionBy(url) forces a
    # second exchange (Catalyst can't prove hash(bucket(url)) clusters
    # url), and a separate ArrowEvalPython stage doubles the Python
    # round-trips — fused, the merge is scan → shuffle → pandas → write.
    schema_cols = [f.name for f in snap.schema.fields]
    cur = (table.read(buckets=touched, include_tombstones=True)
                .withColumn("_src", F.lit(0)))
    b = (conform(batch.withColumn("_deleted", F.col("op") == F.lit("delete")),
                 snap.schema)
         .withColumn("_src", F.lit(1)))
    # one write slot per touched bucket: file layout (and therefore all
    # future read/list work) is a function of the DATA, never of the
    # cluster size — otherwise a bigger cluster writes more, smaller
    # files per batch and pays for it on every later read.
    slots = max(len(touched), 1)
    unioned = (cur.unionByName(b)
                  .withColumn("_bucket", table.bucket_expr())
                  .repartition(slots, "_bucket")
                  .sortWithinPartitions(F.col(key).asc(),
                                        F.col("warc_ts").desc(),
                                        F.col("event_seq").desc(),
                                        F.col("_src").asc()))
    out_cols = schema_cols + ["_src", "_bucket"]
    do_extract = extract is not False and "text" in schema_cols \
        and "html" in schema_cols
    out_schema = StructType(
        snap.schema.fields
        + [StructField("_src", IntegerType(), False),
           StructField("_bucket", LongType(), False)])

    def lww_extract(batches):
        import pandas as pd
        from tinyetl_spark.extract import extract_series
        last_url = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            keep = pdf.drop_duplicates(subset=[key], keep="first")
            if last_url is not None and len(keep) and keep.iloc[0][key] == last_url:
                keep = keep.iloc[1:]
            last_url = pdf.iloc[-1][key]
            if len(keep) == 0:
                continue
            if do_extract:
                mask = (keep["_src"] == 1) & keep["html"].notna()
                if mask.any():
                    keep = keep.copy()
                    keep.loc[mask, "text"] = extract_series(keep.loc[mask, "html"])
            yield keep[out_cols]

    out = unioned.select(*out_cols).mapInPandas(lww_extract, schema=out_schema)
    next_v = table.current_version() + 1
    out_dir = table.new_data_dir(next_v)
    mark("plan_built")
    sess = table.spark
    aqe_before = sess.conf.get("spark.sql.adaptive.enabled", "true")
    try:
        # fixed-shape query (explicit repartition, fixed slot count): AQE
        # cannot improve it and its per-stage re-planning adds latency to
        # every micro-batch.
        sess.conf.set("spark.sql.adaptive.enabled", "false")
        out.write.mode("append").parquet(out_dir)
    finally:
        sess.conf.set("spark.sql.adaptive.enabled", aqe_before)

    mark("job2_write")
    # ---- job 3: columnar read-back of the fresh files -> manifest
    # entries, per-bucket lineage, and merge stats in one tiny aggregation.
    rb = (table.spark.read.parquet(out_dir)
          .groupBy(F.input_file_name().alias("file"),
                   F.col("_bucket").alias("bucket"))
          .agg(F.count("*").alias("rows"),
               F.sum("_src").alias("from_batch"),
               F.sum(F.when((F.col("_src") == 1) & F.col("_deleted"), 1)
                     .otherwise(0)).alias("deletes"))
          .collect())
    per_file: dict[str, list[int]] = {}
    per_bucket: dict[int, dict[str, int]] = {}
    for r in rb:
        path = r["file"]
        path = path[7:] if path.startswith("file://") else path
        bkt = int(r["bucket"])
        per_file.setdefault(path, []).append(bkt)
        pb = per_bucket.setdefault(bkt, {"rows": 0, "events": 0})
        pb["rows"] += int(r["rows"])
        pb["events"] += int(r["from_batch"])
    new_entries = [{"path": p, "buckets": sorted(bs),
                    "schema_version": snap.schema_version}
                   for p, bs in per_file.items()]
    applied = sum(int(r["from_batch"]) for r in rb)
    deletes = sum(int(r["deletes"]) for r in rb)
    batch_counts = [v["events"] for v in per_bucket.values() if v["events"]]
    skew = (max(batch_counts) / (sum(batch_counts) / len(batch_counts))
            if batch_counts else 0.0)
    lineage = [{"bucket": b, **v} for b, v in sorted(per_bucket.items())]

    mark("job3_readback")
    carried = [f for f in snap.files if not (set(f["buckets"]) & touched)]
    active_buckets = sum(1 for v in per_bucket.values() if v["events"])
    stats = MergeStats(
        batch_id=batch_id, events_in=events_in,
        dedup_drops=events_in - applied, upserts=applied - deletes,
        deletes=deletes, touched_buckets=len(touched),
        total_buckets=snap.num_buckets, skew_ratio=round(skew, 3))
    committed = table.commit(
        files=carried + new_entries,
        summary={"operation": "merge", "stream_id": stream_id,
                 "active_buckets": active_buckets, **stats.to_dict()},
        properties={FENCE_PREFIX + stream_id: batch_id},
        lineage=lineage)
    stats.snapshot_version = committed.version
    mark("commit")
    if timing:
        segs = ", ".join(f"{lbl}={t1 - t0:.2f}s" for (_, t0), (lbl, t1)
                         in zip(tmarks, tmarks[1:]))
        print(f"[merge-timing] batch={batch_id} {segs}", flush=True)
    return stats
