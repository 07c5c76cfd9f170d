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

Implementation is a bucket-pruned copy-on-write:

1. dedup the batch per url (window row_number over the LWW order) — cheap,
   batch-local, never windows over the table;
2. prune: only table buckets containing a batch url are read (manifest-level
   partition pruning — at 100 TB a micro-batch touches a small fraction of
   4096 buckets);
3. union current rows of touched buckets with batch winners and take the
   LWW winner per url — one hash shuffle on url, sized by AQE;
4. rewrite only touched buckets; untouched buckets' files carry over into
   the new snapshot unchanged;
5. atomic snapshot commit carrying the (stream_id → batch_id) epoch fence
   and per-partition lineage metrics.

Exactly-once: if foreachBatch retries a batch, either the fence shows it
committed (skip), or the merge re-runs — and re-running is a no-op because
LWW over (warc_ts, event_seq) is idempotent.
"""

from __future__ import annotations

from dataclasses import dataclass, asdict
from typing import Any

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

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
    """Last-writer-wins winner per key within the batch."""
    w = Window.partitionBy(key).orderBy(
        F.col("warc_ts").desc(), F.col("event_seq").desc())
    return (batch.withColumn("_rn", F.row_number().over(w))
                 .filter(F.col("_rn") == 1).drop("_rn"))


def merge_apply(table: LakeTable, batch: DataFrame, batch_id: int,
                stream_id: str = "default",
                extract_fn=None) -> MergeStats:
    """Apply one micro-batch of change events to the table.

    ``batch`` columns: event_seq, url, warc_ts, op, html, lang (+ extras
    that exist in the table schema). ``extract_fn(df) -> df`` optionally
    derives columns (e.g. html→text) on the *deduped winners only* — the
    expensive vectorized UDF runs once per surviving url, not per event.
    """
    snap = table.snapshot()
    key = snap.key_col

    # ---- epoch fence: skip replayed batches that already committed
    if batch_id <= last_committed_batch(table, stream_id):
        return MergeStats(batch_id, 0, 0, 0, 0, 0, snap.num_buckets, 0.0,
                          fenced=True, snapshot_version=snap.version)

    events_in = batch.count()
    winners = dedup_batch(batch, key).cache()
    try:
        n_winners = winners.count()
        if extract_fn is not None:
            winners_x = extract_fn(winners)
        else:
            winners_x = winners

        # ---- per-partition lineage + skew metric on the batch key space
        bucket_counts = (
            winners.groupBy(table.bucket_expr().alias("bucket"))
                   .agg(F.count("*").alias("events"))
                   .collect())
        touched = {int(r["bucket"]) for r in bucket_counts}
        counts = [r["events"] for r in bucket_counts]
        skew = (max(counts) / (sum(counts) / len(counts))) if counts else 0.0
        lineage = [{"bucket": int(r["bucket"]), "events": int(r["events"])}
                   for r in bucket_counts]

        deletes = winners.filter(F.col("op") == "delete").count()

        # ---- build new content of touched buckets: current ∪ winners → LWW
        cur = table.read(buckets=touched, include_tombstones=True)
        b = winners_x.withColumn("_deleted", F.col("op") == F.lit("delete"))
        b = conform(b, snap.schema)
        merged = cur.unionByName(b)
        w = Window.partitionBy(key).orderBy(
            F.col("warc_ts").desc(), F.col("event_seq").desc())
        final = (merged.withColumn("_rn", F.row_number().over(w))
                       .filter(F.col("_rn") == 1).drop("_rn"))

        # ---- write new files for touched buckets, carry the rest
        next_v = table.current_version() + 1
        new_entries = table.write_data(final, next_v,
                                       buckets_hint=max(len(touched), 1))
        carried = [f for f in snap.files if f["bucket"] not in touched]
        upserts = n_winners - deletes
        stats = MergeStats(
            batch_id=batch_id, events_in=events_in,
            dedup_drops=events_in - n_winners, upserts=upserts,
            deletes=deletes, touched_buckets=len(touched),
            total_buckets=snap.num_buckets, skew_ratio=round(skew, 3))
        committed = table.commit(
            files=carried + new_entries,
            summary={"operation": "merge", "stream_id": stream_id,
                     **stats.to_dict()},
            properties={FENCE_PREFIX + stream_id: batch_id},
            lineage=lineage)
        stats.snapshot_version = committed.version
        return stats
    finally:
        winners.unpersist()
