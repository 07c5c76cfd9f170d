"""Row-level DML outside the CDC stream: DELETE FROM / UPDATE ... WHERE.

Iceberg and Delta expose ad-hoc row-level deletes (GDPR erasure, bad-crawl
purges) and updates next to their streaming upsert path; the reference has
no equivalent (its only write shapes are append/truncate,
/root/reference/src/connectors/csv.rs:163-199).

Design: DML is routed THROUGH the merge machinery instead of growing a
second rewrite path. Matching live rows become change events that win
last-writer-wins against themselves — same ``warc_ts``, ``event_seq + 1``
— and ``merge_apply`` does the rest. Everything the engine already
guarantees therefore holds for DML with zero extra code:

- the change feed emits the deletes/updates (a ``replicate`` mirror
  converges — a maintenance-style direct rewrite would silently skip CDF
  and desynchronize every downstream consumer);
- deletes leave tombstones, so late out-of-order events cannot resurrect
  the erased row;
- only key-touched buckets rewrite (COW) or receive deltas (MOR) — the
  scan to FIND matches is a full pruned read, but the WRITE is O(matches),
  not O(table);
- a later real event with a newer (warc_ts, event_seq) still supersedes
  the DML row — standard CDC semantics, deletion is not a write freeze.

Determinism: (same ts, seq+1) is a pure function of current state, so
re-running the same DML on the same snapshot produces the same commit;
running it twice in a row is a no-op the second time (deletes: nothing
matches anymore; updates: matches produce identical winning rows only if
the assignments are idempotent — a non-idempotent assignment like
``value + 1`` applies again, exactly like SQL UPDATE).
"""

from __future__ import annotations

import pyspark.sql.functions as F

from tinyetl_spark.lake.merge import MergeStats, merge_apply
from tinyetl_spark.lake.table import LakeTable

DML_STREAM = "dml"


def delete_where(table: LakeTable, condition: str) -> MergeStats:
    """Delete every live row matching the SQL ``condition``.

    Emits one ``delete`` change event per matching row at
    (row.warc_ts, row.event_seq + 1) and merge-applies it — the
    tombstone wins LWW over the row it erases and the change feed
    carries the delete to every mirror."""
    snap = table.snapshot()
    live = table.read().filter(F.expr(condition))
    events = live.select(
        (F.col("event_seq") + 1).alias("event_seq"),
        F.col(snap.key_col),
        F.col("warc_ts"),
        F.lit("delete").alias("op"),
        F.lit(None).cast("binary").alias("html"),
        F.lit(None).cast("string").alias("lang"),
    )
    return merge_apply(table, events, batch_id=table.current_version(),
                       stream_id=DML_STREAM, extract=False)


def update_where(table: LakeTable, condition: str,
                 assignments: dict[str, str]) -> MergeStats:
    """Update matching live rows: ``assignments`` maps column name to a
    SQL expression evaluated against the row (``{"lang": "'en'"}`` or
    ``{"text": "upper(text)"}``). The key column and the system columns
    cannot be assigned (changing the key is a delete + insert, not an
    update). Each matching row becomes an ``update`` event carrying ALL
    of its columns with the assignments applied, at (same warc_ts,
    event_seq + 1), so it wins LWW over itself and nothing else."""
    snap = table.snapshot()
    forbidden = {snap.key_col, "warc_ts", "event_seq", "_deleted"}
    bad = forbidden & set(assignments)
    if bad:
        raise ValueError(f"cannot assign {sorted(bad)} — the merge key, "
                         "ordering columns and system columns are "
                         "immutable in an UPDATE")
    unknown = set(assignments) - {f.name for f in snap.schema.fields}
    if unknown:
        raise ValueError(f"unknown columns in assignments: "
                         f"{sorted(unknown)}")
    live = table.read().filter(F.expr(condition))
    for col, expr in assignments.items():
        live = live.withColumn(col, F.expr(expr))
    payload = [c for c in live.columns
               if c not in ("event_seq", "op", "_deleted")]
    events = live.select(
        (F.col("event_seq") + 1).alias("event_seq"),
        F.lit("update").alias("op"),
        *[F.col(c) for c in payload],
    )
    # events carry the final text/lang verbatim — never re-extract
    return merge_apply(table, events, batch_id=table.current_version(),
                       stream_id=DML_STREAM, extract=False)


def transform_rows(table: LakeTable, condition: str, fn,
                   extract: bool = False) -> MergeStats:
    """UPDATE WHERE with an arbitrary DataFrame transform instead of SQL
    assignments — the reprocessing shape: after an extractor upgrade,
    re-derive ``text`` from stored ``html`` for historical rows
    (``extract=True`` runs the engine's vectorized extractor); or apply
    any df→df function (vectorized pandas UDFs included) to the
    matching slice.

    ``fn(df) -> df`` receives the matching live rows and must return
    the same rows transformed; the key column, ``warc_ts`` and
    ``event_seq`` must come back unchanged (they are how each row wins
    LWW over exactly itself — the result is re-stamped at
    (same warc_ts, event_seq + 1) like every DML). Dropping rows from
    the result leaves the stored rows as-is; emitting a NEW key merges
    as an insert at the stamped (warc_ts, seq) — defined, but almost
    never what a transform means, so keep the key set intact.
    ``fn=None`` with ``extract=True`` is the pure re-extraction
    maintenance call."""
    snap = table.snapshot()
    live = table.read().filter(F.expr(condition))
    out = fn(live) if fn is not None else live
    missing = {snap.key_col, "warc_ts", "event_seq"} - set(out.columns)
    if missing:
        raise ValueError(f"transform dropped identity columns: "
                         f"{sorted(missing)}")
    payload = [c for c in out.columns
               if c not in ("event_seq", "op", "_deleted")]
    events = out.select(
        (F.col("event_seq") + 1).alias("event_seq"),
        F.lit("update").alias("op"),
        *[F.col(c) for c in payload],
    )
    return merge_apply(table, events, batch_id=table.current_version(),
                       stream_id=DML_STREAM, extract=extract)
