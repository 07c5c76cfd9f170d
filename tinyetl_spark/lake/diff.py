"""State-based snapshot diff: derive a net change feed between two table
versions.

``read_changes`` (table.py) replays the per-commit change rows — the
"binlog out" view. ``diff_snapshots`` answers the complementary
question: *what is the net difference between two snapshot STATES*,
i.e. the minimal set of insert/update/delete events that transforms the
visible state at ``from_version`` into the visible state at
``to_version``. This is the classic "CDC when the source has no binlog"
primitive (Iceberg's ``create_changelog_view`` over snapshot pairs,
Delta's table_changes fallback), and the recovery path when a
consumer's CDF window has been expired away: re-seed by diffing its
last-known version against the current one.

Scale shape (the 100-TB question):

* **Bucket-granular incremental pruning.** A bucket whose file set is
  path-identical in both manifests provably holds identical state (the
  LWW resolution is a pure function of the bucket's files), so it is
  pruned from BOTH reads at the manifest level — zero IO. After a
  small merge commit touching k of 4096 buckets, the diff reads only
  those k buckets no matter how large the table is. Pruning is skipped
  when the bucket count changed between the versions (ids are not
  comparable across a rescale) — a rescale rewrites everything anyway.
* **One shuffle, no join.** Both sides are tagged and unioned, then a
  single hash aggregation on the key picks each side's (unique) row —
  map-side partial aggregation applies, and there is no join to plan,
  no skew ambiguity: exactly one Exchange on the key column.
* **Schema-evolution safe.** Each side reads conformed to its own
  snapshot schema; the old side is then conformed (union-by-name cast)
  to the new schema, so an added column diffs as null→value (update)
  exactly like Iceberg's changelog semantics.
* **Maintenance-commit immune.** Compaction/rescale commits move bytes,
  not state; a path-level file-set change makes the affected buckets
  un-prunable, but the value-level comparison still reports no rows
  for unchanged keys.

Per-field comparison uses null-safe inequality (``IS DISTINCT FROM``
semantics, mirrored verbatim by the SQL oracle) — never a hash, so a
reported update is exact, not probabilistic.

Reference parity note: TinyETL has no lake/snapshot layer at all (its
targets are truncate-or-append sinks, src/transfer.rs); this operator
exists because the north-star CDC engine needs consumer re-seeding.
"""
from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tinyetl_spark.lake.table import LakeTable, conform

#: column carrying the change classification in the returned frame
CHANGE_COL = "_change_type"


def _changed_buckets(old_snap, new_snap) -> set[int] | None:
    """Buckets whose file sets differ between the two manifests — the
    only buckets whose state can differ. None = cannot prune (bucket
    ids not comparable across a rescale)."""
    if old_snap.num_buckets != new_snap.num_buckets:
        return None
    old_files = {f["path"]: f for f in old_snap.files}
    new_files = {f["path"]: f for f in new_snap.files}
    changed: set[int] = set()
    for path in set(old_files) ^ set(new_files):
        f = old_files.get(path) or new_files[path]
        changed |= set(f["buckets"])
    return changed


def diff_snapshots(table: LakeTable, from_version: int,
                   to_version: int | None = None,
                   buckets: set[int] | None = None,
                   columns: list[str] | None = None) -> DataFrame:
    """Net state diff ``from_version -> to_version`` (default: current).

    Returns one row per key whose visible state changed, with columns =
    the ``to_version`` snapshot schema (internal ``_``-columns dropped)
    plus ``_change_type`` ('insert' | 'update' | 'delete'),
    ``_from_version`` and ``_to_version``. Inserts and updates carry the
    post-image; deletes carry the pre-image (the consumer needs the key
    and knows the rest is gone). Keys whose state is identical in both
    snapshots emit nothing — including keys only touched by compaction.

    ``buckets`` optionally restricts the diff to a bucket subset (both
    snapshots must share a bucket count).

    ``columns`` optionally restricts comparison AND output to a payload
    subset — the projection reaches both parquet scans (column
    pruning), so a drift check over (url, event_seq) never reads the
    fat ``html`` blobs. Note Spark's HashAggregate only takes
    fixed-width buffer types: a string/binary payload column demotes
    the (single-shuffle) aggregation to a SortAggregate over the
    changed-bucket subset, so narrowing ``columns`` to numeric/
    timestamp fields also upgrades the agg to hash-based.
    """
    old_snap = table.snapshot(from_version)
    new_snap = table.snapshot(to_version)
    key = new_snap.key_col
    if old_snap.key_col != key:
        raise ValueError(
            f"key column changed between v{from_version} ({old_snap.key_col})"
            f" and v{new_snap.version} ({key}) — snapshots not diffable")

    pruned = _changed_buckets(old_snap, new_snap)
    if buckets is not None:
        if pruned is None:
            raise ValueError(
                "bucket-restricted diff across a bucket-count change "
                f"({old_snap.num_buckets} -> {new_snap.num_buckets}): "
                "bucket ids are not comparable")
        pruned &= buckets
    cur = new_snap.schema
    out_fields = [f.name for f in cur.fields if not f.name.startswith("_")]
    payload = [c for c in out_fields if c != key]
    if columns is not None:
        unknown = set(columns) - set(payload)
        if unknown:
            raise ValueError(f"columns not in the table payload: "
                             f"{sorted(unknown)} (have {payload})")
        payload = [c for c in payload if c in set(columns)]

    proj = [key] + payload
    old_df = conform(
        table.read(version=from_version, buckets=pruned), cur).select(proj)
    new_df = table.read(version=new_snap.version,
                        buckets=pruned).select(proj)

    types = {f.name: f.dataType for f in cur.fields}

    def side(df: DataFrame, tag: int) -> DataFrame:
        # flat per-side columns (not a struct): max() over primitives is
        # hash-aggregable, so the single shuffle feeds a HashAggregate —
        # max(struct) would demote the whole aggregation to a
        # SortAggregate and sort every partition of both snapshots
        cols = [F.col(key),
                (F.lit(1) if tag == 0 else F.lit(None).cast("int"))
                .alias("_in_old"),
                (F.lit(1) if tag == 1 else F.lit(None).cast("int"))
                .alias("_in_new")]
        for c in payload:
            null = F.lit(None).cast(types[c])
            cols.append((F.col(c) if tag == 0 else null).alias(f"_o_{c}"))
            cols.append((F.col(c) if tag == 1 else null).alias(f"_n_{c}"))
        return df.select(*cols)

    # one Exchange on the key: union + hash-agg. The key is unique per
    # side, so max() (null-skipping) just selects that side's single
    # value; the explicit _in_old/_in_new presence flags keep an
    # all-null payload row distinguishable from an absent key.
    both = side(old_df, 0).unionByName(side(new_df, 1))
    g = both.groupBy(key).agg(
        F.max("_in_old").alias("_in_old"), F.max("_in_new").alias("_in_new"),
        *[F.max(f"_o_{c}").alias(f"_o_{c}") for c in payload],
        *[F.max(f"_n_{c}").alias(f"_n_{c}") for c in payload])

    differs = reduce(
        lambda a, b: a | b,
        [~F.col(f"_o_{c}").eqNullSafe(F.col(f"_n_{c}")) for c in payload])
    change = (F.when(F.col("_in_old").isNull(), F.lit("insert"))
               .when(F.col("_in_new").isNull(), F.lit("delete"))
               .when(differs, F.lit("update")))
    g = g.withColumn(CHANGE_COL, change).filter(F.col(CHANGE_COL).isNotNull())

    def image(c):
        return F.when(F.col(CHANGE_COL) == "delete",
                      F.col(f"_o_{c}")).otherwise(F.col(f"_n_{c}"))
    return g.select(
        F.col(key),
        *[image(c).alias(c) for c in payload],
        F.col(CHANGE_COL),
        F.lit(old_snap.version).cast("long").alias("_from_version"),
        F.lit(new_snap.version).cast("long").alias("_to_version"))
