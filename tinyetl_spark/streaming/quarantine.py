"""Dead-letter quarantine for malformed change events.

A 10^10-event CDC stream WILL carry garbage — agent bugs, truncated WAL
segments, upstream schema drift. The two naive behaviors both lose at
scale: crashing the stream on the first bad row (one poison event
stalls the whole pipeline until an operator intervenes) or silently
dropping bad rows (data loss nobody can audit). The reference's
row-loop surfaces per-row type errors to the operator at transfer time
(src/transfer.rs error paths); the streaming analogue is a dead-letter
queue: structurally invalid events are diverted to a quarantine sink
with machine-readable reasons, the valid remainder merges normally, and
the stream never stops.

Spark-first shape:
- Validation is a single Catalyst expression (``reject_reasons``): an
  ``array<string>`` built from per-rule ``when`` branches, evaluated
  inside whole-stage codegen during the batch's existing scan — no
  Python, no extra shuffle.
- The quarantine sink is idempotent under exactly-once replay: each
  micro-batch writes to its own ``batch_id=N`` subdirectory with
  overwrite semantics, so a replayed batch (epoch-fenced at the merge)
  rewrites byte-identical rejects instead of duplicating them.
- Rejects keep the FULL original event plus ``_reject_reasons`` and
  ``_batch_id`` — enough to replay them into the main stream after an
  upstream fix, which is the operational point of a DLQ.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# events larger than this are quarantined, not merged: a single 2 GB
# blob row breaks Arrow batch transfer and skews its sort partition;
# real crawls cap page size upstream (Common Crawl caps at ~1 MB)
DEFAULT_MAX_HTML_BYTES = 16 * 1024 * 1024

_VALID_OPS = ("insert", "update", "delete")


def reject_reasons(max_html_bytes: int = DEFAULT_MAX_HTML_BYTES) -> Column:
    """``array<string>`` of structural-validity violations for one event
    (empty array = valid). Pure Catalyst: evaluated in the scan stage.

    Rules (the merge's own preconditions, not business rules):
    - ``null_url`` / ``empty_url``: the MERGE key — unroutable without it
    - ``null_event_seq``: the LWW tiebreaker and idempotency key
    - ``null_warc_ts``: the LWW ordering column
    - ``bad_op``: op outside insert/update/delete
    - ``missing_html``: a non-delete carrying no payload
    - ``oversized_html``: payload above ``max_html_bytes``
    """
    rules = [
        (F.col("url").isNull(), "null_url"),
        (F.col("url").isNotNull() & (F.length("url") == 0), "empty_url"),
        (F.col("event_seq").isNull(), "null_event_seq"),
        (F.col("warc_ts").isNull(), "null_warc_ts"),
        (F.col("op").isNull() | ~F.col("op").isin(*_VALID_OPS), "bad_op"),
        ((F.col("op") != "delete") & F.col("html").isNull(),
         "missing_html"),
        (F.col("html").isNotNull()
         & (F.length("html") > max_html_bytes), "oversized_html"),
    ]
    arr = F.concat(*[
        F.when(cond, F.array(F.lit(name))).otherwise(F.array())
        for cond, name in rules
    ])
    return arr.alias("_reject_reasons")


def split_quarantine(events: DataFrame,
                     max_html_bytes: int = DEFAULT_MAX_HTML_BYTES
                     ) -> tuple[DataFrame, DataFrame]:
    """(valid, rejects): ``valid`` has the original schema; ``rejects``
    carries the original columns plus ``_reject_reasons``."""
    tagged = events.withColumn("_reject_reasons",
                               reject_reasons(max_html_bytes))
    valid = (tagged.filter(F.size("_reject_reasons") == 0)
                   .drop("_reject_reasons"))
    rejects = tagged.filter(F.size("_reject_reasons") > 0)
    return valid, rejects


def write_quarantine(rejects: DataFrame, quarantine_dir: str,
                     batch_id: int) -> int:
    """Write one batch's rejects to ``quarantine_dir/batch_id=N``
    (overwrite = replay-idempotent); returns the quarantined row count.

    The count comes from a cheap manifest read-back of the files just
    written — one extra job over O(rejects), not a second scan of the
    whole batch (rejects are assumed rare; the write itself already
    scanned the batch once)."""
    out = os.path.join(quarantine_dir, f"batch_id={batch_id}")
    rejects.write.mode("overwrite").parquet(out)
    spark = rejects.sparkSession
    return spark.read.parquet(out).count()


def read_quarantine(spark, quarantine_dir: str) -> DataFrame:
    """All quarantined events across batches (audit / replay-after-fix).
    The ``batch_id=N`` layout is standard partition discovery, so the
    frame comes back with a ``batch_id`` column attached."""
    return spark.read.parquet(quarantine_dir)
