"""SCD2 history materialization from a change-event stream.

Slowly-Changing-Dimension type 2: instead of keeping only the
last-writer-wins winner per key (the lake table's MERGE semantics), keep
EVERY version as a row with a validity interval — the standard warehouse
shape for "what did this row look like at time T?" queries, and the
natural batch materialization of this engine's change-data-feed.

Semantics over the engine's change-event shape (url, warc_ts, event_seq,
op, ...):

- events of a key are versioned in ``(warc_ts ASC, event_seq ASC)``
  order (the same total order LWW reads backwards);
- each non-delete event opens an interval at its ``warc_ts``; the next
  event of the same key closes it (``valid_to`` = next ``warc_ts``,
  exclusive);
- a delete event closes the previous interval and emits no row of its
  own — computed for free by taking ``lead(warc_ts)`` BEFORE filtering
  deletes;
- ``is_current`` = the interval is open AND the last event was not a
  delete (an open interval after a delete cannot exist by construction).

Scale shape: one shuffle on the key + one sort + one window — identical
to the LWW merge pattern, no self-join, no driver state; at 100 TB the
same plan fans out across executors and skewed keys fall under the same
AQE/salting controls as every other keyed window in this engine.

Reference parity: TinyETL has no history/versioning concept at all
(its ``skip_existing`` flag was never implemented — SURVEY §2.1 W3);
this is part of the CDC surface the north rule mandates.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def scd2_history(changes: DataFrame, key: str = "url",
                 ts_col: str = "warc_ts", seq_col: str = "event_seq",
                 op_col: str = "op", delete_value: str = "delete",
                 ) -> DataFrame:
    """Materialize the SCD2 validity-interval history of a change stream.

    Returns the input's non-delete rows with three added columns:
    ``valid_from`` (= ts_col), ``valid_to`` (next event's ts, null while
    open) and ``is_current``.
    """
    w = Window.partitionBy(key).orderBy(F.col(ts_col).asc(),
                                        F.col(seq_col).asc())
    return (changes
            .withColumn("valid_from", F.col(ts_col))
            .withColumn("valid_to", F.lead(ts_col).over(w))
            .filter(F.col(op_col) != F.lit(delete_value))
            .withColumn("is_current", F.col("valid_to").isNull()))


def as_of(history: DataFrame, ts, key: str = "url") -> DataFrame:
    """Point-in-time view over an SCD2 history: the version of each key
    valid at ``ts`` (valid_from <= ts < valid_to, open intervals
    included). Plain filters — Catalyst prunes partitions/files on
    valid_from when the history is stored sorted/partitioned by time."""
    t = F.lit(ts)
    return history.filter((F.col("valid_from") <= t)
                          & (F.col("valid_to").isNull()
                             | (F.col("valid_to") > t)))
