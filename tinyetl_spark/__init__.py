"""tinyetl_spark — a PySpark-native CDC/incremental-ingest engine.

A brand-new engine with the *capabilities* of the reference (TinyETL,
/root/reference — a single-binary batch EL(T) mover, src/transfer.rs:23-199),
re-expressed Spark-first per the north rule: a Structured Streaming
change-event tail → last-writer-wins dedup → MERGE-apply into an ACID
lake table of Common-Crawl-style web pages, exactly-once, schema-evolving,
resumable from checkpoint, with explicit partitioning/skew handling.

Nothing here is a port: the reference's row-at-a-time Lua pipeline becomes
declarative DataFrame expressions optimized by Catalyst; its batch cursor
loop becomes micro-batches; its append-only INSERT sink becomes an
idempotent, epoch-fenced MERGE keyed on (url, event_seq).

NOTE on Iceberg: the sandbox has no iceberg-spark-runtime jar and no
network, so ``tinyetl_spark.lake`` implements the required table semantics
(atomic snapshot-per-commit, snapshot summaries for epoch fencing, schema
evolution, time travel, bucket-partition pruning) from scratch over parquet,
following the publicly documented Iceberg spec concepts. The engine API is
written against the ``LakeTable`` interface so a real Iceberg catalog can be
swapped in on a cluster.
"""

__version__ = "0.1.0"

from tinyetl_spark.session import get_spark  # noqa: F401
