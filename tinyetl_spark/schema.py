"""Table schemas + declared-schema validation stage.

``PAGES_SCHEMA`` is the north-rule input table (BASELINE.json input_hint)
plus the engine's system columns:

- ``event_seq``: WAL position of the winning event — needed for the
  idempotent LWW comparison on replay (MERGE key is (url, event_seq));
- ``_deleted``: tombstone marker so late out-of-order upserts cannot
  resurrect deleted rows (filtered out on read).

The validation half re-expresses the reference's per-row schema-file
contract (/root/reference/src/schema.rs:63-244: type / nullable / regex
pattern / default) as Catalyst column expressions — validation runs
JVM-side over whole batches, not per row.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (BinaryType, BooleanType, LongType, StringType,
                               StructField, StructType, TimestampType)

# north-rule table: (url, warc_ts, html, text, lang) + system cols
PAGES_SCHEMA = StructType([
    StructField("url", StringType(), False),
    StructField("warc_ts", TimestampType(), False),
    StructField("html", BinaryType(), True),
    StructField("text", StringType(), True),
    StructField("lang", StringType(), True),
    StructField("event_seq", LongType(), False),
    StructField("_deleted", BooleanType(), False),
])

# change-event (binlog/WAL record) shape emitted by the streaming source
EVENTS_SCHEMA = StructType([
    StructField("event_seq", LongType(), False),
    StructField("url", StringType(), False),
    StructField("warc_ts", TimestampType(), False),
    StructField("op", StringType(), False),      # insert | update | delete
    StructField("html", BinaryType(), True),
    StructField("lang", StringType(), True),
])

_TYPE_MAP = {
    "string": StringType(), "integer": LongType(), "long": LongType(),
    "boolean": BooleanType(), "timestamp": TimestampType(),
    "binary": BinaryType(),
}


@dataclass
class ColumnRule:
    """One declared column: reference schema-file semantics
    (/root/reference/src/schema.rs:63-146)."""
    name: str
    type: str = "string"
    nullable: bool = True
    pattern: str | None = None      # regex the value must match
    default: str | None = None      # applied when null


@dataclass
class DeclaredSchema:
    columns: list[ColumnRule] = field(default_factory=list)

    @staticmethod
    def from_dict(d: dict) -> "DeclaredSchema":
        cols = [ColumnRule(name=k, **(v or {})) for k, v in d.get("columns", {}).items()]
        return DeclaredSchema(cols)

    def spark_schema(self) -> StructType:
        return StructType([
            StructField(c.name, _TYPE_MAP[c.type], c.nullable) for c in self.columns
        ])

    def apply(self, df: DataFrame, on_violation: str = "error") -> DataFrame:
        """Defaults → casts → validation, as whole-column expressions.

        ``on_violation='error'`` mirrors the reference (halt on first bad
        row, src/schema.rs:160-164); ``'drop'`` filters bad rows instead
        (the scalable choice for dirty web data — quarantine, don't halt).
        """
        for c in self.columns:
            col = F.col(c.name) if c.name in df.columns else F.lit(None)
            if c.default is not None:
                col = F.coalesce(col.cast("string"), F.lit(c.default))
            df = df.withColumn(c.name, col.cast(_TYPE_MAP[c.type]))
        checks = []
        for c in self.columns:
            if not c.nullable and c.default is None:
                checks.append(F.col(c.name).isNotNull())
            if c.pattern:
                checks.append(F.col(c.name).isNull() |
                              F.col(c.name).cast("string").rlike(c.pattern))
        if not checks:
            return df.select(*[c.name for c in self.columns])
        ok = checks[0]
        for ch in checks[1:]:
            ok = ok & ch
        df = df.withColumn("_valid", ok)
        if on_violation == "drop":
            out = df.filter(F.col("_valid"))
        else:
            bad = df.filter(~F.col("_valid")).limit(1).collect()
            if bad:
                raise ValueError(f"schema validation failed, first bad row: {bad[0]}")
            out = df
        return out.select(*[c.name for c in self.columns])
