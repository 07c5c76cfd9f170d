"""The lake table as a Structured Streaming SOURCE — streaming
change-data-feed via the PySpark 4 Python Data Source API.

``spark.readStream.format("tinyetl_cdf").option("path", table_path)``
tails the table's merge commits: each micro-batch delivers exactly the
change rows the commits in its offset range applied (same semantics as
``LakeTable.read_changes`` — lost-LWW events and maintenance commits
emit nothing), with ``_change_type`` / ``_commit_version`` /
``_batch_id`` columns appended. Offsets are snapshot versions, so the
checkpoint makes the feed resumable and exactly-once like any file
source.

Scale design: offset discovery reads only the O(1) metadata JSON on the
driver; the actual change files are read executor-side (one input
partition per file, pyarrow) — the driver never touches data. This is
the "binlog out" half of the CDC engine: downstream consumers chain
engines (table -> feed -> table) without re-reading state.

Reference tie-in: TinyETL has no incremental output at all (every run
re-copies, README.md:29); this is the Spark-native capability that
replaces scheduled full re-copies downstream.
"""

from __future__ import annotations

import json
import os
from typing import Any

from pyspark.sql.datasource import (DataSource, DataSourceStreamReader,
                                    InputPartition)
from pyspark.sql.types import (LongType, StringType, StructField,
                               StructType)

FORMAT_NAME = "tinyetl_cdf"


def _read_meta(path: str, version: int | None = None) -> tuple[dict, int]:
    meta = os.path.join(path, "metadata")
    if version is None:
        with open(os.path.join(meta, "VERSION")) as f:
            version = int(f.read().strip())
    with open(os.path.join(meta, f"v{version}.json")) as f:
        return json.load(f), version


def _current_schema(snap: dict) -> StructType:
    return StructType.fromJson(
        json.loads(snap["schemas"][str(snap["schema_version"])]))


class CdfPartition(InputPartition):
    def __init__(self, file_path: str, version: int, batch_id: int):
        self.file_path = file_path
        self.version = version
        self.batch_id = batch_id


class CdfStreamReader(DataSourceStreamReader):
    def __init__(self, schema: StructType, options: dict):
        self.path = options["path"]
        self.start = int(options.get("startversion", 0))
        self.out_schema = schema

    def initialOffset(self) -> dict:
        return {"version": self.start}

    def latestOffset(self) -> dict:
        _, v = _read_meta(self.path)
        return {"version": v}

    def partitions(self, start: dict, end: dict) -> list[CdfPartition]:
        parts: list[CdfPartition] = []
        prev = {f["path"]
                for f in _read_meta(self.path, start["version"])[0]["files"]}
        for v in range(start["version"] + 1, end["version"] + 1):
            snap, _ = _read_meta(self.path, v)
            new = [f for f in snap["files"] if f["path"] not in prev]
            prev = {f["path"] for f in snap["files"]}
            if snap["summary"].get("operation") != "merge":
                continue  # maintenance moves bytes, not state
            bid = int(snap["summary"].get("batch_id", -1))
            parts.extend(CdfPartition(f["path"], v, bid) for f in new)
        return parts

    def read(self, partition: CdfPartition):
        # executor-side: read ONE change file with pyarrow, keep the
        # _src=1 rows (the rows this commit actually applied), emit in
        # the declared output column order; columns a file's (older)
        # schema version lacks come out as None.
        import pyarrow.compute as pc
        import pyarrow.parquet as pq
        tbl = pq.read_table(partition.file_path)
        if "_src" in tbl.column_names:
            tbl = tbl.filter(pc.equal(tbl["_src"], 1))
        data_cols = [f.name for f in self.out_schema.fields
                     if f.name not in ("_change_type", "_commit_version",
                                       "_batch_id")]
        import pandas as pd
        pdf = tbl.to_pandas()
        if "_deleted" in pdf.columns:
            deleted = pdf["_deleted"].fillna(False).astype(bool)
        else:
            deleted = pd.Series([False] * len(pdf))

        def native(v):
            if v is None or (not isinstance(v, (bytes, bytearray))
                             and pd.isna(v)):
                return None
            if isinstance(v, pd.Timestamp):
                return v.to_pydatetime()   # tz-naive Timestamp rejected
            if hasattr(v, "item") and not isinstance(v, (bytes, bytearray)):
                return v.item()       # numpy scalar -> python native
            return v

        for i in range(len(pdf)):
            row = pdf.iloc[i]
            vals = [native(row[c]) if c in pdf.columns else None
                    for c in data_cols]
            change = "delete" if bool(deleted.iloc[i]) else "upsert"
            yield (*vals, change, partition.version, partition.batch_id)

    def commit(self, end: dict) -> None:
        pass


class CdfDataSource(DataSource):
    """format("tinyetl_cdf"): streaming CDF over a LakeTable path."""

    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self) -> StructType:
        snap, _ = _read_meta(self.options["path"])
        return StructType(
            _current_schema(snap).fields
            + [StructField("_change_type", StringType(), False),
               StructField("_commit_version", LongType(), False),
               StructField("_batch_id", LongType(), False)])

    def streamReader(self, schema: StructType) -> CdfStreamReader:
        return CdfStreamReader(schema, self.options)


def register_cdf_source(spark) -> None:
    """Idempotently register the format with this session."""
    spark.dataSource.register(CdfDataSource)
