"""Schema evolution mid-stream (north rule): add/widen a column between
micro-batches; old files conform on read; replay across the evolution
boundary reconverges."""

import pyspark.sql.functions as F
from pyspark.sql.types import (BooleanType, DoubleType, LongType, StringType,
                               StructField, StructType, TimestampType)

from tinyetl_spark import datagen
from tinyetl_spark.lake import LakeTable, merge_apply
from tinyetl_spark.schema import PAGES_SCHEMA
from tinyetl_spark.sources.eventlog import append_events
from tinyetl_spark.streaming.pipeline import run_to_completion


def test_add_column_mid_stream(spark, tmpdir_path):
    log, table, ckpt = (f"{tmpdir_path}/log", f"{tmpdir_path}/t",
                        f"{tmpdir_path}/ck")
    t = LakeTable.create(spark, table, PAGES_SCHEMA, key_col="url", num_buckets=4)
    ev = datagen.change_events(spark, 600, 80, seed=5)

    append_events(ev.filter("event_seq < 300"), log)
    run_to_completion(spark, log, table, ckpt)

    # evolve: add a quality score column (new crawler version starts
    # emitting it); widen nothing yet
    new_schema = StructType(PAGES_SCHEMA.fields +
                            [StructField("quality", DoubleType(), True)])
    t.evolve_schema(new_schema)

    # second slice arrives WITH the new column populated
    late = (ev.filter("event_seq >= 300")
              .withColumn("quality", (F.col("event_seq") % 100) / 100.0))
    append_events(late, log)   # log schema is fixed; quality rides via merge
    # the streaming source schema predates the column; apply the late slice
    # via merge directly to exercise conform-on-write of the wider schema
    merge_apply(t, late, batch_id=10**6, stream_id="manual")

    df = t.read()
    assert "quality" in df.columns
    # old rows (pre-evolution) -> null quality; new winners -> populated
    old = df.filter("event_seq < 300")
    new = df.filter("event_seq >= 300")
    assert old.filter(F.col("quality").isNotNull()).count() == 0
    assert new.filter(F.col("quality").isNotNull()).count() == new.count()
    # final LWW state matches the brute-force oracle over everything
    from tests.test_merge import brute_force_state
    oracle = brute_force_state(ev)
    got = df.select("url", "event_seq")
    assert got.exceptAll(oracle).count() == 0
    assert oracle.exceptAll(got).count() == 0


def test_widen_column_mid_stream(spark, tmpdir_path):
    """Widen a long to double between merges; both file generations read
    back under the widened schema."""
    schema = StructType([
        StructField("url", StringType(), False),
        StructField("warc_ts", TimestampType(), False),
        StructField("event_seq", LongType(), False),
        StructField("_deleted", BooleanType(), False),
        StructField("size", LongType(), True),
    ])
    t = LakeTable.create(spark, f"{tmpdir_path}/t", schema, key_col="url",
                         num_buckets=2)
    from datetime import datetime
    mk = lambda seq, url, size: (seq, url, datetime(2025, 1, 1, 0, 0, seq), "update", size)
    df1 = spark.createDataFrame([mk(1, "u1", 10), mk(2, "u2", 20)],
                                "event_seq long, url string, warc_ts timestamp, op string, size long")
    merge_apply(t, df1, 0, extract=False)

    widened = StructType([f if f.name != "size" else
                          StructField("size", DoubleType(), True)
                          for f in schema.fields])
    t.evolve_schema(widened)

    df2 = spark.createDataFrame(
        [(3, "u3", datetime(2025, 1, 1, 0, 0, 3), "update", 30.5)],
        "event_seq long, url string, warc_ts timestamp, op string, size double")
    merge_apply(t, df2, 1, extract=False)

    out = {r["url"]: r["size"] for r in t.read().collect()}
    assert out == {"u1": 10.0, "u2": 20.0, "u3": 30.5}
    assert dict(t.read().dtypes)["size"] == "double"
