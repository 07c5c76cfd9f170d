"""Stream-stream interval join (streaming/joins.py): convergence to the
batch range join, state retention across a checkpointed restart."""

import os

import pytest

from tinyetl_spark.operators.ranges import range_join
from tinyetl_spark.streaming.joins import interval_join_streams

SCHEMA_L = "imp_id long, adv string, ts timestamp"
SCHEMA_R = "click_id long, adv string, cts timestamp"


def _frame(spark, schema, rows):
    return spark.createDataFrame(rows, schema)


def _ts(s):
    import datetime
    return datetime.datetime(2026, 1, 1, 12, 0, 0) + datetime.timedelta(
        seconds=s)


@pytest.fixture()
def dirs(tmpdir_path):
    d = {k: os.path.join(tmpdir_path, k) for k in ("l", "r", "ck", "out")}
    os.makedirs(d["l"]), os.makedirs(d["r"])
    return d


def _imps(spark, lo, hi):
    return _frame(spark, SCHEMA_L,
                  [(i, f"adv{i % 3}", _ts(i * 10)) for i in range(lo, hi)])


def _clicks(spark, lo, hi):
    # click j fires 0/7/25s after impression j's time; 25s falls outside
    # the 20s window -> deliberate non-matches in the fixture
    return _frame(spark, SCHEMA_R,
                  [(j, f"adv{j % 3}", _ts(j * 10 + (j % 3) * 7 + (j % 5)))
                   for j in range(lo, hi)])


def _run_stream(spark, dirs):
    l = spark.readStream.schema(SCHEMA_L).parquet(dirs["l"])
    r = spark.readStream.schema(SCHEMA_R).parquet(dirs["r"])
    joined = interval_join_streams(l, r, on=["adv"], left_time="ts",
                                   right_time="cts", lower_seconds=0,
                                   upper_seconds=20,
                                   watermark_seconds=3600)
    # file sink, not memory: the memory sink cannot RESUME from a
    # checkpoint, and checkpointed restart is exactly what the state
    # test exercises
    q = (joined.writeStream.format("parquet")
         .option("path", dirs["out"])
         .option("checkpointLocation", dirs["ck"])
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    return spark.read.schema(
        "imp_id long, adv string, ts timestamp, click_id long, "
        "cts timestamp").parquet(dirs["out"])


def _batch_oracle(spark, imps, clicks):
    return range_join(imps, clicks, on=["adv"], left_time="ts",
                      right_time="cts", lower_seconds=0, upper_seconds=20)


def _key_set(df):
    return sorted((r["imp_id"], r["click_id"]) for r in
                  df.select("imp_id", "click_id").collect())


def test_stream_join_converges_to_batch_range_join(spark, dirs):
    imps, clicks = _imps(spark, 0, 30), _clicks(spark, 0, 30)
    imps.write.mode("append").parquet(dirs["l"])
    clicks.write.mode("append").parquet(dirs["r"])
    got = _key_set(_run_stream(spark, dirs))
    exp = _key_set(_batch_oracle(spark, imps, clicks))
    assert len(exp) > 10, "fixture must produce real matches"
    assert got == exp


def test_stream_join_output_columns(spark, dirs):
    _imps(spark, 0, 5).write.mode("append").parquet(dirs["l"])
    _clicks(spark, 0, 5).write.mode("append").parquet(dirs["r"])
    l = spark.readStream.schema(SCHEMA_L).parquet(dirs["l"])
    r = spark.readStream.schema(SCHEMA_R).parquet(dirs["r"])
    joined = interval_join_streams(l, r, on=["adv"], left_time="ts",
                                   right_time="cts", lower_seconds=0,
                                   upper_seconds=20)
    assert joined.isStreaming
    assert joined.columns == ["imp_id", "adv", "ts", "click_id", "cts"]


def test_state_survives_checkpointed_restart(spark, dirs):
    """A left row whose match arrives in a LATER run must still pair:
    the symmetric-hash-join state lives in the checkpoint."""
    # run 1: impressions only — no output possible
    imps = _imps(spark, 0, 20)
    imps.write.mode("append").parquet(dirs["l"])
    # availableNow needs at least one file on each side for the plan;
    # give the right side one matchless row far in the future
    far = _frame(spark, SCHEMA_R, [(999, "advX", _ts(10**6))])
    far.write.mode("append").parquet(dirs["r"])
    out1 = _run_stream(spark, dirs)
    assert out1.count() == 0
    # run 2 (same checkpoint): the clicks arrive — cross-run matches
    clicks = _clicks(spark, 0, 20)
    clicks.write.mode("append").parquet(dirs["r"])
    out2 = _key_set(_run_stream(spark, dirs))
    exp = _key_set(_batch_oracle(spark, imps, clicks))
    assert out2 == exp and len(exp) > 5
