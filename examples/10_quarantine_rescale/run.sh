#!/bin/bash
# Operating a long-lived CDC stream: malformed events land in a
# dead-letter quarantine (with machine-readable reasons) instead of
# poisoning the merge, and the bucket count evolves automatically as
# the table grows — the two maintenance behaviors a 10^10-event stream
# needs that a demo-sized one never shows.
source "$(dirname "$0")/../_common.sh"

python - <<'EOF'
import pyspark.sql.functions as F
from pyspark.sql import Row, Window
from pyspark.sql.types import StructField, StructType

from tinyetl_spark import datagen
from tinyetl_spark.lake import LakeTable
from tinyetl_spark.schema import EVENTS_SCHEMA, PAGES_SCHEMA
from tinyetl_spark.session import get_spark
from tinyetl_spark.sources.eventlog import append_events
from tinyetl_spark.streaming.pipeline import run_to_completion
from tinyetl_spark.streaming.quarantine import read_quarantine

spark = get_spark(cores=4)
spark.sparkContext.setLogLevel("ERROR")

# a healthy stream plus a handful of contract-violating events
good = datagen.change_events(spark, 3000, 600, seed=99)
nullable = StructType([StructField(f.name, f.dataType, True)
                       for f in EVENTS_SCHEMA.fields])
import datetime as dt
ts = dt.datetime(2025, 1, 1, tzinfo=dt.timezone.utc)
bad = spark.createDataFrame([
    Row(event_seq=90001, url=None, warc_ts=ts, op="insert",
        html=b"x", lang="en"),
    Row(event_seq=90002, url="http://x/", warc_ts=ts, op="upsert",
        html=b"x", lang="en"),
    Row(event_seq=90003, url="http://y/", warc_ts=ts, op="insert",
        html=None, lang="en"),
], nullable)
append_events(good.unionByName(bad), "log", segment_partitions=6)

LakeTable.create(spark, "lake/pages", PAGES_SCHEMA, key_col="url",
                 num_buckets=2)
stats = run_to_completion(
    spark, "log", "lake/pages", "ckpt",
    max_files_per_trigger=2,
    quarantine_dir="dlq",
    auto_rescale_rows_per_bucket=100)

assert sum(s.events_quarantined for s in stats) == 3, stats
dlq = read_quarantine(spark, "dlq")
reasons = sorted(r["_reject_reasons"][0] for r in dlq.collect())
assert reasons == ["bad_op", "missing_html", "null_url"], reasons

t = LakeTable(spark, "lake/pages")
snap = t.snapshot()
assert snap.num_buckets > 2, snap.num_buckets   # grew with the table
ops = [t.snapshot(v).summary.get("operation") for v in t.versions()]
assert "rescale" in ops, ops

# final state still equals the brute-force LWW oracle over GOOD events
w = Window.partitionBy("url").orderBy(F.desc("warc_ts"),
                                      F.desc("event_seq"))
oracle = (good.withColumn("rn", F.row_number().over(w))
              .filter("rn = 1 and op <> 'delete'")
              .select("url", "event_seq"))
final = t.read().select("url", "event_seq")
assert final.exceptAll(oracle).count() == 0
assert oracle.exceptAll(final).count() == 0
print(f"converged: {final.count()} urls, buckets={snap.num_buckets}, "
      f"quarantined={dlq.count()}")
EOF
echo "=== 10_quarantine_rescale PASSED ==="
