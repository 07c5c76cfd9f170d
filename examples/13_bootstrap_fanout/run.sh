#!/bin/bash
# Snapshot-then-stream bootstrap + multi-table fan-out: the two shapes
# every production CDC deployment starts with. (1) `etl bootstrap` bulk-
# loads a consistent source snapshot, then the stream tails the log from
# BEFORE the snapshot cut and reconverges by LWW idempotency. (2) `etl
# fanout` feeds one routed change log into two tables with independent
# epoch fences, strays going to a dead-letter dir.
source "$(dirname "$0")/../_common.sh"

# -- make a snapshot (consistent read at WAL cut 500) + the full log
python - <<'EOF'
import pyspark.sql.functions as F
from pyspark.sql import Window
from tinyetl_spark import datagen
from tinyetl_spark.session import get_spark
from tinyetl_spark.sources.eventlog import append_events

spark = get_spark(cores=4)
spark.sparkContext.setLogLevel("ERROR")
ev = datagen.change_events(spark, 1000, 120, seed=21)
# snapshot = LWW winners at WAL cut 500, rows AND tombstones (op col) —
# the stream has out-of-order timestamps, so a rows-only snapshot could
# be resurrected by replayed stale events (see bootstrap_snapshot docs)
w = Window.partitionBy("url").orderBy(F.desc("warc_ts"), F.desc("event_seq"))
(ev.filter("event_seq < 500")
   .withColumn("rn", F.row_number().over(w))
   .filter("rn = 1")
   .select("url", "warc_ts", "html", "lang", "event_seq", "op")
   .write.parquet("snapshot.parquet"))
# the tail starts at 300 — 200 events OVERLAP the snapshot on purpose
append_events(ev.filter("event_seq >= 300"), "log", segment_partitions=2)
ev.write.parquet("all_events")
EOF

OUT="$(etl bootstrap snapshot.parquet pages --seq-col event_seq --op-col op --num-buckets 8)"
echo "$OUT"
case "$OUT" in *"bootstrapped"*) echo "ok: bootstrap ran";; *) echo "FAIL: no bootstrap output" >&2; exit 1;; esac

# retried bootstrap must fence, not double-apply
OUT2="$(etl bootstrap snapshot.parquet pages --seq-col event_seq --op-col op --num-buckets 8)"
case "$OUT2" in *"fenced"*) echo "ok: retry fenced";; *) echo "FAIL: retry not fenced" >&2; exit 1;; esac

# stream the tail (overlap replays on top of the snapshot)
cat > job.yaml <<'YAML'
source:
  uri: log
target:
  uri: pages
options:
  mode: stream
  checkpoint_dir: ckpt
  num_buckets: 8
YAML
etl run job.yaml

# final state must equal a plain full replay of every event
python - <<'EOF'
from tinyetl_spark.lake import LakeTable, merge_apply
from tinyetl_spark.schema import PAGES_SCHEMA
from tinyetl_spark.session import get_spark

spark = get_spark(cores=4)
spark.sparkContext.setLogLevel("ERROR")
want = LakeTable.create(spark, "want", PAGES_SCHEMA, key_col="url",
                        num_buckets=8)
merge_apply(want, spark.read.parquet("all_events"), 0)
a = LakeTable(spark, "pages").read().select("url", "event_seq", "text")
b = want.read().select("url", "event_seq", "text")
assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
print("bootstrap+stream == full replay:", a.count(), "rows")
EOF

# -- fan-out: one routed log, two tables, strays to a DLQ
python - <<'EOF'
import pyspark.sql.functions as F
from tinyetl_spark import datagen
from tinyetl_spark.lake import LakeTable
from tinyetl_spark.schema import PAGES_SCHEMA
from tinyetl_spark.session import get_spark
from tinyetl_spark.sources.eventlog import append_events

spark = get_spark(cores=4)
spark.sparkContext.setLogLevel("ERROR")
ev = datagen.change_events(spark, 800, 100, seed=22)
route = (F.when(F.col("event_seq") % 101 == 0, F.lit("mystery"))
         .when(F.pmod(F.xxhash64("url"), 2) == 0, F.lit("news"))
         .otherwise(F.lit("blogs")))
append_events(ev.withColumn("route", route), "routed_log",
              segment_partitions=2)
for p in ("news", "blogs"):
    LakeTable.create(spark, p, PAGES_SCHEMA, key_col="url", num_buckets=4)
EOF

etl fanout routed_log --table news=news --table blogs=blogs \
    --checkpoint fanckpt --unknown-route-dir strays | tee fan.log
grep -q "route news:" fan.log && grep -q "route blogs:" fan.log \
  && echo "ok: both routes applied"
grep -q "unrouted events:" fan.log && echo "ok: strays reported"

python - <<'EOF'
from tinyetl_spark.lake import LakeTable
from tinyetl_spark.session import get_spark

spark = get_spark(cores=4)
spark.sparkContext.setLogLevel("ERROR")
n_news = LakeTable(spark, "news").read().count()
n_blogs = LakeTable(spark, "blogs").read().count()
n_strays = spark.read.parquet("strays").count()
assert n_news > 0 and n_blogs > 0 and n_strays > 0
print(f"news={n_news} blogs={n_blogs} strays={n_strays}")
EOF
echo "=== 13_bootstrap_fanout PASSED ==="
