#!/bin/bash
# The north-rule path end-to-end through the CLI: a change-event log
# streams into a LWW MERGE lake table; a re-run from the same checkpoint
# applies NOTHING new (exactly-once), appended events resume
# incrementally, and the final state equals a brute-force oracle.
source "$(dirname "$0")/../_common.sh"

python - <<'EOF'
from tinyetl_spark import datagen
from tinyetl_spark.session import get_spark
from tinyetl_spark.sources.eventlog import append_events

spark = get_spark(cores=4)
spark.sparkContext.setLogLevel("ERROR")
ev = datagen.change_events(spark, 4000, 500, seed=77)
append_events(ev.filter("event_seq < 3000"), "log")      # first tranche
ev.write.mode("overwrite").parquet("all_events")         # oracle input
EOF

cat > job.yaml <<'EOF'
version: 1
source:
  uri: ./log
target:
  uri: ./lake/pages
options:
  mode: stream
  checkpoint_dir: ./ckpt
  key_col: url
  num_buckets: 8
EOF

etl run job.yaml | tee run1.log
grep -Eq "applied 3000 events" run1.log || {
  echo "FAIL: first run did not apply 3000 events" >&2; exit 1; }

# exactly-once: same checkpoint, no new files -> zero events applied
etl run job.yaml | tee run2.log
grep -Eq "applied 0 events" run2.log || {
  echo "FAIL: re-run from checkpoint re-applied events" >&2; exit 1; }

# append the remaining tranche; the resumed stream applies ONLY it
python - <<'EOF'
from tinyetl_spark.session import get_spark
from tinyetl_spark.sources.eventlog import append_events

spark = get_spark(cores=4)
spark.sparkContext.setLogLevel("ERROR")
ev = spark.read.parquet("all_events").filter("event_seq >= 3000")
append_events(ev, "log")
EOF
etl run job.yaml | tee run3.log
grep -Eq "applied 1000 events" run3.log || {
  echo "FAIL: resume did not apply exactly the appended tranche" >&2; exit 1; }

# final table state == brute-force LWW oracle over the whole stream
python - <<'EOF'
import pyspark.sql.functions as F
from pyspark.sql import Window
from tinyetl_spark.lake import LakeTable
from tinyetl_spark.session import get_spark

spark = get_spark(cores=4)
spark.sparkContext.setLogLevel("ERROR")
t = LakeTable(spark, "lake/pages")
final = t.read().select("url", "event_seq")
ev = spark.read.parquet("all_events")
w = Window.partitionBy("url").orderBy(F.desc("warc_ts"), F.desc("event_seq"))
oracle = (ev.withColumn("rn", F.row_number().over(w))
            .filter("rn = 1 and op <> 'delete'").select("url", "event_seq"))
assert final.exceptAll(oracle).count() == 0
assert oracle.exceptAll(final).count() == 0
print("converged:", final.count(), "urls")
EOF
echo "=== 06_cdc_stream_resume PASSED ==="
