#!/bin/bash
# Incremental materialized views: a per-domain rollup maintained from
# the CDC table's change feed — refreshed inline by the stream, exact
# against a from-scratch recompute after every refresh, and consumable
# via the CLI `materialize` command.
source "$(dirname "$0")/../_common.sh"

python - <<'EOF'
import pyspark.sql.functions as F

from tinyetl_spark import datagen
from tinyetl_spark.lake import LakeTable
from tinyetl_spark.schema import PAGES_SCHEMA
from tinyetl_spark.session import get_spark
from tinyetl_spark.sources.eventlog import append_events
from tinyetl_spark.streaming.matview import create_view, domain_of
from tinyetl_spark.streaming.pipeline import run_to_completion

spark = get_spark(cores=4)
spark.sparkContext.setLogLevel("ERROR")

# events spread over several domains (datagen's default is one host)
ev = datagen.change_events(spark, 2000, 400, seed=31)
ev = ev.withColumn("url", F.concat(
    F.lit("https://d"), (F.xxhash64("url") % 5 + 5) % 5,
    F.lit(".example/p/"), F.md5("url")))
append_events(ev, "log", segment_partitions=4)

LakeTable.create(spark, "lake/pages", PAGES_SCHEMA,
                 key_col="url", num_buckets=8)
create_view(spark, "lake/domain_stats")

# the stream refreshes the view inline after every micro-batch
run_to_completion(spark, "log", "lake/pages", "ckpt",
                  max_files_per_trigger=2,
                  matview_dirs=["lake/domain_stats"])

src = LakeTable(spark, "lake/pages")
view = LakeTable(spark, "lake/domain_stats")
got = sorted((r["url"], r["page_count"], r["text_bytes"])
             for r in view.read()
             .select("url", "page_count", "text_bytes").collect())
want = sorted((r["d"], r["c"], r["b"]) for r in
              src.read().groupBy(domain_of(F.col("url")).alias("d"))
                 .agg(F.count(F.lit(1)).cast("long").alias("c"),
                      F.coalesce(F.sum(F.length("text")), F.lit(0))
                       .cast("long").alias("b")).collect())
assert got == want, f"view != recompute\n{got}\n{want}"
assert len(got) == 5
print(f"ok: incremental view matches recompute over {len(got)} domains")
EOF

# CLI refresh on an already-current view is a fenced no-op
out="$(etl materialize lake/pages lake/domain_stats)"
grep -q "already current" <<<"$out" || {
  echo "FAIL: materialize on a current view should no-op" >&2; exit 1; }
echo "ok: CLI materialize no-ops when current"

echo "=== 11_matview PASSED ==="
