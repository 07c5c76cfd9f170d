#!/bin/bash
# North-rule deployment shape: the CDC ingest job submitted via
# `spark-submit --py-files` onto a MULTI-EXECUTOR master
# (local-cluster[2,2,2048] = 2 separate executor JVMs x 2 cores — real
# serialization/classpath boundaries, unlike local[N] threads). The
# engine package travels ONLY as dist/tinyetl_spark.zip: PYTHONPATH is
# scrubbed for the submit, so a green run proves the driver and every
# executor's python workers imported the engine off the distributed
# archive, and the streamed LWW MERGE produced a consistent table.
source "$(dirname "$0")/../_common.sh"

SPARK_SUBMIT="$(command -v spark-submit || echo /opt/spark/bin/spark-submit)"
[ -x "$SPARK_SUBMIT" ] || { echo "SKIP: spark-submit not found"; exit 0; }

ZIP="$(python "$REPO/tools/make_pyfiles.py" "$WORK/tinyetl_spark.zip")"
assert_eq "$(basename "$ZIP")" "tinyetl_spark.zip" "py-files zip built"

env -u PYTHONPATH PYSPARK_PYTHON="$(command -v python)" \
  "$SPARK_SUBMIT" \
  --master 'local-cluster[2,2,2048]' \
  --py-files "$ZIP" \
  --conf spark.network.timeout=600s \
  --conf spark.ui.enabled=false \
  "$REPO/tools/submit_cdc_job.py" \
  --gen-events 60000 --work "$WORK/job" \
  2> "$WORK/submit.err" | tee result.json

RES="$(grep -E '^\{' result.json | tail -1)"
[ -n "$RES" ] || { echo "FAIL: no JSON result"; tail -30 "$WORK/submit.err" >&2; exit 1; }

assert_eq "$(echo "$RES" | python -c 'import json,sys; print(json.load(sys.stdin)["events"])')" \
  "60000" "events applied through submitted driver"
assert_eq "$(echo "$RES" | python -c 'import json,sys; print(json.load(sys.stdin)["executors"] >= 2)')" \
  "True" "ran on >=2 executor JVMs"
assert_eq "$(echo "$RES" | python -c 'import json,sys; r=json.load(sys.stdin); print(0 < r["final_rows"] <= 3000)')" \
  "True" "LWW-deduped final table rows in (0, n_urls]"
assert_eq "$(echo "$RES" | python -c 'import json,sys; print(json.load(sys.stdin)["master"])')" \
  "local-cluster[2,2,2048]" "master came from spark-submit, not the engine"

echo "PASS: spark-submit --py-files multi-executor CDC ingest"
