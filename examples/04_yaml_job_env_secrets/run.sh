#!/bin/bash
# YAML job config with ${VAR} interpolation + preview and dry-run modes
# (reference examples/12_env_var_secrets + 13_yaml_config).
source "$(dirname "$0")/../_common.sh"

cat > input.csv <<'EOF'
user,plan
u1,pro
u2,free
u3,pro
EOF

export OUT_DIR="$WORK/result.parquet"
cat > job.yaml <<'EOF'
version: 1
source:
  uri: input.csv
target:
  uri: ${OUT_DIR}
options:
  mode: batch
  transform: "plan_up = upper(plan)"
EOF

# preview prints both schemas, writes nothing. Capture then grep:
# piping straight into `grep -q` under pipefail SIGPIPEs the CLI when
# grep exits on the first match, failing the pipeline spuriously.
preview_out="$(etl run job.yaml --preview 3)"
grep -q "output schema" <<<"$preview_out" || {
  echo "FAIL: preview did not print output schema" >&2; exit 1; }
[ ! -e "$OUT_DIR" ] || { echo "FAIL: preview wrote output" >&2; exit 1; }

# dry-run connects + resolves schema, still writes nothing
dry_out="$(etl run job.yaml --dry-run)"
grep -q "dry-run ok" <<<"$dry_out" || {
  echo "FAIL: dry-run did not report ok" >&2; exit 1; }
[ ! -e "$OUT_DIR" ] || { echo "FAIL: dry-run wrote output" >&2; exit 1; }

etl run job.yaml
res=$(python -c "
import duckdb
print(duckdb.sql(\"select count(*) from '$OUT_DIR/*.parquet' where plan_up = 'PRO'\").fetchone()[0])")
assert_eq "$res" 2 "env-interpolated target + transform"
echo "=== 04_yaml_job_env_secrets PASSED ==="
