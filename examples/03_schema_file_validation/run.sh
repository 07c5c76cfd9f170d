#!/bin/bash
# Schema-file enforcement: declared types, nullable, regex pattern and
# defaults (reference examples/11_schema_file_validation).
source "$(dirname "$0")/../_common.sh"

cat > employees.csv <<'EOF'
id,name,dept,salary
1,ada,eng,120000
2,grace,eng,
3,alan,research,90000
EOF

cat > schema.yaml <<'EOF'
columns:
  id:     {type: long, nullable: false}
  name:   {type: string, pattern: "^[a-z]+$"}
  dept:   {type: string}
  salary: {type: string, default: "0"}
EOF

etl transfer employees.csv out.parquet --schema-file schema.yaml

res=$(python - <<'EOF'
import duckdb
df = duckdb.sql("select * from 'out.parquet/*.parquet' order by id").df()
assert str(df["id"].dtype) == "int64", df.dtypes
assert df.loc[df.id == 2, "salary"].iloc[0] == "0", "default not applied"
print(len(df))
EOF
)
assert_eq "$res" 3 "validated rows with default applied"

# a pattern violation must fail the job loudly
echo "4,BAD NAME,eng,1" >> employees.csv
if etl transfer employees.csv out2.parquet --schema-file schema.yaml 2>err.log; then
  echo "FAIL: pattern violation did not fail the transfer" >&2
  exit 1
fi
echo "ok: pattern violation rejected"
echo "=== 03_schema_file_validation PASSED ==="
