#!/bin/bash
# CSV -> JSON transfer with schema inference + date sniffing
# (reference examples/01_basic_csv_to_json).
source "$(dirname "$0")/../_common.sh"

cat > people.csv <<'EOF'
id,name,joined,score
1,ada,2023-01-05,9.5
2,grace,2023-02-06,8.0
3,alan,2023-03-07,7.25
EOF

etl transfer people.csv out.json

rows=$(python - <<'EOF'
import glob
import json
rows = [json.loads(l) for p in glob.glob("out.json/*.json") for l in open(p)]
assert {r["name"] for r in rows} == {"ada", "grace", "alan"}
assert all(isinstance(r["id"], int) for r in rows), "id not inferred as int"
assert all(str(r["joined"]).startswith("2023-0") for r in rows), "date not sniffed"
print(len(rows))
EOF
)
assert_eq "$rows" 3 "json rows with typed id + sniffed date"
echo "=== 01_csv_to_json PASSED ==="
