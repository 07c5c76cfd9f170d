#!/bin/bash
# SQLite -> parquet: the partitioned rowid-ranged scan feeding a columnar
# sink (reference examples/17_sqlite_json_to_parquet).
source "$(dirname "$0")/../_common.sh"

python - <<'EOF'
import sqlite3
con = sqlite3.connect("app.sqlite")
con.execute("create table metrics (id integer, name text, v real)")
con.executemany("insert into metrics values (?,?,?)",
                [(i, f"m{i}", i / 3.0) for i in range(1000)])
con.commit()
EOF

etl transfer app.sqlite#metrics metrics.parquet

res=$(python - <<'EOF'
import duckdb
n, s = duckdb.sql(
    "select count(*), round(sum(v), 2) from 'metrics.parquet/*.parquet'"
).fetchone()
print(f"{n}:{s}")
EOF
)
assert_eq "$res" "1000:166500.0" "sqlite scan -> parquet values"
echo "=== 05_sqlite_to_parquet PASSED ==="
