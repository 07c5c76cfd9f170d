#!/bin/bash
# CSV -> SQLite with an inline derive transform, then the append-first
# lifecycle + --truncate (reference examples/05 + 06).
source "$(dirname "$0")/../_common.sh"

cat > sales.csv <<'EOF'
sku,qty,unit_price
a1,2,10.0
b2,5,3.5
c3,1,99.0
EOF

etl transfer sales.csv shop.sqlite#sales --transform "total = qty * unit_price"

total=$(python - <<'EOF'
import sqlite3
con = sqlite3.connect("shop.sqlite")
n, s = con.execute("select count(*), sum(total) from sales").fetchone()
print(f"{n}:{s:.1f}")
EOF
)
assert_eq "$total" "3:136.5" "rows + derived total column"

# append-first: a second run doubles the rows; --truncate resets
etl transfer sales.csv shop.sqlite#sales --transform "total = qty * unit_price"
n=$(python -c "import sqlite3; print(sqlite3.connect('shop.sqlite').execute('select count(*) from sales').fetchone()[0])")
assert_eq "$n" 6 "append lifecycle"
etl transfer sales.csv shop.sqlite#sales --truncate --transform "total = qty * unit_price"
n=$(python -c "import sqlite3; print(sqlite3.connect('shop.sqlite').execute('select count(*) from sales').fetchone()[0])")
assert_eq "$n" 3 "truncate resets"
echo "=== 02_csv_to_sqlite_transform PASSED ==="
