#!/bin/bash
# Crawl-hygiene front door: UT1-style domain blocklist (drop whole hosts
# before any text work) and Unicode NFC normalization (compose mojibake-
# era decomposed codepoints, strip stray control bytes) — via the
# `curate` CLI, so composed/decomposed spellings of the same doc
# collapse to ONE row in exact dedup.
source "$(dirname "$0")/../_common.sh"

python - <<'EOF'
from tinyetl_spark.session import get_spark

spark = get_spark(cores=4)
spark.sparkContext.setLogLevel("ERROR")
good = ("the quick brown fox jumps over the lazy dog and naps in the "
        "warm sun of a long afternoon in the quiet valley")
rows = [
    (1, "https://ok.org/a", good + " take one"),
    (2, "https://ads.bad.example/x", good + " take two"),   # subdomain hit
    (3, "https://bad.example/y", good + " take three"),     # exact hit
    (4, "https://notbad.example/z", good + " caf\u00e9 take four"),
    (5, "https://mirror.org/z", good + " café take four"),  # = doc 4 after NFC
]
spark.createDataFrame(rows, "doc_id long, url string, text string") \
     .write.mode("overwrite").parquet("corpus.parquet")
EOF

printf '# UT1-ish blocklist\nbad.example\n' > blocked.txt

etl curate corpus.parquet curated \
    --blocklist blocked.txt --nfc --min-words 10 --dedup exact | tee out.txt

grep -q "blocklist      3" out.txt || { echo "FAIL: blocklist count"; exit 1; }
grep -q "dedup_exact    2" out.txt || { echo "FAIL: dedup count"; exit 1; }

python - <<'EOF'
from tinyetl_spark.session import get_spark
spark = get_spark(cores=4)
spark.sparkContext.setLogLevel("ERROR")
out = spark.read.parquet("curated")
ids = sorted(r["doc_id"] for r in out.collect())
assert 2 not in ids and 3 not in ids, f"blocked host survived: {ids}"
assert len(ids) == 2, f"expected 2 curated docs, got {ids}"
# NFC made docs 4/5 identical; exactly one survived exact dedup
assert len([i for i in ids if i in (4, 5)]) == 1, ids
texts = [r["text"] for r in out.collect()]
assert all("\u0301" not in t for t in texts), "decomposed accent survived"
print(f"ok: curated ids {ids}, all text NFC-composed")
EOF

echo "=== 15_blocklist_nfc PASSED ==="
