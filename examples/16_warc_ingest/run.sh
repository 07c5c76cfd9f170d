#!/bin/bash
# Crawl-to-table: synthesize a tiny Common-Crawl-style WARC crawl (two
# captures of one url, one capture of another), parse it back with
# read_warc, adapt captures to change events and MERGE them — LWW keeps
# the NEWEST capture per url, exactly once.
source "$(dirname "$0")/../_common.sh"

python - <<'PYEOF'
from tinyetl_spark.session import get_spark
from tinyetl_spark.sources import warc as W
from tinyetl_spark.lake import LakeTable, merge_apply
from tinyetl_spark.schema import PAGES_SCHEMA

spark = get_spark(cores=4)
spark.sparkContext.setLogLevel("ERROR")

captures = [
    ("https://site.org/a", "<html>a v1</html>", "2026-03-01T00:00:00Z"),
    ("https://site.org/a", "<html>a v2</html>", "2026-03-02T00:00:00Z"),
    ("https://site.org/b", "<html>b v1</html>", "2026-03-01T12:00:00Z"),
]
crawl = spark.createDataFrame(captures, "url string, payload string, warc_date string")
n = W.write_warc(crawl.repartition(2), "crawl", compress=True)
print("archives ok, records:", n)

records = W.read_warc(spark, "crawl", warc_types=("response",))
events = W.warc_to_change_events(records)
table = LakeTable.create(spark, "pages", PAGES_SCHEMA, key_col="url", num_buckets=4)
stats = merge_apply(table, events, 0)
print("merged:", stats.upserts, "upserts,", stats.dedup_drops, "lww drops")

rows = {r["url"]: bytes(r["html"]).decode() for r in table.read().collect()}
assert rows == {"https://site.org/a": "<html>a v2</html>",
                "https://site.org/b": "<html>b v1</html>"}, rows
print("ok: LWW kept the newest capture per url")
PYEOF

echo "=== 16_warc_ingest PASSED ==="
