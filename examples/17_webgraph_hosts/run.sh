#!/bin/bash
# Crawl-quality signals above the document: extract the link graph from
# page html, PageRank it, roll docs up per host — then drop the mirror
# host (high dup_frac) wholesale and keep the organic one.
source "$(dirname "$0")/../_common.sh"

python - <<'PYEOF'
from tinyetl_spark.session import get_spark
from tinyetl_spark.operators.graph import extract_links, pagerank
from tinyetl_spark.operators.normalize import url_host
from tinyetl_spark.operators.quality import host_rollup
import pyspark.sql.functions as F

spark = get_spark(cores=4)
spark.sparkContext.setLogLevel("ERROR")

good = ("the quick brown fox jumps over the lazy dog near the river "
        "bank in the late afternoon light of early autumn")
pages = [
    # organic site: distinct articles, interlinked
    ("https://fresh.example/a", good + " take one",
     '<a href="https://fresh.example/b">b</a>'
     '<a href="https://mirror.example/1">m</a>'),
    ("https://fresh.example/b", good + " take two",
     '<a href="https://fresh.example/a">a</a>'),
    # mirror farm: one body, many urls, all linking the farm itself
    *[(f"https://mirror.example/{i}", "same mirror body every page",
       f'<a href="https://mirror.example/{(i + 1) % 4}">n</a>')
      for i in range(4)],
]
df = spark.createDataFrame(pages, ["url", "text", "html"])

edges = extract_links(df)
pr = pagerank(edges, iters=5)
hosts = host_rollup(df)

h = {r["host"]: r for r in hosts.collect()}
assert h["mirror.example"]["dup_frac"] == 0.75, h
assert h["fresh.example"]["dup_frac"] == 0.0, h

kept = (df.withColumn("host", url_host(F.col("url")))
          .join(hosts.filter(F.col("dup_frac") < 0.5).select("host"),
                "host"))
assert kept.count() == 2, kept.count()

ranks = {r["url"]: r["rank"] for r in pr.collect()}
assert abs(sum(ranks.values()) - 1.0) < 1e-6
print("ok: mirror host dropped wholesale; pagerank mass conserved over",
      len(ranks), "nodes")
PYEOF

echo "=== 17_webgraph_hosts PASSED ==="
