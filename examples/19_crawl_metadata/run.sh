#!/bin/bash
# Crawl metadata pipeline: WARC archives → page metadata (title /
# canonical / published-time) → anchor-text ranking. The canonical-link
# signal collapses two urls of the same page before dedup, and the
# anchor aggregation surfaces what the crawl CALLS each page — the
# off-page relevance signal a ranking stack joins against the table key.
source "$(dirname "$0")/../_common.sh"

python - <<'PYEOF'
import pyspark.sql.functions as F

from tinyetl_spark.operators import webmeta as WM
from tinyetl_spark.session import get_spark
from tinyetl_spark.sources import warc as W

spark = get_spark(cores=4)
spark.sparkContext.setLogLevel("ERROR")

def page(title, canon, links):
    body = "".join(f'<a href="{h}">{t}</a>' for h, t in links)
    head = f"<title>{title}</title>"
    if canon:
        head += f'<link rel="canonical" href="{canon}">'
    return f"<html><head>{head}</head><body>{body}</body></html>"

captures = [
    # /a and /a?ref=feed are the SAME page: canonical says so
    ("https://s.org/a", page("Alpha", "HTTPS://S.org:443/a",
                             [("https://s.org/b", "Beta page")]),
     "2026-03-01T00:00:00Z"),
    ("https://s.org/a?ref=feed", page("Alpha", "https://s.org/a",
                                      [("https://s.org/b", "the beta")]),
     "2026-03-01T01:00:00Z"),
    ("https://s.org/b", page("Beta", None,
                             [("https://s.org/a", "alpha home"),
                              ("https://s.org/c", "gamma")]),
     "2026-03-01T02:00:00Z"),
    ("https://s.org/c", page("Gamma", None,
                             [("https://s.org/b", "Beta  Page")]),
     "2026-03-01T03:00:00Z"),
]
crawl = spark.createDataFrame(
    captures, "url string, payload string, warc_date string")
W.write_warc(crawl.repartition(2), "crawl", compress=True)
pages = (W.read_warc(spark, "crawl", warc_types=("response",))
          .select("url", F.col("payload").alias("html")))

meta = WM.page_metadata(pages)
rows = {r["url"]: r for r in meta.collect()}
assert rows["https://s.org/a"]["title"] == "Alpha"
assert rows["https://s.org/a"]["canonical"] == "https://s.org/a"
assert rows["https://s.org/a?ref=feed"]["canonical"] == "https://s.org/a"
assert rows["https://s.org/b"]["canonical"] == ""
print("ok: metadata extracted; both /a variants declare one canonical")

# canonical-aware identity: group captures by coalesce(canonical, url)
ident = meta.select(
    F.when(F.col("canonical") != "", F.col("canonical"))
     .otherwise(F.col("url")).alias("page_id"))
n_pages = ident.distinct().count()
assert n_pages == 3, n_pages
print(f"ok: 4 captured urls collapse to {n_pages} canonical pages")

# anchor-text ranking: 'beta page' is what the crawl calls /b
top = WM.top_anchors(WM.anchor_edges(pages), k=1)
by_dst = {r["dst"]: r for r in top.collect()}
b = by_dst["https://s.org/b"]
assert (b["anchor"], b["n_links"]) == ("beta page", 2)  # normalized merge
assert by_dst["https://s.org/a"]["anchor"] == "alpha home"
print("ok: top incoming anchor per page, case/whitespace-normalized")
PYEOF

echo "=== 19_crawl_metadata PASSED ==="
