#!/bin/bash
# Relevance + LM-quality ranking: score a corpus against a query-term
# mix with BM25 (rare terms dominate), filter outliers with the
# CCNet-style corpus-trained unigram-LM surprisal (`curate --max-nll`),
# and verify the two signals compose: the curated set keeps the
# relevant in-distribution docs and drops gibberish even when the
# gibberish contains a query term.
source "$(dirname "$0")/../_common.sh"

python - <<'EOF'
import pyspark.sql.functions as F

from tinyetl_spark.curate import curate_corpus
from tinyetl_spark.operators import ranking as RK
from tinyetl_spark.session import get_spark

spark = get_spark(cores=4)
spark.sparkContext.setLogLevel("ERROR")

base = [(i, f"spark merge pipeline note {i} covering shuffle join "
            f"agg window sort and stream topics number {i % 9}")
        for i in range(40)]
rows = (base
        # 3 docs about the rare topic: 'watermark'
        + [(100 + i, "watermark handling in the merge stream with late "
                     "data and the spark window " + "filler " * i)
           for i in range(3)]
        # gibberish doc that still contains a query term
        + [(900, "watermark zzq vvk qqj xxo wploc mmzr kkt yyb zzgr")])
docs = spark.createDataFrame(rows, "doc_id: long, text: string")

# BM25: rare term 'watermark' must outrank the common 'merge'
top = RK.bm25(docs, ["watermark", "merge"], top_k=4).collect()
top_ids = [r["doc_id"] for r in top]
assert set(top_ids) <= {100, 101, 102, 900}, top_ids
assert all(r["bm25"] > 0 for r in top)
print(f"ok: BM25 top-4 all watermark docs: {top_ids}")

# deterministic under repartition (float order is pinned)
again = RK.bm25(docs.repartition(7), ["watermark", "merge"], top_k=4).collect()
assert [r["doc_id"] for r in again] == top_ids, "bm25 not deterministic"
print("ok: BM25 ranking identical under repartition")

# LM filter drops the gibberish doc 900 but keeps the real watermark
# docs — relevance alone would have kept 900 (it has the query term)
res = curate_corpus(docs, quality=False, dedup="off",
                    lm_max_nll=4.5, lm_vocab_k=40)
kept = {r["doc_id"] for r in res.df.collect()}
assert 900 not in kept, "LM filter kept the gibberish doc"
assert {100, 101, 102} <= kept, "LM filter dropped a real topical doc"
stages = dict((n, d.count()) for n, d in res.stages)
print(f"ok: LM filter kept {len(kept)}/44 docs "
      f"(funnel: {stages['input']} -> {stages['lm_filter']})")

# compose: BM25 over the curated set now surfaces ONLY real docs
top2 = RK.bm25(res.df, ["watermark", "merge"], top_k=3).collect()
assert [r["doc_id"] for r in top2] == [100, 101, 102], top2
print("ok: BM25 over curated corpus = the three real watermark docs")
EOF

echo "=== 18_relevance_ranking PASSED ==="
