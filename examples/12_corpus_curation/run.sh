#!/bin/bash
# Training-corpus curation: near-dup pair generation (MinHash LSH) →
# connected components → one canonical doc per cluster → deterministic
# per-language training-mix sample. The cluster step is what pairwise
# dedup cannot do: an A~B, B~C chain collapses to ONE keeper.
source "$(dirname "$0")/../_common.sh"

python - <<'EOF'
import pyspark.sql.functions as F

from tinyetl_spark.operators import dedup as D
from tinyetl_spark.operators import sampling as SA
from tinyetl_spark.operators.components import dedup_canonical
from tinyetl_spark.session import get_spark

spark = get_spark(cores=4)
spark.sparkContext.setLogLevel("ERROR")

# corpus: 60 base docs in 3 languages, each with two near-identical
# mirror copies (ids +1000 / +2000) — mirror chains, the CC case
base = [(i, ["en", "de", "zh"][i % 3],
         f"document {i} about topic {i % 7} with enough words "
         f"to shingle cleanly and count {i * 13} stars")
        for i in range(60)]
rows = (base
        + [(i + 1000, lang, t) for i, lang, t in base]
        + [(i + 2000, lang, t) for i, lang, t in base])
docs = spark.createDataFrame(rows, "doc_id: long, lang: string, text: string")

pairs = D.ngram_jaccard_pairs(docs, "doc_id", "text", threshold=0.8)
curated = dedup_canonical(docs, pairs, "doc_id")
keep = curated.filter("is_canonical").select("doc_id", "lang", "text")
n_keep = keep.count()
assert n_keep == 60, f"expected 60 canonical docs, got {n_keep}"
assert keep.filter("doc_id >= 1000").count() == 0, "kept a mirror copy"
print(f"ok: 180 docs -> {n_keep} canonical (one per 3-doc cluster)")

# deterministic training mix over the curated corpus: all en, half de,
# no zh — replay-stable (pure function of doc_id), partitioning-proof
mix = SA.stratified_sample(keep, "lang", "doc_id",
                           {"en": 1.0, "de": 0.5}, default_rate=0.0)
counts = {r["lang"]: r["n"] for r in
          mix.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
assert counts["en"] == 20, counts
assert 0 < counts.get("de", 0) < 20, counts
assert "zh" not in counts, counts
again = SA.stratified_sample(keep.repartition(7), "lang", "doc_id",
                             {"en": 1.0, "de": 0.5}, default_rate=0.0)
assert sorted(r["doc_id"] for r in mix.collect()) == \
       sorted(r["doc_id"] for r in again.collect()), "mix not deterministic"
print(f"ok: training mix en={counts['en']} de={counts.get('de')} zh=0, "
      f"identical under repartition")

mix.write.mode("overwrite").parquet("curated_mix")
back = spark.read.parquet("curated_mix")
assert back.count() == sum(counts.values())
print(f"ok: curated mix written ({back.count()} rows)")
assert D.release_caches() >= 1

# exact-substring pass (Lee et al. 2021): a shared ad sentence embedded
# MID-TEXT (no line boundary — line dedup can't see it) is removed from
# every doc it appears in, all occurrences
ad = "buy premium stars at the official topic store today"   # 9 tokens
spans = spark.createDataFrame(
    [(1, f"intro one {ad} body about alpha"),
     (2, f"intro two {ad} body about beta"),
     (3, "a clean doc with no advertisement inside it at all")],
    "doc_id: long, text: string")
out = {r["doc_id"]: r["text"] for r in
       D.dedup_ngram_spans(spans, k=8).collect()}
assert ad not in out[1] and ad not in out[2], out
assert out[3] == "a clean doc with no advertisement inside it at all"
print("ok: cross-doc ad span removed mid-text, clean doc untouched")
EOF

echo "=== 12_corpus_curation PASSED ==="
