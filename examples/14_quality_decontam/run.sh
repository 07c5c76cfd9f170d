#!/bin/bash
# Pre-training hygiene: Gopher/C4 quality filtering (reject boilerplate,
# repetition, symbol soup) then benchmark decontamination (drop every doc
# sharing a word n-gram with the held-out eval set) — the two steps that
# run BEFORE dedup/sampling (example 12) in a real data pipeline.
source "$(dirname "$0")/../_common.sh"

python - <<'EOF'
import pyspark.sql.functions as F

from tinyetl_spark.operators import decontam as DC
from tinyetl_spark.operators import quality as Q
from tinyetl_spark.session import get_spark

spark = get_spark(cores=4)
spark.sparkContext.setLogLevel("ERROR")

good = ("the quick brown fox jumps over the lazy dog and then the dog "
        "naps in the warm sun of a long afternoon in the quiet valley")
rows = (
    [(i, good + f" take {i} of the story") for i in range(40)]
    # boilerplate: nav-menu bullets
    + [(100 + i, "- home\n- products\n- about us\n- contact\n- login")
       for i in range(5)]
    # repetition: one paragraph pasted over and over
    + [(200 + i, "\n".join(["breaking news ticker tape"] * 8))
       for i in range(5)]
    # symbol soup / markup residue
    + [(300 + i, "### §§§ ### click ... here ... now ### ...")
       for i in range(5)]
)
docs = spark.createDataFrame(rows, "doc_id: long, text: string")

flagged = Q.gopher_keep(docs, min_words=20)
kept = flagged.filter("keep")
n_kept = kept.count()
assert n_kept == 40, f"expected 40 clean docs, got {n_kept}"
assert kept.filter("doc_id >= 100").count() == 0, "kept a junk doc"
reasons = (flagged.filter("not keep")
           .select(F.col("doc_id"),
                   F.col("ok_words"), F.col("ok_stop"),
                   F.col("ok_dup_lines"), F.col("ok_symbol")))
assert reasons.filter("doc_id >= 200 and doc_id < 300")\
              .filter("ok_dup_lines").count() == 0, \
    "repetition docs must fail the dup-line rule"
print(f"ok: quality filter kept {n_kept}/55, "
      f"every junk class rejected with its own rule")

# decontamination: the eval set quotes two of the kept docs verbatim
bench = spark.createDataFrame(
    [(0, good + " take 7 of the story"),
     (1, good + " take 23 of the story")],
    "ex_id: long, text: string").select("text")
clean = DC.decontaminate(kept.select("doc_id", "text"), bench, n=13)
left = sorted(r["doc_id"] for r in clean.collect())
# sharing the long common prefix means EVERY kept doc overlaps the
# bench at n=13 words... so use a stricter n that isolates the quotes
assert left == [], "13-gram prefix overlap must catch the shared intro"
clean2 = DC.mark_contaminated(kept.select("doc_id", "text"), bench, n=28)
hit = sorted(r["doc_id"] for r in clean2.filter("contaminated").collect())
assert hit == [7, 23], f"expected exactly the quoted docs, got {hit}"
print("ok: decontamination flags exactly the quoted docs at n=28 "
      "and the whole shared-intro family at n=13")
EOF

echo "=== 14_quality_decontam PASSED ==="
