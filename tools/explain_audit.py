"""Plan audit: print formatted plans for the headline queries and grep
for the properties that matter at scale (pushed filters, pruned scans,
broadcast joins, whole-stage codegen spans). Run occasionally; findings
feed PLANS.md."""

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from tinyetl_spark.session import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

AUDIT = ["q1_pricing_summary", "q3_shipping_priority", "q5_local_suppliers",
         "q_top3_customers_per_nation", "q_customers_without_orders",
         "q_events_windowed", "text_profile", "ann_cosine_topk",
         "cdc_lww_latest", "q_orders_above_cust_avg", "q_user_running_value",
         "q_set_ops", "q_window_ranks",
         "q_string_agg_regions", "q_daily_event_rollup",
         "cdc_scd2_history", "cdc_quarantine_split",
         "dedup_minhash_jaccard",
         "dedup_cluster_canonical", "sample_training_mix",
         "sample_topk_per_lang", "pack_token_shards",
         "text_gopher_quality", "text_decontaminate",
         "text_bm25_topk", "text_lm_score", "dedup_ngram_spans",
         "dedup_spans_incremental", "pack_doc_chunks", "dedup_semantic",
         "sample_dsir_topk", "decontam_semantic", "sample_temperature_mix"]


def audit(name, df):
    # Execute THIS df's own queryExecution before explaining: with AQE on,
    # the pre-execution plan is AdaptiveSparkPlan(isFinalPlan=false) with
    # NO codegen annotations — auditing it reports codegen_spans=0 for
    # plainly codegen-able plans. (A .count() is NOT enough: it wraps the
    # df in a new Dataset and executes THAT plan, leaving this one
    # unfinalized — the round-1 bug.)
    df.collect()
    plan = df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    pushed = [p for p in pushed if p.strip()]
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    bhj = plan.count("BroadcastHashJoin") + plan.count("BroadcastNestedLoopJoin")
    smj = plan.count("SortMergeJoin")
    wsc = len(set(re.findall(r"codegen id\s*:\s*(\d+)", plan)))
    wsc = wsc or plan.count("WholeStageCodegen")
    arrow = plan.count("ArrowEvalPython") + plan.count("MapInPandas")
    print(f"== {name}")
    print(f"   pushed_filters={len(pushed)} broadcast_joins={bhj} "
          f"sortmerge_joins={smj} codegen_spans={wsc} python_nodes={arrow}")
    for s in schemas[:4]:
        cols = s.count(":")
        print(f"   scan reads {cols} cols: {s[:90]}")
    return plan


def main():
    spark = get_spark(cores=8)
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    full = "--full" in sys.argv
    for name in AUDIT:
        plan = audit(name, qs[name](spark, SF))
        if full:
            print(plan)


if __name__ == "__main__":
    main()
