#!/usr/bin/env python3
"""Capture `.explain("formatted")` output (AQE-final plans) for declared
queries into plans/<tag>/<query>_<suffix>.txt — the before/after evidence
files the optimization rounds commit.

Usage:
    python tools/capture_plans.py --tag r06 --suffix before q5_local_suppliers ...
    python tools/capture_plans.py --tag r06 --suffix after --all

Each query is executed once (collect) so the plan printed is the
AQE-finalized one with codegen annotations, not the pre-execution
AdaptiveSparkPlan(isFinalPlan=false) stub.
"""
from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="r06")
    ap.add_argument("--suffix", required=True, choices=["before", "after"])
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                                   "/root/testdata/sf0.1"))
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--out", default=None,
                    help="output dir (default plans/<tag>/ in the repo)")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from tinyetl_spark.session import get_spark

    qs = entrymod.queries()
    names = list(qs) if args.all else args.names
    unknown = [n for n in names if n not in qs]
    if unknown:
        sys.exit(f"unknown queries: {unknown}")

    out_dir = args.out or os.path.join(REPO, "plans", args.tag)
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name=f"capture-plans-{args.suffix}")
    spark.sparkContext.setLogLevel("ERROR")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted")
    for name in names:
        spark.sparkContext.setJobDescription(f"plan-capture: {name}")
        try:
            df = qs[name](spark, args.sf)
            df.collect()
            plan = df._jdf.queryExecution().explainString(mode)
        except Exception as exc:  # noqa: BLE001
            print(f"  {name}: FAILED ({exc})", file=sys.stderr)
            continue
        path = os.path.join(out_dir, f"{name}_{args.suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"  {name} -> {path}", file=sys.stderr)
    try:
        entrymod.release_caches()
    except Exception:
        pass
    spark.stop()


if __name__ == "__main__":
    main()
