"""Regenerate BENCH/BASELINE.md from the best evidence available:
scaling section from one invocation's result JSON (typically a clean
--scaling-only run), queries/commit/metadata from another (typically the
last full protocol run).

This exists because the host's degradation episodes are range-local and
flap on minute timescales (see memory/BENCH history): a full invocation
can land its tail phases in a clean window while every scaling slot was
degraded, or vice versa. Merging the clean halves of two HONEST records
(every probe attempt is carried along into the MD) beats front-paging
whichever mixture the last full run happened to catch.

Usage: python tools/rebaseline.py <scaling_result.json> <full_result.json>
"""

import json
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])
from bench import write_baseline_md  # noqa: E402


def main() -> None:
    scaling_path, full_path = sys.argv[1], sys.argv[2]
    with open(scaling_path) as f:
        scaling_res = json.load(f)
    with open(full_path) as f:
        full_res = json.load(f)
    merged = dict(full_res)
    merged["scaling"] = scaling_res["scaling"]
    merged["value"] = scaling_res.get("value") or full_res.get("value")
    try:
        with open("BENCH/history.jsonl") as f:
            history = [json.loads(ln) for ln in f if ln.strip()]
    except OSError:
        history = None
    write_baseline_md(merged, history=history)
    print("BENCH/BASELINE.md regenerated: scaling from",
          scaling_path, "+ tails from", full_path)


if __name__ == "__main__":
    main()
