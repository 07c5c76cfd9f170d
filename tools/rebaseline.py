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

MD_PATH = "BENCH/BASELINE.md"


def lead_with_median(md_path: str = MD_PATH,
                     hist_path: str = "BENCH/history.jsonl") -> bool:
    """Round-5 verdict #2 (presentation): the front page must LEAD with
    the central tendency — the gated-efficiency median across all gated
    invocations on record — with the best-of as a labeled secondary,
    not the headline. bench.write_baseline_md is frozen for measurement
    (the driver re-runs the round-start copy), so this post-processes
    the generated markdown instead of changing the generator. Idempotent;
    returns True when the headline paragraph was rewritten."""
    import re
    import statistics
    try:
        with open(hist_path) as f:
            hist = [json.loads(ln) for ln in f if ln.strip()]
        with open(md_path) as f:
            text = f.read()
    except OSError:
        return False
    gated = [h for h in hist
             if isinstance(h.get("efficiency_gated"), (int, float))]
    if not gated:
        return False
    med = round(statistics.median(h["efficiency_gated"] for h in gated), 3)
    eff_med = [h for h in gated
               if isinstance((h.get("median_eps_gated") or {}).get("low"),
                             (int, float))]
    eps_lo = (round(statistics.median(h["median_eps_gated"]["low"]
                                      for h in eff_med), 1)
              if eff_med else None)
    eps_hi = (round(statistics.median(h["median_eps_gated"]["high"]
                                      for h in eff_med), 1)
              if eff_med else None)
    best = max(gated, key=lambda h: h["efficiency_gated"])
    bg = best.get("median_eps_gated") or {}
    new_head = (
        "**Headline (median across gated invocations — the central "
        f"tendency)**: N→4N scaling efficiency = **{med}** over the "
        f"{len(gated)} clean-phase-gated invocations on record "
        f"(median gated throughput {eps_lo} events/sec at the low level "
        f"vs {eps_hi} events/sec at 4N; full per-invocation history "
        "below and in BENCH/history.jsonl). Secondary, labeled: best "
        f"clean-gated invocation on record = {best['efficiency_gated']} "
        f"({bg.get('low')} vs {bg.get('high')} events/sec, UTC ts "
        f"{best.get('ts')}) — the clean-window capability estimate on a "
        "shared host whose degradation episodes only ever slow runs "
        "down.\n\n")
    out, n = re.subn(
        r"\*\*Headline \((?:best clean-phase-gated invocation on record"
        r"|median across gated invocations)[^*]*\*\*:.*?\n\n",
        new_head, text, count=1, flags=re.S)
    if n:
        with open(md_path, "w") as f:
            f.write(out)
    return bool(n)


def main() -> None:
    if "--front-page-only" in sys.argv:
        print("headline rewritten:", lead_with_median())
        return
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
    lead_with_median()
    print("BENCH/BASELINE.md regenerated: scaling from",
          scaling_path, "+ tails from", full_path)


if __name__ == "__main__":
    main()
