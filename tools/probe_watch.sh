#!/bin/bash
# Background host-phase watcher: probe every 6 min, append JSONL.
# Clean threshold: 1.25 x calibrated floor (8.443s @8 => <=10.55s).
OUT=/root/repo/BENCH/probe_watch.jsonl
while true; do
  S=$(timeout 120 python bench.py --probe --cores 8 2>/dev/null | tail -1)
  echo "{\"ts\": $(date +%s), \"probe8\": ${S:-null}}" >> "$OUT"
  sleep 360
done
