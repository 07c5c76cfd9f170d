#!/bin/bash
# CI-style gate: run every numbered example; stop on the first failure.
set -euo pipefail
HERE="$(cd "$(dirname "$0")" && pwd)"
for ex in "$HERE"/[0-9][0-9]_*/run.sh; do
  echo ""
  echo ">>> $(basename "$(dirname "$ex")")"
  bash "$ex"
done
echo ""
echo "=== ALL EXAMPLES PASSED ==="
