# shared example scaffolding: repo-relative PYTHONPATH, temp workdir
# with cleanup, and tiny assert helpers. Source me from every run.sh.
set -euo pipefail
REPO="$(cd "$(dirname "${BASH_SOURCE[1]}")/../.." && pwd)"
export PYTHONPATH="$REPO${PYTHONPATH:+:$PYTHONPATH}"
WORK="$(mktemp -d /tmp/tinyetl_example_XXXXXX)"
trap 'rm -rf "$WORK"' EXIT
cd "$WORK"

etl() { python -m tinyetl_spark.cli "$@"; }

# assert_eq <got> <expected> <label>
assert_eq() {
  if [ "$1" != "$2" ]; then
    echo "FAIL: $3 — got '$1', expected '$2'" >&2
    exit 1
  fi
  echo "ok: $3 = $1"
}
