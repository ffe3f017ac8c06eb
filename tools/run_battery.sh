#!/bin/sh
# Chunked oracle battery: re-invokes oracle_check.py in a FRESH
# process per chunk (fresh Spark JVM + DuckDB connection) until every
# registry entry has been compared. Sidesteps the round-6 sf1 failure
# mode where one long-lived process accumulated 62 GB RSS across 330
# heavy oracles and the tail crawled past any wall-clock budget.
#
# Usage: tools/run_battery.sh SF_DIR RESUME_FILE [CHUNK] [LOG] [EXTRA...]
# EXTRA flags (e.g. --stride 2 --offset 1) pass through to
# oracle_check.py so parallel workers can split the registry.
set -u
sf="$1"
resume="$2"
# CHUNK and LOG are positional; a flag (leading '-') in their slot
# means the caller skipped them — refuse rather than feed '--stride'
# to --max and crash oracle_check on int() every loop iteration.
case "${3:-}" in -*)
  echo "usage: run_battery.sh SF_DIR RESUME [CHUNK] [LOG] [EXTRA...]" >&2
  echo "  (supply CHUNK and LOG positionally before any --flags)" >&2
  exit 2 ;;
esac
case "${4:-}" in -*)
  echo "usage: run_battery.sh SF_DIR RESUME [CHUNK] [LOG] [EXTRA...]" >&2
  echo "  (supply CHUNK and LOG positionally before any --flags)" >&2
  exit 2 ;;
esac
chunk="${3:-30}"
log="${4:-/dev/stdout}"
shift $(( $# > 4 ? 4 : $# ))
cd "$(dirname "$0")/.."
while :; do
  python tools/oracle_check.py --resume "$resume" --max "$chunk" "$@" "$sf" \
    >>"$log" 2>&1
  rc=$?
  if [ "$rc" -ne 3 ]; then
    echo "battery done rc=$rc" >>"$log"
    exit "$rc"
  fi
done
