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
