#!/bin/sh
# Per-entry-bounded oracle slice: one FRESH oracle_check process per
# named entry (fresh Spark JVM + DuckDB connection — maximal
# isolation for the heaviest scales), each under `timeout`, so one
# doomed entry (DuckDB OOM-thrash, quadratic oracle at sf10) costs a
# bounded slice of wall-clock instead of wedging the worker. A timed-
# out entry is recorded as `NAME TIMEOUT` in the resume file (skipped
# on re-run; grep it to see what needs a bigger budget or an
# infeasibility note).
#
# Usage: tools/run_slice.sh SF_DIR RESUME LOG TIMEOUT_S NAME...
set -u
sf="$1"; resume="$2"; log="$3"; to="$4"; shift 4
cd "$(dirname "$0")/.."
touch "$resume"
for name in "$@"; do
  if grep -q "^$name " "$resume"; then
    continue
  fi
  timeout "$to" python tools/oracle_check.py --resume "$resume" "$sf" "$name" \
    >>"$log" 2>&1
  rc=$?
  if [ "$rc" -eq 124 ] && ! grep -q "^$name " "$resume"; then
    echo "$name TIMEOUT" >>"$resume"
    echo "  $name TIMEOUT after ${to}s" >>"$log"
  fi
done
echo "slice worker done: $# entries in scope" >>"$log"
