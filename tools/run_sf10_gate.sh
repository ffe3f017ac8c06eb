#!/bin/sh
# Standing per-round sf10 gate: a fixed heavy-family subset
# value-checked at 100x bench scale every round, so super-linear
# drift is caught the round it appears (VERDICT r8 task 4).
#
# Phase 1 — feasible heavy families, FULL sf10 (linear/aggregated
# oracles: retrieval flagships, ann, bm25, scalable dedup forms).
# Phase 2 — the duplication-quadratic pair-contract dedup/curation
# entries under the deterministic doc-id slice
# (SPARK_GRAFT_DOC_SLICE_MOD=8; see sources/loaders.py — both
# engines restricted to stable_hash60(id) % 8 == 0 docs, pair
# semantics closed under the slice, DuckDB truth feasible).
# Mod 8, not 4: the round-9 sweep showed ngram_jaccard/semdedup/
# curation_pipeline_summary exhaust local DuckDB budgets at mod 4
# but pass at mod 8 — the standing gate should be reliably green,
# not aspirational (per-round one-off runs can tighten the mod).
#
# Usage: tools/run_sf10_gate.sh [SF10_DIR] [RESUME_PREFIX] [LOG]
# Appends '<name> OK|FAIL|TIMEOUT' lines to ${PREFIX}.resume (full)
# and ${PREFIX}_slice.resume (sliced); prints a one-line summary to
# record in COVERAGE.md. Use a fresh per-round prefix.
set -u
sf="${1:-/tmp/sf10_scaled}"
prefix="${2:-BATTERY_sf10_gate}"
log="${3:-/tmp/sf10_gate.log}"
cd "$(dirname "$0")/.."
if [ ! -f "$sf/_SCALED_DONE" ]; then
  echo "generating $sf (make_scaled 100x)..."
  python tools/make_scaled.py 100 "$sf" >>"$log" 2>&1 || exit 1
fi
start=$(date +%s)

ORACLE_DUCK_MEM="${ORACLE_DUCK_MEM:-40GB}" \
ORACLE_DUCK_SPILL_MAX="${ORACLE_DUCK_SPILL_MAX:-25GiB}" \
  tools/run_slice.sh "$sf" "${prefix}.resume" "$log" 1800 \
  vector_topk bm25_score bm25_topk hybrid_search graph_search \
  ann_ivf_topk ann_ivfpq_topk ann_ivfpq_nprobe_sweep ann_tier_report \
  hybrid_weight_sweep dedup_exact dedup_minhash_band_sweep \
  dedup_incremental_lsh dedup_embedding_cosine_lsh

SPARK_GRAFT_DOC_SLICE_MOD=8 \
ORACLE_DUCK_MEM="${ORACLE_DUCK_MEM:-40GB}" \
ORACLE_DUCK_SPILL_MAX="${ORACLE_DUCK_SPILL_MAX:-25GiB}" \
  tools/run_slice.sh "$sf" "${prefix}_slice.resume" "$log" 1500 \
  dedup_minhash_lsh dedup_ngram_jaccard dedup_cluster_assign \
  dedup_cluster_size_histogram dedup_semdedup dedup_keep_best \
  dedup_token_cost_by_source curation_pipeline_summary

end=$(date +%s)
ok_full=$(grep -c " OK$" "${prefix}.resume" 2>/dev/null || echo 0)
ok_slice=$(grep -c " OK$" "${prefix}_slice.resume" 2>/dev/null || echo 0)
echo "sf10 gate: ${ok_full}/14 full OK, ${ok_slice}/8 sliced OK," \
     "$((end - start))s wall (record in COVERAGE.md)"
