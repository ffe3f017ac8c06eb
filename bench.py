"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Two phases, one JSON line:

1. CANARY — the fixed 19-query set shared with the round-1 measured
   baseline (BASELINE.md round-1 table, 50.7s total) runs FIRST, in
   its own fresh JVM (a subprocess), 3 repetitions, per-query median.
   This is the round-over-round comparable number: same queries, same
   isolation, every round. Reported as "canary" / "canary_total" /
   "canary_baseline_ratio".
2. WIDE — the full headline set (every operator family) runs once in
   this process's own session (noop sink — full materialization of
   every output column, no driver collect overhead). Reported as
   "queries" / "value" (the driver's historical fields).

Prints ONE JSON line: {"metric": ..., "value": total_sec, "unit":
"sec", "queries": {name: sec}, "canary": {name: sec}, ...}.

Staged-build accounting (round 10): the shared scratch root
(/tmp/vgndb_spark_scratch — staged index artifacts + per-query
sinks) is PURGED at the start of every phase (canary child, sf1
child, wide set), so no bench number can serve a warm artifact
persisted by an earlier run: the first toucher of each staged
family pays the full build inside its own timed run. The canary
median (reps 2-3 warm) stays the cross-round-comparable protocol
number; the added "canary_cold" (rep-1 seconds) and
"staging_build_sec" (per-family cold build cost per phase) fields
make the build/serve split explicit instead of hidden.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# The 19 queries shared with the round-1 measured baseline
# (BASELINE.md "Measured baseline (round 1)" table). FIXED — never
# add to or reorder this list; it is the cross-round canary.
CANARY = [
    "scan_nodes",
    "vector_topk",
    "vector_topk_filtered",
    "bm25_topk",
    "graph_bfs",
    "graph_search",
    "hybrid_search",
    "embed_hash",
    "minmax_normalize",
    "node_upsert",
    "node_delete_cascade",
    "graph_pagerank",
    "graph_connected_components",
    "dedup_minhash_lsh",
    "dedup_embedding_cosine",
    "ann_brute_topk",
    "text_quality_score",
    "doc_fingerprint",
    "events_session",
]

# Round-1 per-query baseline seconds (BASELINE.md round-1 table).
CANARY_BASELINE = {
    "scan_nodes": 2.9,
    "vector_topk": 2.0,
    "vector_topk_filtered": 1.4,
    "bm25_topk": 6.7,
    "graph_bfs": 3.4,
    "graph_search": 2.5,
    "hybrid_search": 2.8,
    "embed_hash": 1.8,
    "minmax_normalize": 1.1,
    "node_upsert": 1.4,
    "node_delete_cascade": 2.1,
    "graph_pagerank": 4.4,
    "graph_connected_components": 2.1,
    "dedup_minhash_lsh": 4.5,
    "dedup_embedding_cosine": 5.4,
    "ann_brute_topk": 1.8,
    "text_quality_score": 1.1,
    "doc_fingerprint": 2.1,
    "events_session": 1.1,
}

CANARY_REPS = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))

# Round-7 sf1 anchor medians (BASELINE.md "Round 7, sf1 scale
# anchor"): the same 19 canary queries at /tmp/sf1_scaled (10× sf0.1
# key-offset replica). The per-round sf1 canary compares against
# these so super-linear drift is caught the round it appears, not at
# the next sf10 sweep.
CANARY_SF1_ANCHOR = {
    "scan_nodes": 0.46,
    "vector_topk": 0.99,
    "vector_topk_filtered": 1.06,
    "bm25_topk": 10.88,
    "graph_bfs": 3.85,
    "graph_search": 2.69,
    "hybrid_search": 5.31,
    "embed_hash": 12.33,
    "minmax_normalize": 1.13,
    "node_upsert": 1.31,
    "node_delete_cascade": 1.27,
    "graph_pagerank": 4.36,
    "graph_connected_components": 3.56,
    "dedup_minhash_lsh": 32.32,
    "dedup_embedding_cosine": 5.27,
    "ann_brute_topk": 2.68,
    "text_quality_score": 3.92,
    "doc_fingerprint": 7.64,
    "events_session": 1.21,
}

SF1_DIR = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/sf1_scaled")

# Representative of every operator family; the full registry is the
# correctness surface, this is the performance surface.
HEADLINE = CANARY + [
    # corpus preparation: chunking + composed clean pipeline
    "doc_chunk",
    "corpus_clean",
    "corpus_pipeline_summary",
    # curation wave 2: clusters / decontamination / kNN join / MMR
    "dedup_cluster_from_pairs",
    "decontaminate",
    "ann_knn_join",
    "ann_mmr_rerank",
    # round-3 hardening families: multi-probe recall path, hot-key
    # salted join, mergeable sketches
    "ann_multiprobe_lsh_topk",
    "ann_ivfpq_topk",
    "skew_salted_join",
    "approx_distinct_hll_union",
    "text_pmi_bigrams",
    "curation_pipeline_summary",
    "curation_pipeline_staged",
    # round-3 extension wave: CDC merge, radius search, link
    # prediction, distributed power-iteration PCA
    "scd2_orders_merge",
    "ann_range_search",
    "graph_jaccard_linkpred",
    "embedding_pca_pc1",
    "graph_ppr",
    "text_bigram_logprob",
    # enrichment wave: HITS, bloom pruning, CMS heavy hitters,
    # winnowing fingerprints, sampled closeness
    "graph_hits",
    "bloom_semi_join",
    "heavy_hitters_cms",
    "doc_winnowing",
    "graph_closeness_sampled",
    "ann_binary_hamming_topk",
    "dedup_winnowing_pairs",
    "ann_binary_rerank_topk",
    "graph_betweenness_sampled",
    # quality / OLAP-pushdown / time-series wave
    "olap_forecast_revenue",
    "events_ohlc_bars",
    "events_ewma",
    "dq_constraint_check",
    "profile_table_stats",
    # closing wave: MRL tiered retrieval, walk corpus, CDC compaction
    "ann_matryoshka_topk",
    "graph_walk_corpus",
    "cdc_changelog_apply",
    # round-4: BM25 deployment shapes (staged stats; batched queries),
    # chunk-level corpus dedup, nation-pair trade OLAP, bounded SCC,
    # bucketed co-located join
    "bm25_topk_indexed",
    "bm25_topk_multi",
    "corpus_chunk_dedup",
    "olap_nation_trade_volume",
    "graph_scc_bounded",
    "io_bucketed_join",
    "ann_ivfpq_staged_topk",
    # round-4 coda: tokenizer-training pair counts, grouping-sets
    # trio completion, SCC condensation DAG, stream-static enrichment
    "text_bpe_first_merges",
    "olap_grouping_sets",
    "graph_scc_condensation",
    "events_stream_dim_join",
    # round-5: amortized multi-query IVF-PQ serving, TPC-H Q12/Q21,
    # ANN tier frontier report, exact SCC, streaming->BM25 serving loop
    "ann_ivfpq_multi",
    "olap_shipmode_priority",
    "olap_waiting_suppliers",
    "ann_tier_report",
    "graph_scc_exact",
    "bm25_topk_streamed_index",
    # round-5 second wave: DSIR resampling weights, SemDeDup,
    # temperature mixing, PSI drift gate, Markov transitions,
    # one-pass quality regression, attribution, tokenizer fertility,
    # Z-order layout
    "dsir_importance_weights",
    "dedup_semdedup",
    "sample_temperature_mix",
    "dq_drift_psi",
    "events_markov_transitions",
    "text_quality_regression",
    "events_attribution",
    "text_tokenizer_fertility",
    "io_zorder_layout",
    "olap_market_basket",
    "ann_jl_distortion_eval",
    "dsir_resample_topk",
    "mixture_pipeline_summary",
    "events_ab_ttest",
    "graph_assortativity",
    "markov_incremental_equiv",
    "events_ab_cuped",
    "ann_jl_topk",
    "dedup_incremental_lsh",
    "events_top_paths",
    "events_active_users",
    "text_diversity_by_source",
    "profile_embedding_stats",
    "dedup_semdedup_central",
    "io_partition_skew_report",
    "tmix_incremental_equiv",
    "sql_frontend_seg_revenue",
    "graph_degree_histogram",
    "ann_ivf_nprobe_sweep",
    # round-5 continuation: delta-join IVM, zone-map prune report,
    # derived-partsupp TPC-H completions (Q2/Q9/Q11/Q16/Q20)
    "ivm_join_maintenance",
    "io_zonemap_prune_eval",
    "olap_mincost_supplier",
    "olap_product_profit",
    "olap_important_stock",
    "olap_parts_supplier_cnt",
    "olap_excess_stock",
    "ann_ivf_streamed_index",
    "text_ngram_novelty",
    "graph_components_incremental",
    "vector_state_cdc_equiv",
    "dedup_minhash_band_sweep",
    "ann_ivf_filtered_topk",
    "hybrid_weight_sweep",
    "corpus_token_budget",
    "dedup_cluster_size_histogram",
    "eval_auc_rank",
    "olap_pareto_frontier",
    "events_autocorr",
    "dedup_jaccard_prefix_filter",
    "er_blocked_matches",
    "split_group_holdout",
    "feature_quantile_bins",
    "dq_table_diff",
    "graph_hyperanf",
    "stats_boxplot",
    "eval_ndcg_ann",
    "pack_epoch_shuffle",
    "events_attribution_linear",
    "graph_walk_counts",
    "text_jsd_by_source",
    "events_backtest_seasonal",
    "olap_copurchase_topk",
    "graph_katz_bounded",
    "olap_ship_delay_quartiles",
    "events_time_to_convert",
    "events_watermark_lateness",
    "olap_revenue_gini",
    "approx_quantile_histogram",
    "graph_effective_diameter",
    # round-5 wave E: motif census, survival/CUSUM/Mann-Whitney
    # experiment readouts, within-doc repetition, outer stream join,
    # calibration bins, rich club
    "graph_square_count",
    "events_survival_curve",
    "events_cusum_changepoint",
    "events_ab_mannwhitney",
    "text_repetition_score",
    "events_stream_outer_join",
    "eval_calibration_bins",
    "graph_rich_club",
    "dedup_cross_source_matrix",
    "text_perplexity_buckets",
    "olap_top_parts_per_nation",
    "events_new_vs_returning",
    "events_slo_burn_rate",
    "events_retention_dn",
    "events_session_duration_quartiles",
    "approx_intersection_kmv",
    "hybrid_search_multi",
    "vector_topk_multi",
    "graph_bfs_multi",
    "olap_ltv_quartiles",
    "olap_order_gap_quartiles",
    "events_user_concentration",
    # round-6 wave: staleness/filtered-recall readouts, hard-negative
    # mining (both retrieval families), index balance, power analysis,
    # and the two rewritten scale-safe events entries
    "ann_ivf_stale_recall",
    "ann_filtered_nprobe_sweep",
    "ann_hard_negatives",
    "bm25_hard_negatives",
    "bm25_hard_negatives_deduped",
    "ann_ivf_cell_stats",
    "events_power_analysis",
    "events_rfm_segments",
    # (events_watermark_lateness is already in the wide list above)
    "dedup_token_cost_by_source",
    "events_funnel_window_sweep",
    # round-8: IVF-PQ tuning curve served from the staged PQ tier
    "ann_ivfpq_nprobe_sweep",
]


def _purge_scratch() -> None:
    """Remove the shared scratch root (staged index artifacts +
    per-query sinks/checkpoints) so every bench phase starts COLD:
    the first toucher of each staged family pays the full build
    inside its own timed run, and nothing persisted by a previous
    process (battery, earlier bench, builder session) can serve a
    warm read into a bench number. Round-9 verdict item 1a."""
    import shutil
    import tempfile

    shutil.rmtree(
        os.path.join(tempfile.gettempdir(), "vgndb_spark_scratch"),
        ignore_errors=True,
    )


def _staging_build_sec() -> dict[str, float]:
    """This process's cold staged-build ledger (family -> seconds)."""
    from vector_graph_native_database__spark.operators import staging

    return dict(staging.BUILD_SECONDS)


def _run_set(
    names: list[str], reps: int
) -> tuple[dict[str, float], dict[str, str], dict[str, float]]:
    """Time each query end-to-end (noop sink) ``reps`` times in one
    session; return (per-query median seconds, errors, per-query
    FIRST-rep seconds). With a purged scratch root the first rep is
    the cold build+serve cost, the median the warm serve cost."""
    from vector_graph_native_database__spark import registry
    from vector_graph_native_database__spark.session import get_spark

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.all_queries()

    # Warm the JVM/executor pool so query 1 doesn't pay startup.
    spark.range(1000).count()

    samples: dict[str, list[float]] = {n: [] for n in names}
    errors: dict[str, str] = {}
    for _ in range(reps):
        for name in names:
            if name in errors or name not in qs:
                if name not in qs:
                    errors[name] = "not in registry"
                continue
            t0 = time.time()
            try:
                df = qs[name](spark, SF_DIR)
                df.write.mode("overwrite").format("noop").save()
                samples[name].append(time.time() - t0)
            except Exception as exc:  # one bad query must not kill it
                errors[name] = f"{type(exc).__name__}: {exc}"[:200]
                # A query that succeeded in an earlier rep but failed
                # now must NOT contribute a short-sample "median" (and
                # silently satisfy the canary-completeness guard while
                # also erroring) — drop its partial samples entirely.
                samples.pop(name, None)
    times = {
        n: round(statistics.median(v), 3)
        for n, v in samples.items()
        if v
    }
    cold = {n: round(v[0], 3) for n, v in samples.items() if v}
    return times, errors, cold


def main() -> None:
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]

    if "--canary" in sys.argv:
        # Child mode: the canary set alone, in this fresh JVM. The
        # scratch root is purged first so rep 1 charges every staged
        # build in-run; the median stays the cross-round-comparable
        # warm number and rep 1 is reported alongside as "cold".
        _purge_scratch()
        times, errors, cold = _run_set(CANARY, CANARY_REPS)
        print(
            json.dumps(
                {
                    "canary": times,
                    "errors": errors,
                    "cold": cold,
                    "staging_build_sec": _staging_build_sec(),
                }
            )
        )
        return

    # Phase 1: canary in its OWN fresh JVM, before anything else
    # touches Spark in this process.
    canary: dict[str, float] = {}
    canary_err: dict[str, str] = {}
    canary_cold: dict[str, float] = {}
    canary_builds: dict[str, float] = {}
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--canary"],
            capture_output=True,
            text=True,
            timeout=1800,
            env=os.environ.copy(),
        )
        for line in reversed(proc.stdout.strip().splitlines()):
            line = line.strip()
            if line.startswith("{"):
                parsed = json.loads(line)
                canary = parsed.get("canary", {})
                canary_err = parsed.get("errors", {})
                canary_cold = parsed.get("cold", {})
                canary_builds = parsed.get("staging_build_sec", {})
                break
    except Exception as exc:  # canary failure must not kill the bench
        canary_err["__subprocess__"] = f"{type(exc).__name__}: {exc}"[:200]

    # Phase 1b: sf1 canary — the standing scale gate. Regenerates the
    # 10× key-offset replica if the container was recycled (~1 min),
    # then runs the same 19 queries in their own fresh JVM and
    # compares against the round-7 sf1 anchor. Opt out with
    # SPARK_GRAFT_SF1_CANARY=0; runs only for the default sf0.1 bench
    # so a bench already pointed at another scale isn't doubled.
    canary_sf1: dict[str, float] = {}
    sf1_err: dict[str, str] = {}
    sf1_builds: dict[str, float] = {}
    run_sf1 = (
        os.environ.get("SPARK_GRAFT_SF1_CANARY", "1") != "0"
        and sf == "0.1"
    )
    if run_sf1:
        try:
            # gate on the completion sentinel make_scaled writes LAST,
            # not any one table file — a partially-generated dir from
            # an interrupted run must be regenerated, not reused
            if not os.path.exists(os.path.join(SF1_DIR, "_SCALED_DONE")):
                subprocess.run(
                    [
                        sys.executable,
                        os.path.join(
                            os.path.dirname(os.path.abspath(__file__)),
                            "tools",
                            "make_scaled.py",
                        ),
                        "10",
                        SF1_DIR,
                    ],
                    capture_output=True,
                    timeout=900,
                    check=True,
                )
            env = os.environ.copy()
            env["SPARK_GRAFT_SF_DIR"] = SF1_DIR
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--canary"],
                capture_output=True,
                text=True,
                timeout=3600,
                env=env,
            )
            for line in reversed(proc.stdout.strip().splitlines()):
                line = line.strip()
                if line.startswith("{"):
                    parsed = json.loads(line)
                    canary_sf1 = parsed.get("canary", {})
                    sf1_err = parsed.get("errors", {})
                    sf1_builds = parsed.get("staging_build_sec", {})
                    break
        except Exception as exc:
            sf1_err["__subprocess__"] = f"{type(exc).__name__}: {exc}"[:200]

    # Phase 2: the wide headline set, once, in this process's session.
    # Purge again so the canary children's staged artifacts cannot
    # serve a warm read here: every wide number is build-inclusive
    # for the first toucher of each staged family.
    _purge_scratch()
    extra = [
        k
        for k in os.environ.get("SPARK_GRAFT_BENCH_EXTRA", "").split(",")
        if k and k not in HEADLINE
    ]
    times, errors, _cold = _run_set(HEADLINE + extra, 1)

    out = {
        "metric": "headline query wall-clock, noop sink",
        "value": round(sum(times.values()), 3),
        "unit": "sec",
        "queries": times,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "canary": canary,
        "canary_total": round(sum(canary.values()), 3),
        "canary_reps": CANARY_REPS,
        "canary_note": (
            "fixed shared-19 set vs BASELINE.md round-1 table; own "
            "fresh JVM, median of reps; scratch root purged at every "
            "phase start so rep 1 charges staged builds in-run"
        ),
        # Cold/warm split for the staged-index families (round-9
        # verdict item 1): rep-1 seconds per canary query (build-
        # inclusive for first touchers) + the cold build cost each
        # phase actually paid, per staged family.
        "canary_cold": canary_cold,
        "staging_build_sec": {
            "canary": canary_builds,
            "wide": _staging_build_sec(),
        },
        # The 8-vs-32-core scaling probe is overhead-bound at sf0.1
        # (round-9 verdict item 3); sf1 is the smallest scale where
        # the ratio is informative.
        "scaling_hint_sf": 1.0,
    }
    if canary and all(n in canary for n in CANARY):
        base_total = sum(CANARY_BASELINE.values())
        out["canary_baseline_ratio"] = round(
            out["canary_total"] / base_total, 3
        )
        out["canary_worst_query_ratio"] = round(
            max(canary[n] / CANARY_BASELINE[n] for n in CANARY), 3
        )
    if run_sf1:
        out["canary_sf1"] = canary_sf1
        # null, not 0.0, when the subprocess failed — a "0-second
        # canary" and a MISSING canary must be distinguishable
        out["canary_sf1_total"] = (
            round(sum(canary_sf1.values()), 3) if canary_sf1 else None
        )
        out["canary_sf1_note"] = (
            "same 19 queries at the 10x key-offset replica "
            f"({SF1_DIR}); anchor = BASELINE.md round-7 sf1 table"
        )
        out["staging_build_sec"]["sf1"] = sf1_builds
        if canary_sf1 and all(n in canary_sf1 for n in CANARY):
            out["canary_sf1_anchor_ratio"] = round(
                out["canary_sf1_total"] / sum(CANARY_SF1_ANCHOR.values()), 3
            )
            out["canary_sf1_worst_query_ratio"] = round(
                max(
                    canary_sf1[n] / CANARY_SF1_ANCHOR[n] for n in CANARY
                ),
                3,
            )
    if errors or canary_err or sf1_err:
        out["errors"] = {
            **canary_err,
            **{f"sf1:{k}": v for k, v in sf1_err.items()},
            **errors,
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
