"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Runs each headline query end-to-end (noop sink — full materialization
of every output column, no driver collect overhead) and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Representative of every operator family; the full registry is the
# correctness surface, this is the performance surface.
HEADLINE = [
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
    # extension families: analytics / dedup / ANN / text / windows
    "graph_pagerank",
    "graph_connected_components",
    "dedup_minhash_lsh",
    "dedup_embedding_cosine",
    "ann_brute_topk",
    "text_quality_score",
    "doc_fingerprint",
    "events_session",
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
]


def main() -> None:
    from vector_graph_native_database__spark import registry
    from vector_graph_native_database__spark.session import get_spark

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.all_queries()

    # Warm the JVM/executor pool so query 1 doesn't pay startup.
    spark.range(1000).count()

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    times: dict[str, float] = {}
    extra = [k for k in qs if k in set(os.environ.get(
        "SPARK_GRAFT_BENCH_EXTRA", "").split(",")) and k not in HEADLINE]
    errors: dict[str, str] = {}
    for name in HEADLINE + extra:
        fn = qs[name]
        t0 = time.time()
        try:
            df = fn(spark, SF_DIR)
            df.write.mode("overwrite").format("noop").save()
            times[name] = round(time.time() - t0, 3)
        except Exception as exc:  # one bad query must not kill the bench
            errors[name] = f"{type(exc).__name__}: {exc}"[:200]

    out = {
        "metric": "headline query wall-clock, noop sink",
        "value": round(sum(times.values()), 3),
        "unit": "sec",
        "queries": times,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    if errors:
        out["errors"] = errors
    print(json.dumps(out))


if __name__ == "__main__":
    main()
