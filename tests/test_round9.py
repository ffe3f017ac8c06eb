"""Round-9 additions: the deterministic doc-id slice harness
(SPARK_GRAFT_DOC_SLICE_MOD) that makes the duplication-quadratic
pair oracles DuckDB-feasible at sf10, and the staged MinHash index's
subset-serving identity.
"""

from __future__ import annotations

import os

import duckdb
import pytest
from pyspark.sql import functions as F

from vector_graph_native_database__spark.sources.loaders import load_table

SF = "/root/testdata/sf0.001"


def _sliced_ids_spark(spark, table, key, mod):
    os.environ["SPARK_GRAFT_DOC_SLICE_MOD"] = str(mod)
    try:
        return {
            r[0]
            for r in load_table(spark, SF, table).select(key).collect()
        }
    finally:
        del os.environ["SPARK_GRAFT_DOC_SLICE_MOD"]


@pytest.mark.parametrize(
    "table,key", [("documents", "doc_id"), ("embeddings", "vec_id")]
)
def test_doc_slice_spark_duckdb_hash_parity(spark, table, key):
    # THE load-bearing property of the slice harness: Spark's inlined
    # 60-bit md5-prefix hash and the DuckDB view predicate keep the
    # exact same id set, for every K — otherwise every sliced value
    # check is vacuously wrong
    con = duckdb.connect()
    for mod in (2, 4, 8):
        got = _sliced_ids_spark(spark, table, key, mod)
        want = {
            r[0]
            for r in con.execute(
                f"SELECT {key} FROM read_parquet('{SF}/{table}.parquet') "
                f"WHERE ('0x' || substr(md5(CAST({key} AS VARCHAR)), 1, "
                f"15))::BIGINT % {mod} = 0"
            ).fetchall()
        }
        assert got == want, f"slice mismatch for {table} mod {mod}"
        assert 0 < len(got), "slice must be non-empty at mod <= 8"
    full = {
        r[0] for r in load_table(spark, SF, table).select(key).collect()
    }
    assert _sliced_ids_spark(spark, table, key, 1) == full


def test_doc_slice_off_by_default(spark):
    # no env → loaders pass the table through untouched
    assert os.environ.get("SPARK_GRAFT_DOC_SLICE_MOD") in (None, "", "0")
    n = load_table(spark, SF, "documents").count()
    con = duckdb.connect()
    want = con.execute(
        f"SELECT count(*) FROM read_parquet('{SF}/documents.parquet')"
    ).fetchone()[0]
    assert n == want


def test_minhash_staged_subset_identity(spark):
    # the subset-serving contract minhash_index_stage documents:
    # semi-joining the staged full-corpus signatures to a subset's
    # ids equals building signatures on the subset directly
    from vector_graph_native_database__spark.operators import dedup
    from vector_graph_native_database__spark.registry.common import model

    nodes, _, _ = model(spark, SF)
    _, sig_all = dedup.minhash_index_stage(spark, nodes, SF)
    subset = nodes.filter(F.col("id").cast("long") % 3 == 0)
    served = (
        sig_all.join(subset.select("id"), "id", "left_semi")
        .orderBy("id", "perm")
        .collect()
    )
    built = (
        dedup.minhash_signatures(dedup.shingles(subset, "id", "text", 2), 12)
        .orderBy("id", "perm")
        .collect()
    )
    assert served == built


def test_cluster_audit_family_computes_clusters_in_plan(spark):
    # round-9 verdict item 2 (round 10 unwind): the dedup sign-off
    # reports and the assignment entry itself must COMPUTE the
    # (id, cluster, keep) assignment inside the timed query — no
    # persisted cluster-table read (that is result caching). The
    # staged MinHash INDEX is the one allowed staged input.
    from vector_graph_native_database__spark import registry
    from vector_graph_native_database__spark.plans import plan_string

    for name in (
        "dedup_cluster_assign",
        "dedup_keep_best",
        "dedup_cluster_size_histogram",
        "dedup_token_cost_by_source",
        "curation_pipeline_staged",
    ):
        p = plan_string(registry.all_queries()[name](spark, SF))
        assert "vgndb_spark_scratch/dedup_clusters" not in p, (
            f"{name} must not read a persisted cluster table"
        )


def test_staged_index_dir_is_slice_salted():
    # a doc-slice run sees a different effective dataset, so its
    # staged artifacts must never share a directory with (or poison)
    # the full-corpus ones — for every staged family
    from vector_graph_native_database__spark.operators.staging import (
        staged_index_dir,
    )

    dirs = {}
    for mod in ("", "4", "8"):
        if mod:
            os.environ["SPARK_GRAFT_DOC_SLICE_MOD"] = mod
        else:
            os.environ.pop("SPARK_GRAFT_DOC_SLICE_MOD", None)
        try:
            dirs[mod] = staged_index_dir("bm25_index", SF, "tok-v1")
        finally:
            os.environ.pop("SPARK_GRAFT_DOC_SLICE_MOD", None)
    assert len(set(dirs.values())) == 3, (
        "sliced and full-corpus staged artifacts must not share dirs"
    )
    # and mod unset == mod 0 (explicit off)
    os.environ["SPARK_GRAFT_DOC_SLICE_MOD"] = "0"
    try:
        assert staged_index_dir("bm25_index", SF, "tok-v1") == dirs[""]
    finally:
        del os.environ["SPARK_GRAFT_DOC_SLICE_MOD"]


def test_ngram_jaccard_prefix_filter_is_lossless(spark):
    # the AllPairs/PPJoin prefix-filtered plan must emit EXACTLY the
    # naive posting-join's pairs (the losslessness the operator's
    # default-off rationale depends on; see ngram_jaccard_pairs
    # docstring for the measured default decision)
    from vector_graph_native_database__spark.operators import dedup
    from vector_graph_native_database__spark.registry.common import model

    nodes, _, _ = model(spark, SF)
    for k, t in ((2, 0.8), (3, 0.5)):
        naive = (
            dedup.ngram_jaccard_pairs(
                nodes, k=k, threshold=t, prefix_filter=False
            )
            .orderBy("id_a", "id_b")
            .collect()
        )
        filtered = (
            dedup.ngram_jaccard_pairs(
                nodes, k=k, threshold=t, prefix_filter=True
            )
            .orderBy("id_a", "id_b")
            .collect()
        )
        assert filtered == naive, f"prefix filter dropped pairs at k={k}"
    assert len(naive) > 0  # non-vacuous at k=3, θ=0.5


def test_scc_family_computes_labels_in_plan(spark):
    # round-9 verdict item 2 (round 10 unwind): the exact-SCC entry
    # and the condensation DAG must run the contraction rounds inside
    # the timed query — no persisted label-table read (the labels are
    # graph_scc_exact's own declared output)
    from vector_graph_native_database__spark import registry
    from vector_graph_native_database__spark.plans import plan_string

    for name in ("graph_scc_exact", "graph_scc_condensation"):
        p = plan_string(registry.all_queries()[name](spark, SF))
        assert "vgndb_spark_scratch/scc_labels" not in p, (
            f"{name} must not read a persisted SCC label table"
        )


def test_bm25_family_serves_from_staged_index(spark):
    # the lexical-search serving path reads the staged posting/stats
    # parquet (bm25_index_stage) instead of re-tokenizing the corpus
    # per query: no Generate(explode) node anywhere in the plan, and
    # the scan list includes the staged artifact
    from vector_graph_native_database__spark import registry
    from vector_graph_native_database__spark.plans import plan_string

    for name in (
        "bm25_score",
        "bm25_topk",
        "bm25_topk_multi",
        "bm25_hard_negatives",
        "bm25_hard_negatives_deduped",
    ):
        p = plan_string(registry.all_queries()[name](spark, SF))
        assert "vgndb_spark_scratch/bm25_index" in p, (
            f"{name} must read the staged posting index"
        )
        assert "Generate explode" not in p, (
            f"{name} must not re-tokenize the corpus in-plan"
        )
        assert "In(tok" in p, (
            f"{name} must push its query vocabulary into the posting "
            "scan (literal In(tok, …) → row-group skipping on the "
            "token-clustered staged layout)"
        )


def test_bm25_staged_equals_cold_build(spark):
    # value identity between the disk-staged serving path and the
    # cold in-plan build (the oracle checks this against SQL too;
    # this pins it hermetically, staged-vs-unstaged)
    from vector_graph_native_database__spark.operators import bm25
    from vector_graph_native_database__spark.registry.common import model
    from vector_graph_native_database__spark.registry.searchq import (
        BM25_QUERY,
    )

    nodes, _, _ = model(spark, SF)
    stats = bm25.bm25_index_stage(spark, nodes, SF)
    staged = (
        bm25.bm25_topk(nodes, BM25_QUERY, 15, 6, stats=stats)
        .orderBy("id")
        .collect()
    )
    cold = (
        bm25.bm25_topk(nodes, BM25_QUERY, 15, 6).orderBy("id").collect()
    )
    assert staged == cold


def test_bm25_staged_subset_identity(spark):
    # postings are row-local per doc: semi-joining the staged
    # full-corpus posting to a subset's ids then re-aggregating the
    # stats equals building the index on the subset directly (the
    # contract the deduped hard-negative miner relies on)
    from vector_graph_native_database__spark.operators import bm25
    from vector_graph_native_database__spark.registry.common import model

    nodes, _, _ = model(spark, SF)
    posting = bm25.staged_posting_frame(spark, nodes, SF)
    subset = nodes.filter(F.col("id").cast("long") % 3 == 0)
    sub_posting = posting.join(subset.select("id"), "id", "left_semi")
    tf_s, dl_s, df_s = bm25.stats_from_posting(sub_posting)
    tf_b, dl_b, df_b = bm25.corpus_stats(subset)
    for served, built, keys in (
        (tf_s, tf_b, ["id", "tok"]),
        (dl_s, dl_b, ["id"]),
        (df_s, df_b, ["tok"]),
    ):
        assert (
            served.orderBy(*keys).collect()
            == built.orderBy(*keys).collect()
        )


def test_ngram_jaccard_dense_dispatch_identity(spark):
    # the dense blocked-GEMM twin must return EXACTLY the posting
    # join's pairs and float64 jaccard values (the band sweep's truth
    # serves from it), and a vocabulary above the cap must fall
    # through to the posting join untouched
    from vector_graph_native_database__spark.operators import dedup
    from vector_graph_native_database__spark.registry.common import model

    nodes, _, _ = model(spark, SF)
    reps = (
        nodes.groupBy("text")
        .agg(F.min("id").alias("id"))
        .select("id", F.col("text"))
    )
    sh2 = dedup.shingles(reps, "id", "text", 2)
    posting = dedup.ngram_jaccard_pairs(reps, k=2, threshold=0.8, sh=sh2)
    dense = dedup.ngram_jaccard_pairs(
        reps, k=2, threshold=0.8, sh=sh2, dense_max_vocab=4096
    )
    assert sorted(map(tuple, dense.collect()), key=lambda t: t[:2]) == sorted(
        map(tuple, posting.collect()), key=lambda t: t[:2]
    ), "dense path must be bit-identical to the posting join"
    # cap below the measured vocabulary -> posting join (no Python in
    # the plan)
    fallthrough = dedup.ngram_jaccard_pairs(
        reps, k=2, threshold=0.8, sh=sh2, dense_max_vocab=3
    )
    assert "FlatMapGroupsInPandas" not in (
        fallthrough._jdf.queryExecution().analyzed().toString()
    ), "above-cap vocabulary must use the posting join, not the GEMM"
    assert sorted(map(tuple, fallthrough.collect()), key=lambda t: t[:2]) == sorted(
        map(tuple, posting.collect()), key=lambda t: t[:2]
    )


def test_band_sweep_single_candidate_join(spark, monkeypatch):
    # BUILD-cost pin for the fused sweep: the aligned divisors nest
    # the candidate sets, so the whole 3-point sweep must generate
    # candidates ONCE (one banded join at the most permissive
    # setting), not once per sweep point
    from vector_graph_native_database__spark import registry
    from vector_graph_native_database__spark.operators import dedup

    calls = {"cand": 0}
    real = dedup.lsh_candidate_pairs

    def counting(*a, **kw):
        calls["cand"] += 1
        return real(*a, **kw)

    monkeypatch.setattr(dedup, "lsh_candidate_pairs", counting)
    df = registry.all_queries()["dedup_minhash_band_sweep"](spark, SF)
    assert df.count() == 3
    assert calls == {"cand": 1}
