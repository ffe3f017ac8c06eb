"""Round-8 additions: staged PQ tier (one PQ training per sf_dir,
served from cidx-partitioned parquet) and scoped state-store
partitioning for the bounded streaming replays."""

from __future__ import annotations

import pytest

from vector_graph_native_database__spark import registry
from vector_graph_native_database__spark.plans import plan_string, plan_summary

SF = "/root/testdata/sf0.001"


def plan_of(spark, name: str) -> str:
    return plan_string(registry.all_queries()[name](spark, SF))


@pytest.mark.parametrize(
    "name",
    [
        "ann_pq_topk",
        "ann_ivfpq_topk",
        "ann_ivfpq_multi",
        "ann_ivfpq_residual_topk",
    ],
)
def test_pq_family_serves_from_shared_staged_index(spark, name):
    # every PQ entry reads the staged codebooks/codes parquet instead
    # of re-running the per-subspace Lloyd training in-plan: the
    # training signature (posexplode -> per-component mean) must be
    # absent and the staged index path present (mirrors the IVF
    # family's test_ivf_family_serves_from_shared_staged_index)
    p = plan_of(spark, name)
    assert "pq_index" in p, f"{name} must read the staged PQ index"
    assert "posexplode" not in p, f"{name} must not retrain in-plan"
    assert "CartesianProduct" not in p


def test_ann_tier_report_zero_trainings_in_plan(spark):
    # with IVF and all three PQ tiers staged, the tier report's final
    # plan contains ZERO Lloyd trainings — every indexed tier is a
    # parquet read of its staged index (the round-7 verdict's task 3:
    # one PQ training per staged run, consumed by the report)
    df = registry.all_queries()["ann_tier_report"](spark, SF)
    p = plan_string(df)
    s = plan_summary(df)
    assert "posexplode" not in p, "no in-plan Lloyd training"
    assert p.count("pq_index") >= 3, "pq / ivfpq / residual tiers staged"
    assert "CartesianProduct" not in p
    assert s["python_row_udfs"] == 0


def test_ivfpq_staged_results_match_cold_build(spark):
    # the staged-index serving path must be value-identical to the
    # cold in-plan build (same training, parquet roundtrip exact)
    from vector_graph_native_database__spark.operators import ann
    from vector_graph_native_database__spark.registry.common import model
    from vector_graph_native_database__spark.registry.pipelineq import (
        ANN_QUERY_IDS,
        staged_pq_index,
    )

    _, emb, _ = model(spark, SF)
    cold = ann.ivfpq_topk(
        emb, ANN_QUERY_IDS, k=5, n_centroids=8, iters=2, nprobe=2,
        m=4, ksub=16, dim=64,
    )
    served = ann.ivfpq_topk(
        emb, ANN_QUERY_IDS, k=5, n_centroids=8, iters=2, nprobe=2,
        m=4, ksub=16, dim=64, index=staged_pq_index(spark, SF, emb),
    )
    key = lambda r: (r.qid, r.rnk)  # noqa: E731
    assert sorted(map(tuple, cold.collect()), key=lambda t: (t[0], t[3])) \
        == sorted(map(tuple, served.collect()), key=lambda t: (t[0], t[3]))


def test_residual_staged_results_match_cold_build(spark):
    from vector_graph_native_database__spark.operators import ann
    from vector_graph_native_database__spark.registry.common import model
    from vector_graph_native_database__spark.registry.pipelineq import (
        ANN_QUERY_IDS,
        staged_pq_index,
    )

    _, emb, _ = model(spark, SF)
    cold = ann.ivfpq_residual_topk(emb, ANN_QUERY_IDS, k=5)
    served = ann.ivfpq_residual_topk(
        emb, ANN_QUERY_IDS, k=5,
        index=staged_pq_index(spark, SF, emb, residual=True),
    )
    assert sorted(map(tuple, cold.collect()), key=lambda t: (t[0], t[3])) \
        == sorted(map(tuple, served.collect()), key=lambda t: (t[0], t[3]))


def test_replay_state_parts_scopes_and_restores(spark):
    # the context manager must apply the replay partition count inside
    # the scope and restore the session default afterwards, including
    # on error — batch stages must never inherit the replay sizing
    from vector_graph_native_database__spark.registry.common import (
        replay_state_parts,
    )

    key = "spark.sql.shuffle.partitions"
    before = spark.conf.get(key)
    with replay_state_parts(spark, 5):
        assert spark.conf.get(key) == "5"
    assert spark.conf.get(key) == before
    with pytest.raises(RuntimeError):
        with replay_state_parts(spark, 5):
            raise RuntimeError("boom")
    assert spark.conf.get(key) == before


def test_stream_outer_join_state_parts_bounded(spark, tmp_path):
    # the registry's stateful replays must run their state stores at
    # the scoped replay partition count (8 by default), not the
    # session's 32 — pinned by counting state-store directories in
    # the checkpoint the entry leaves behind
    import glob
    import os

    registry.all_queries()["events_stream_outer_join"](
        spark, SF
    ).write.mode("overwrite").format("noop").save()
    roots = glob.glob(
        os.path.join(
            os.environ.get("TMPDIR", "/tmp"),
            "vgndb_spark_scratch",
            "events_stream_outer_join_*",
            "ckpt",
            "state",
            "0",
            "*",
        )
    )
    parts = {
        os.path.basename(p)
        for p in roots
        if os.path.isdir(p) and os.path.basename(p).isdigit()
    }
    assert len(parts) == 8, f"expected 8 state partitions, saw {parts}"


def test_ivfpq_nprobe_sweep_recall_monotone_and_staged(spark):
    from vector_graph_native_database__spark.registry.qualityq import (
        q_ann_ivfpq_nprobe_sweep,
    )

    df = q_ann_ivfpq_nprobe_sweep(spark, SF)
    rows = {r["nprobe"]: r for r in df.collect()}
    assert set(rows) == {1, 2, 4}
    # probing more cells only adds candidates -> pairs and recall
    # monotone; compression may cost recall but never coverage
    assert rows[1]["n_pairs"] <= rows[2]["n_pairs"] <= rows[4]["n_pairs"]
    assert (
        rows[1]["recall_at_k"]
        <= rows[2]["recall_at_k"]
        <= rows[4]["recall_at_k"]
    )
    assert rows[4]["recall_at_k"] > 0
    # since round 10 the sweep is FUSED: one staged-tier ADC pass at
    # max(nprobe) is checkpointed and each point filters it by probe
    # rank — zero in-plan trainings, zero staged-index scans in the
    # final plan (the serving pass ran once, pre-checkpoint), one
    # checkpoint scan per point
    p = plan_string(df)
    assert "posexplode" not in p
    assert "pq_index" not in p, "ADC pass must run once, pre-checkpoint"
    assert p.count("Scan ExistingRDD") >= 4, (
        "each sweep point must read the staged candidates (+ truth)"
    )


@pytest.mark.parametrize(
    "name",
    ["dedup_semdedup", "dedup_semdedup_central", "embedding_kmeans"],
)
def test_kmeans_family_serves_from_shared_staged_index(spark, name):
    # kmeans_assign IS ivf_centroids' training (same seeding and
    # rounding), so the SemDedup family and the clustering entry
    # serve from the SAME staged IVF index as the ann_ivf_* family:
    # zero in-plan Lloyd trainings, staged parquet read present
    p = plan_of(spark, name)
    assert "ivf_index" in p, f"{name} must read the staged IVF index"
    assert "posexplode" not in p, f"{name} must not retrain in-plan"
    assert "CartesianProduct" not in p
