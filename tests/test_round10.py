"""Round-10 additions: the fused nprobe sweeps (one scored candidate
pass at max(nprobe), per-point filter + re-rank) must be value-
identical to the unfused per-point serving calls, and run exactly one
candidate pass; the bench's staged-build accounting must purge the
scratch root and report build seconds.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _rows(df, *keys):
    return [tuple(r) for r in df.orderBy(*keys).collect()]


def test_fused_ivf_nprobe_sweep_equals_unfused(spark):
    # per sweep point: candidates(nprobe=max) filtered to prb <= p,
    # re-ranked, equals ivf_topk(nprobe=p) — the probe-prefix nesting
    # the fusion depends on
    from vector_graph_native_database__spark.operators import ann
    from vector_graph_native_database__spark.registry import pipelineq
    from vector_graph_native_database__spark.registry.common import model
    from vector_graph_native_database__spark.registry.qualityq import (
        ANN_EVAL_K,
        NPROBE_SWEEP,
    )
    from pyspark.sql import Window

    _, emb, _ = model(spark, SF)
    idx = pipelineq.staged_ivf_index(spark, SF, emb)
    cand = ann.ivf_candidates(
        emb, pipelineq.ANN_QUERY_IDS,
        nprobe=max(NPROBE_SWEEP), dim=64, round_scores=6, index=idx,
    ).select("qid", "id", "cos", "prb")
    wk = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("id"))
    for p in NPROBE_SWEEP:
        fused = (
            cand.filter(F.col("prb") <= p)
            .withColumn("rnk", F.row_number().over(wk))
            .filter(F.col("rnk") <= ANN_EVAL_K)
            .select("qid", "id", "cos", "rnk")
        )
        unfused = ann.ivf_topk(
            emb, pipelineq.ANN_QUERY_IDS, k=ANN_EVAL_K,
            nprobe=p, dim=64, round_scores=6, index=idx,
        )
        assert _rows(fused, "qid", "rnk") == _rows(unfused, "qid", "rnk"), (
            f"fused IVF sweep diverges from ivf_topk at nprobe={p}"
        )


def test_fused_ivfpq_nprobe_sweep_equals_unfused(spark):
    from vector_graph_native_database__spark.operators import ann
    from vector_graph_native_database__spark.registry import pipelineq
    from vector_graph_native_database__spark.registry.common import model
    from vector_graph_native_database__spark.registry.qualityq import (
        ANN_EVAL_K,
        NPROBE_SWEEP,
    )
    from pyspark.sql import Window

    _, emb, _ = model(spark, SF)
    idx = pipelineq.staged_pq_index(spark, SF, emb)
    cand = ann.ivfpq_staged_candidates(
        emb, pipelineq.ANN_QUERY_IDS,
        nprobe=max(NPROBE_SWEEP), m=4, ksub=16, dim=64, index=idx,
    )
    wk = Window.partitionBy("qid").orderBy("adist", "id")
    for p in NPROBE_SWEEP:
        fused = (
            cand.filter(F.col("prb") <= p)
            .withColumn("rnk", F.row_number().over(wk))
            .filter(F.col("rnk") <= ANN_EVAL_K)
            .select("qid", "id", "adist", "rnk")
        )
        unfused = ann.ivfpq_topk(
            emb, pipelineq.ANN_QUERY_IDS, k=ANN_EVAL_K, nprobe=p,
            m=4, ksub=16, dim=64, index=idx,
        )
        assert _rows(fused, "qid", "rnk") == _rows(unfused, "qid", "rnk"), (
            f"fused IVF-PQ sweep diverges from ivfpq_topk at nprobe={p}"
        )


def test_fused_filtered_sweep_equals_unfused(spark):
    from vector_graph_native_database__spark.operators import ann
    from vector_graph_native_database__spark.registry import pipelineq
    from vector_graph_native_database__spark.registry.common import model
    from vector_graph_native_database__spark.registry.qualityq import (
        ANN_EVAL_K,
        FILTERED_NPROBE_SWEEP,
    )
    from pyspark.sql import Window

    nodes, emb, _ = model(spark, SF)
    allowed = nodes.filter(F.col("lang") == "en").select("id")
    idx = pipelineq.staged_ivf_index(spark, SF, emb)
    cand = ann.ivf_candidates(
        emb, pipelineq.ANN_QUERY_IDS,
        nprobe=max(FILTERED_NPROBE_SWEEP), dim=64, round_scores=6,
        allowed=allowed, index=idx,
    ).select("qid", "id", "cos", "prb")
    wk = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("id"))
    for p in FILTERED_NPROBE_SWEEP:
        fused = (
            cand.filter(F.col("prb") <= p)
            .withColumn("rnk", F.row_number().over(wk))
            .filter(F.col("rnk") <= ANN_EVAL_K)
            .select("qid", "id", "cos", "rnk")
        )
        unfused = ann.ivf_topk(
            emb, pipelineq.ANN_QUERY_IDS, k=ANN_EVAL_K,
            nprobe=p, dim=64, round_scores=6, allowed=allowed, index=idx,
        )
        assert _rows(fused, "qid", "rnk") == _rows(unfused, "qid", "rnk"), (
            f"fused filtered sweep diverges at nprobe={p}"
        )


@pytest.mark.parametrize(
    "name,fn",
    [
        ("ann_ivf_nprobe_sweep", "ivf_candidates"),
        ("ann_filtered_nprobe_sweep", "ivf_candidates"),
        ("ann_ivfpq_nprobe_sweep", "ivfpq_staged_candidates"),
    ],
)
def test_nprobe_sweeps_single_candidate_pass(spark, monkeypatch, name, fn):
    # BUILD-cost pin: the whole sweep generates scored candidates
    # exactly ONCE (the band-sweep call-count idiom)
    from vector_graph_native_database__spark import registry
    from vector_graph_native_database__spark.operators import ann

    calls = {"n": 0}
    real = getattr(ann, fn)

    def counting(*a, **kw):
        calls["n"] += 1
        return real(*a, **kw)

    monkeypatch.setattr(ann, fn, counting)
    df = registry.all_queries()[name](spark, SF)
    assert df.count() >= 3
    assert calls == {"n": 1}, f"{name} must score candidates once"


def test_bench_purges_scratch_and_reports_builds(tmp_path, monkeypatch):
    # the canary child must start from a purged scratch root (no
    # warm staged artifact can survive into a bench number), and
    # write_staged must ledger cold build seconds per family
    import tempfile

    from vector_graph_native_database__spark.operators import staging

    monkeypatch.setattr(tempfile, "gettempdir", lambda: str(tmp_path))
    root = tmp_path / "vgndb_spark_scratch"
    (root / "bm25_index" / "deadbeef").mkdir(parents=True)
    (root / "bm25_index" / "deadbeef" / "_DONE").write_text("ok\n")

    import bench

    bench._purge_scratch()
    assert not root.exists(), "purge must remove the scratch root"

    staging.BUILD_SECONDS.clear()
    final = staging.staged_index_dir("unit_test_tag", str(tmp_path), "p1")

    def write_fn(tmp):
        os.makedirs(tmp, exist_ok=True)
        (tmp_path / "touched").write_text("x")

    staging.write_staged(final, write_fn)
    assert "unit_test_tag" in staging.BUILD_SECONDS
    assert staging.BUILD_SECONDS["unit_test_tag"] >= 0.0
    # warm hit adds nothing
    before = dict(staging.BUILD_SECONDS)
    staging.write_staged(final, write_fn)
    assert staging.BUILD_SECONDS == before
