"""Round-6 additions: distributed exact-ntile RFM scoring, the
single-pass watermark grid, and the IVF staleness readout
(ann_ivf_stale_recall)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# attach_exact_ntile: per-row quintile labels == SQL ntile()
# ---------------------------------------------------------------------------


def test_attach_exact_ntile_matches_window_ntile(spark):
    """The distributed count-below scorer must agree row-for-row with
    ntile() over a global window (the semantics it replaces), on a
    frame with heavy ties and a non-multiple-of-k row count."""
    from pyspark.sql.window import Window

    from vector_graph_native_database__spark.operators.profiling import (
        attach_exact_ntile,
    )

    df = spark.range(103).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("v")
    )
    got = {
        (r.k, r.b)
        for r in attach_exact_ntile(df, "v", "k", 5, "b").collect()
    }
    want = {
        (r.k, r.b)
        for r in df.select(
            "k",
            F.ntile(5)
            .over(Window.orderBy(F.asc("v"), F.asc("k")))
            .alias("b"),
        ).collect()
    }
    assert got == want


def test_attach_exact_ntile_descending_via_negation(spark):
    from pyspark.sql.window import Window

    from vector_graph_native_database__spark.operators.profiling import (
        attach_exact_ntile,
    )

    df = spark.range(40).select(
        F.col("id").alias("k"), (F.col("id") % 11).alias("v")
    )
    got = {
        (r.k, r.b)
        for r in attach_exact_ntile(
            df.withColumn("nv", -F.col("v")), "nv", "k", 4, "b"
        ).collect()
    }
    want = {
        (r.k, r.b)
        for r in df.select(
            "k",
            F.ntile(4)
            .over(Window.orderBy(F.desc("v"), F.asc("k")))
            .alias("b"),
        ).collect()
    }
    assert got == want


# ---------------------------------------------------------------------------
# IVF staleness readout
# ---------------------------------------------------------------------------


def test_stale_recall_within_epsilon_of_retrained(spark):
    """The staleness readout's contract: a quantizer frozen on the
    initial two-thirds serves the appended corpus within eps=0.25
    recall of a full retrain (at this scale/config the two are
    statistically interchangeable — the readout exists to DETECT when
    they stop being so), and both states keep the structural
    invariants (<=k*|Q| pairs, recall in [0,1], nn_hits <= |Q|)."""
    from vector_graph_native_database__spark import registry

    rows = {
        r.index_state: r
        for r in registry.all_queries()["ann_ivf_stale_recall"](
            spark, SF
        ).collect()
    }
    assert set(rows) == {"stale", "fresh"}
    for r in rows.values():
        assert 0 <= r.recall_at_k <= 1
        assert r.n_pairs <= 25 and r.nn_hits <= 5
        assert r.n_hits <= r.n_pairs
    assert abs(rows["stale"].recall_at_k - rows["fresh"].recall_at_k) <= 0.25


def test_ivf_topk_train_subset_changes_only_quantizer(spark):
    """Training on a subset must still assign/serve the FULL corpus:
    every query returns k rows drawn from anywhere in the corpus, and
    train=emb reproduces the default exactly."""
    from vector_graph_native_database__spark.operators import ann
    from vector_graph_native_database__spark.registry import pipelineq

    _, emb, _ = pipelineq.model(spark, SF)
    default = ann.ivf_topk(
        emb, pipelineq.ANN_QUERY_IDS, k=5, n_centroids=8, iters=2,
        nprobe=2, dim=64, round_scores=6,
    ).collect()
    explicit = ann.ivf_topk(
        emb, pipelineq.ANN_QUERY_IDS, k=5, n_centroids=8, iters=2,
        nprobe=2, dim=64, round_scores=6, train=emb,
    ).collect()
    assert sorted(map(tuple, default)) == sorted(map(tuple, explicit))


def test_filtered_sweep_recall_monotone_in_nprobe(spark):
    """Aligned probe sets: probing more cells only adds candidates,
    so filtered recall is nondecreasing in nprobe and reaches 1.0 at
    nprobe = n_centroids (every cell probed = exact filtered scan)."""
    from vector_graph_native_database__spark import registry

    rows = sorted(
        registry.all_queries()["ann_filtered_nprobe_sweep"](
            spark, SF
        ).collect(),
        key=lambda r: r.nprobe,
    )
    recalls = [r.recall_at_k for r in rows]
    assert recalls == sorted(recalls)
    assert rows[-1].nprobe == 8 and recalls[-1] == 1.0


def test_hard_negatives_are_cross_source(spark):
    """Every mined negative must come from a different source than
    its query, and per-query result sets carry exactly k dense ranks."""
    from vector_graph_native_database__spark import registry
    from vector_graph_native_database__spark.registry import pipelineq

    nodes, _, _ = pipelineq.model(spark, SF)
    src = {r.id: r.source for r in nodes.select("id", "source").collect()}
    out = registry.all_queries()["ann_hard_negatives"](spark, SF).collect()
    by_q = {}
    for r in out:
        assert src[r.id] != src[r.qid]
        by_q.setdefault(r.qid, []).append(r.rnk)
    for ranks in by_q.values():
        assert sorted(ranks) == [1, 2, 3, 4, 5]


def test_bm25_hard_negatives_cross_source_vs_positive(spark):
    """Each query's negatives must (a) exclude the rank-1 positive,
    (b) come from a different source than it, and (c) never outscore
    it."""
    from vector_graph_native_database__spark import registry
    from vector_graph_native_database__spark.registry import pipelineq
    from vector_graph_native_database__spark.registry.searchq import (
        BM25_MULTI_QUERIES,
    )
    from vector_graph_native_database__spark.operators import bm25

    nodes, _, _ = pipelineq.model(spark, SF)
    src = {r.id: r.source for r in nodes.select("id", "source").collect()}
    pool = bm25.bm25_topk_multi(
        nodes, BM25_MULTI_QUERIES, top_k=1, round_scores=6
    ).collect()
    positive = {r.qid: r for r in pool}
    out = registry.all_queries()["bm25_hard_negatives"](spark, SF).collect()
    assert out, "negatives must exist at sf0.001"
    for r in out:
        p = positive[r.qid]
        assert r.id != p.id
        assert src[r.id] != src[p.id]
        assert r.score <= p.score


def test_ivf_cell_stats_cover_corpus_and_skew_centers_on_one(spark):
    """Cells partition the corpus: counts sum to |emb|, fracs to ~1,
    and mean skew is 1 by construction."""
    from vector_graph_native_database__spark import registry
    from vector_graph_native_database__spark.registry import pipelineq

    _, emb, _ = pipelineq.model(spark, SF)
    n = emb.count()
    rows = registry.all_queries()["ann_ivf_cell_stats"](spark, SF).collect()
    assert sum(r.n_vectors for r in rows) == n
    assert abs(sum(r.frac for r in rows) - 1.0) < 1e-4
    assert abs(sum(r.skew for r in rows) / len(rows) - 1.0) < 1e-4


def test_power_analysis_consistent_with_ttest_split(spark):
    """Same split, same frame: arm sizes match the t-test entry, MDE
    is positive, and a 5%-lift detection needs at least the rows the
    current arms hold whenever the t-test is insignificant."""
    from vector_graph_native_database__spark import registry

    q = registry.all_queries()
    power = {r.event_type: r for r in q["events_power_analysis"](spark, SF).collect()}
    ttest = {r.event_type: r for r in q["events_ab_ttest"](spark, SF).collect()}
    assert set(power) == set(ttest)
    for et, p in power.items():
        t = ttest[et]
        assert (p.n_a, p.n_b) == (t.n_a, t.n_b)
        assert p.mde_abs > 0 and p.mde_rel > 0
        assert p.n_per_arm_5pct >= 1


def test_funnel_window_sweep_monotone_and_bounded(spark):
    """Wider windows only admit more conversions: both counts are
    nondecreasing in window_s, bounded by users_view, and purchase
    never exceeds click (staged funnel)."""
    from vector_graph_native_database__spark import registry

    rows = sorted(
        registry.all_queries()["events_funnel_window_sweep"](
            spark, SF
        ).collect(),
        key=lambda r: r.window_s,
    )
    clicks = [r.users_click_within for r in rows]
    purch = [r.users_purchase_within for r in rows]
    assert clicks == sorted(clicks) and purch == sorted(purch)
    for r in rows:
        assert r.users_purchase_within <= r.users_click_within <= r.users_view


def test_token_cost_report_consistent_with_cluster_assign(spark):
    """Per-source totals must reconcile with the corpus and the
    audited dropped set: sum(n_docs) = |docs|, kept <= total per
    source, and total dropped docs = cluster members with keep=0."""
    from vector_graph_native_database__spark import registry
    from vector_graph_native_database__spark.operators import curation
    from vector_graph_native_database__spark.registry import pipelineq

    nodes, _, _ = pipelineq.model(spark, SF)
    rows = registry.all_queries()["dedup_token_cost_by_source"](
        spark, SF
    ).collect()
    assert sum(r.n_docs for r in rows) == nodes.count()
    n_dropped = (
        curation.dedup_cluster_assign(nodes, threshold=0.8)
        .filter("keep = 0")
        .count()
    )
    assert sum(r.n_docs - r.n_docs_kept for r in rows) == n_dropped
    for r in rows:
        assert 0 <= r.frac_tokens_removed <= 1
        assert r.n_tokens_kept <= r.n_tokens


def test_commit_state_retention_window(spark, tmp_path):
    """keep_last retains exactly the newest N versions: time travel
    works across the retained window, older versions are vacuumed,
    orphans newer than the pointer never survive, and the default
    keeps (n-1, n) exactly as before."""
    import os

    from vector_graph_native_database__spark.streaming import ingest

    sd = str(tmp_path / "state")
    for i in range(5):
        df = spark.range(i + 1).selectExpr("id", f"{i} AS batch")
        ingest.commit_state(df, sd, keep_last=3)
    vs = ingest.list_state_versions(sd)
    assert vs == ["v000003", "v000004", "v000005"]
    # time travel across the full retained window
    assert ingest.read_state_version(spark, sd, "v000003").count() == 3
    assert ingest.read_state(spark, sd).count() == 5
    # an orphan newer than _CURRENT is cleaned by the next commit
    os.makedirs(os.path.join(sd, "v000099"))
    ingest.commit_state(spark.range(9), sd, keep_last=2)
    assert ingest.list_state_versions(sd) == ["v000005", "v000006"]
    assert not os.path.isdir(os.path.join(sd, "v000099"))


def test_grid_entries_empty_input_parity(spark, tmp_path):
    """The single-pass grid rewrites must return ZERO rows on an
    empty events frame — matching their oracles' grid CROSS JOIN
    semantics — not 4 NULL-count rows from the always-one-row global
    aggregate."""
    import os

    from vector_graph_native_database__spark import registry
    from vector_graph_native_database__spark.streaming.ingest import (
        EVENTS_SCHEMA,
    )

    empty_dir = str(tmp_path)
    spark.createDataFrame([], EVENTS_SCHEMA).write.mode(
        "overwrite"
    ).parquet(os.path.join(empty_dir, "events.parquet"))
    q = registry.all_queries()
    assert q["events_watermark_lateness"](spark, empty_dir).count() == 0
    assert q["events_funnel_window_sweep"](spark, empty_dir).count() == 0
