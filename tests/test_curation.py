"""Corpus-curation operators: clusters, decontamination, unigram LM,
centroids, kNN join, MMR rerank — semantics on synthetic fixtures."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from vector_graph_native_database__spark.operators import ann, curation


def test_dedup_cluster_assign_transitive(spark):
    # a≈b, b≈c (shared text), d distinct: one cluster {a,b,c}, keeper=min
    rows = [
        ("a", "alpha beta gamma delta epsilon zeta"),
        ("b", "alpha beta gamma delta epsilon zeta"),
        ("c", "alpha beta gamma delta epsilon zeta"),
        ("d", "one two three four five six seven eight"),
    ]
    df = spark.createDataFrame(rows, "id string, text string")
    got = {r["id"]: r for r in curation.dedup_cluster_assign(df).collect()}
    assert set(got) == {"a", "b", "c"}  # d is in no pair
    assert all(r["cluster"] == "a" for r in got.values())
    assert got["a"]["keep"] == 1
    assert got["b"]["keep"] == 0 and got["c"]["keep"] == 0


def test_decontaminate_flags_overlap_only(spark):
    # id 0 is eval (0 % 41 == 0); id 5 shares a 3-shingle with it,
    # id 7 shares nothing.
    rows = [
        ("0", "the quick brown fox jumps"),
        ("5", "lo the quick brown cat"),
        ("7", "completely different words here"),
    ]
    df = spark.createDataFrame(rows, "id string, text string")
    got = {r["id"]: r for r in curation.decontaminate(df, k=3).collect()}
    assert set(got) == {"5"}
    assert got["5"]["shared_shingles"] == 1  # "the quick brown"
    assert got["5"]["eval_docs"] == 1


def test_unigram_logprob_matches_hand_computation(spark):
    # corpus: "x x y" + "y z" → counts x=2, y=2, z=1, total=5
    df = spark.createDataFrame(
        [("1", "x x y"), ("2", "y z")], "id string, text string"
    )
    got = {r["id"]: r for r in curation.unigram_logprob(df).collect()}
    lp1 = (2 * math.log(2 / 5) + math.log(2 / 5)) / 3
    lp2 = (math.log(2 / 5) + math.log(1 / 5)) / 2
    assert got["1"]["n_tokens"] == 3
    assert abs(got["1"]["avg_logprob"] - lp1) < 1e-6
    assert abs(got["2"]["avg_logprob"] - lp2) < 1e-6


def test_centroids_by_group_elementwise_mean(spark):
    emb = spark.createDataFrame(
        [("1", [1.0, 3.0], 2), ("2", [3.0, 5.0], 2), ("3", [10.0, 20.0], 2)],
        "node_id string, vector array<double>, dim int",
    )
    labels = spark.createDataFrame(
        [("1", "en"), ("2", "en"), ("3", "fr")], "id string, lang string"
    )
    got = curation.centroids_by_group(emb, labels, dim=2).collect()
    vals = {(r["label"], r["idx"]): r["centroid"] for r in got}
    assert vals == {
        ("en", 0): 2.0,
        ("en", 1): 4.0,
        ("fr", 0): 10.0,
        ("fr", 1): 20.0,
    }


def _rand_emb(spark, n=30, dim=8, seed=7):
    import random

    rnd = random.Random(seed)
    rows = [
        (str(i), [rnd.uniform(-1, 1) for _ in range(dim)], dim)
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows, "node_id string, vector array<double>, dim int"
    )


def test_knn_join_ranks_within_bucket(spark):
    emb = _rand_emb(spark, dim=8)
    got = ann.knn_join_topk(emb, k=3, num_planes=2, dim=8).collect()
    assert got, "2 planes over 30 docs must yield bucket collisions"
    per = {}
    for r in got:
        assert r["id_a"] != r["id_b"]
        assert -1.000001 <= r["cos"] <= 1.000001
        per.setdefault(r["id_a"], []).append((r["rnk"], r["cos"]))
    for ranks in per.values():
        ranks.sort()
        assert [r for r, _ in ranks] == list(range(1, len(ranks) + 1))
        cs = [c for _, c in ranks]
        assert cs == sorted(cs, reverse=True)  # rank order follows score


def test_multiprobe_recall_strictly_above_single_probe(spark):
    """VERDICT r2 item 3: on the sf0.001 fixture the Hamming-1
    multi-probe variants must recover strictly more true cosine
    neighbors than their single-probe twins (the candidate set is a
    strict superset, so recall is monotone; this pins that it's
    strictly higher here, not vacuously equal)."""
    from vector_graph_native_database__spark.sources import embeddings_df

    emb = embeddings_df(spark, "/root/testdata/sf0.001")
    ids = ["0", "100", "200", "300", "400"]

    def topk_recall(approx_rows, exact_rows, qkey, nkey):
        ex: dict = {}
        for r in exact_rows:
            ex.setdefault(r[qkey], set()).add(r[nkey])
        ap: dict = {}
        for r in approx_rows:
            ap.setdefault(r[qkey], set()).add(r[nkey])
        return sum(len(ex[q] & ap.get(q, set())) for q in ex)

    exact = ann.brute_topk(emb, ids, k=5, round_scores=6).collect()
    single = ann.lsh_bucketed_topk(
        emb, ids, k=5, num_planes=8, dim=64, round_scores=6
    ).collect()
    multi = ann.lsh_multiprobe_topk(
        emb, ids, k=5, num_planes=8, dim=64, round_scores=6
    ).collect()
    r_single = topk_recall(single, exact, "qid", "id")
    r_multi = topk_recall(multi, exact, "qid", "id")
    assert r_multi > r_single, (r_multi, r_single)

    all_ids = [r["node_id"] for r in emb.select("node_id").collect()]
    exact_all = ann.brute_topk(emb, all_ids, k=3, round_scores=6).collect()
    kj_single = ann.knn_join_topk(emb, k=3, num_planes=8, dim=64).collect()
    kj_multi = ann.knn_join_multiprobe(
        emb, k=3, num_planes=8, dim=64
    ).collect()
    exact_pairs = [
        {"id_a": r["qid"], "id_b": r["id"]} for r in exact_all
    ]
    rj_single = topk_recall(kj_single, exact_pairs, "id_a", "id_b")
    rj_multi = topk_recall(kj_multi, exact_pairs, "id_a", "id_b")
    assert rj_multi > rj_single, (rj_multi, rj_single)


def test_mmr_first_pick_is_most_relevant_and_diversifies(spark):
    emb = _rand_emb(spark, n=25, dim=8)
    got = ann.mmr_rerank(emb, ["0"], n_candidates=10, k=4).collect()
    assert len(got) == 4
    picks = sorted(got, key=lambda r: r["pick"])
    assert [r["pick"] for r in picks] == [1, 2, 3, 4]
    assert len({r["id"] for r in picks}) == 4  # no repeats
    # pick 1 must be the argmax of rounded relevance
    top1 = ann.brute_topk(emb, ["0"], k=1).collect()[0]
    assert picks[0]["id"] == top1["id"]
    # mmr scores are non-increasing in pick order for a fixed query
    # (greedy over a shrinking candidate set with growing penalty)
    scores = [r["mmr"] for r in picks]
    assert all(a >= b - 1e-9 for a, b in zip(scores, scores[1:]))


def test_funnel_stage_ordering(spark, sf_dir):
    from vector_graph_native_database__spark.registry.olapq import (
        q_events_funnel,
    )

    row = q_events_funnel(spark, sf_dir).collect()[0]
    # stage counts can only narrow, and some users reach each stage
    # in the harness corpus
    assert (
        row["users_view"]
        >= row["users_click_after_view"]
        >= row["users_purchase_after_click"]
        >= 0
    )
    assert row["users_view"] > 0


def test_cohort_retention_offsets_nonnegative(spark, sf_dir):
    from vector_graph_native_database__spark.registry.olapq import (
        q_events_cohort_retention,
    )

    rows = q_events_cohort_retention(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["week_offset"] >= 0
        assert r["users"] > 0
    # offset-0 cell of a cohort counts every user of that cohort, so
    # it dominates any later offset of the same cohort
    by_cohort = {}
    for r in rows:
        by_cohort.setdefault(r["cohort_week"], {})[r["week_offset"]] = r["users"]
    for cells in by_cohort.values():
        assert 0 in cells
        assert cells[0] == max(cells.values())


def test_pmi_bigrams_scores_collocation_highest(spark):
    from vector_graph_native_database__spark.operators.text_analysis import (
        pmi_bigrams,
    )

    # "aa bb" always adjacent (perfect collocation); "cc" floods the
    # unigram mass so independent pairs score near/below zero.
    docs = [(str(i), "aa bb " + "cc " * 8) for i in range(6)]
    df = spark.createDataFrame(docs, "id string, text string")
    got = pmi_bigrams(df, min_count=5, k=10).collect()
    assert got
    top = got[0]
    assert (top["a"], top["b"]) == ("aa", "bb")
    # PMI(aa,bb) = ln(c_ab·N/(c_a·c_b)) = ln(6·60/36) = ln(10)
    import math

    assert abs(top["pmi"] - math.log(10)) < 1e-6


def test_keep_best_per_cluster_picks_argmax(spark):
    clusters = spark.createDataFrame(
        [("a", "a", 1), ("b", "a", 0), ("c", "c", 1), ("d", "c", 0)],
        "id string, cluster string, keep int",
    )
    quality = spark.createDataFrame(
        [("a", 0.2), ("b", 0.9), ("c", 0.5), ("d", 0.5)],
        "id string, quality double",
    )
    got = {
        r["cluster"]: r
        for r in curation.keep_best_per_cluster(clusters, quality).collect()
    }
    assert got["a"]["best_id"] == "b"  # highest quality wins
    assert got["a"]["best_quality"] == 0.9
    assert got["a"]["n_members"] == 2
    assert got["c"]["best_id"] == "c"  # tie → min id


def test_neighbor_embedding_agg_weighted_mean(spark):
    from vector_graph_native_database__spark.operators.analytics import (
        neighbor_embedding_agg,
    )

    edges = spark.createDataFrame(
        [("e1", "u", "v", "t", 1.0), ("e2", "u", "w", "t", 3.0)],
        "id string, src string, dst string, type string, weight double",
    )
    emb = spark.createDataFrame(
        [("v", [2.0, 0.0], 2), ("w", [6.0, 4.0], 2)],
        "node_id string, vector array<double>, dim int",
    )
    got = {
        (r["id"], r["idx"]): r["nvec"]
        for r in neighbor_embedding_agg(edges, emb, dim=2).collect()
    }
    # (1*2 + 3*6)/4 = 5.0 ; (1*0 + 3*4)/4 = 3.0
    assert got == {("u", 0): 5.0, ("u", 1): 3.0}


def test_token_entropy_extremes(spark):
    from vector_graph_native_database__spark.operators.text_analysis import (
        token_entropy,
    )

    df = spark.createDataFrame(
        [("rep", "spam spam spam spam"), ("div", "a b c d")],
        "id string, text string",
    )
    got = {r["id"]: r for r in token_entropy(df).collect()}
    assert got["rep"]["entropy"] == 0.0  # degenerate distribution
    assert abs(got["div"]["entropy"] - math.log(4)) < 1e-6  # uniform
    assert got["div"]["n_tokens"] == 4


def test_anomaly_zscore_flags_only_extremes(spark, sf_dir):
    from vector_graph_native_database__spark.registry.olapq import (
        q_events_anomaly_zscore,
    )

    rows = q_events_anomaly_zscore(spark, sf_dir).collect()
    assert rows  # the harness value distribution has ≥3σ tails
    assert all(abs(r["z"]) >= 3 for r in rows)


def test_curation_pipeline_summary_funnel_narrows(spark, sf_dir):
    from vector_graph_native_database__spark.registry.curationq import (
        q_curation_pipeline_summary,
    )

    row = q_curation_pipeline_summary(spark, sf_dir).collect()[0]
    assert row["n_raw"] > 0
    assert row["n_quality"] <= row["n_raw"]
    assert row["n_final"] <= row["n_quality"]
    # every final doc lands in some bin; bins ≤ docs
    assert 0 < row["n_bins"] <= row["n_final"] or row["n_final"] == 0
