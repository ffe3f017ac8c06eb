"""Dedup / ANN / text-analysis semantics on synthetic fixtures."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vector_graph_native_database__spark.operators import (
    ann,
    dedup,
    text_analysis,
)

DOCS = [
    ("d1", "the quick brown fox jumps over the lazy dog every day"),
    ("d2", "the quick brown fox jumps over the lazy dog every day"),  # exact dup
    ("d3", "the quick brown fox jumps over the lazy cat every day"),  # near dup
    ("d4", "completely different content about spark dataframes"),
    ("d5", ""),
]


def _docs(spark):
    return spark.createDataFrame(DOCS, "id string, text string")


def test_exact_dedup(spark):
    got = dedup.exact_dedup_groups(_docs(spark)).collect()
    assert len(got) == 1
    assert got[0]["cnt"] == 2 and got[0]["keeper_id"] == "d1"


def test_minhash_lsh_finds_near_dups(spark):
    # rows_per_band=1 → candidate on ANY shared minhash; the engine
    # default (4×3) is tuned for the ≥0.8-jaccard regime, while d1/d3
    # sit at 0.67 where banded recall is probabilistic by design.
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.minhash_lsh_dedup(
            _docs(spark), threshold=0.5, rows_per_band=1
        ).collect()
    }
    assert ("d1", "d2") in pairs and pairs[("d1", "d2")] == 1.0
    assert ("d1", "d3") in pairs and 0.5 <= pairs[("d1", "d3")] < 1.0
    assert not any("d4" in p for p in pairs)


def test_ngram_jaccard_pairs(spark):
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(
            _docs(spark), k=3, threshold=0.5
        ).collect()
    }
    assert pairs[("d1", "d2")] == 1.0
    assert ("d1", "d3") in pairs


def test_simhash_identical_docs_match(spark):
    sim = dedup.simhash_values(_docs(spark))
    vals = {r["id"]: r["simhash"] for r in sim.collect()}
    assert vals["d1"] == vals["d2"]
    assert vals["d5"] == 0
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in dedup.simhash_near_pairs(sim, max_hamming=3).collect()
    }
    assert pairs[("d1", "d2")] == 0


def test_simhash_pigeonhole_guarantee(spark):
    """hamming ≤ 3 with 4 chunks ⇒ a shared 15-bit chunk ⇒ always a
    candidate; a hash differing in every chunk is never one."""
    h = 0b101010101010101010101010101010101010101010101010101010101010
    near = h ^ 0b111  # 3 low bits flipped: chunks 1-3 still equal
    far = h ^ ((1 << 0) | (1 << 15) | (1 << 30) | (1 << 45))
    sim = spark.createDataFrame(
        [("a", h), ("b", near), ("c", far)], "id string, simhash long"
    )
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in dedup.simhash_near_pairs(sim, max_hamming=3).collect()
    }
    assert pairs == {("a", "b"): 3}


def test_embedding_cosine_pairs(spark):
    emb = spark.createDataFrame(
        [
            ("a", [1.0, 0.0], 2),
            ("b", [0.999, 0.01], 2),
            ("c", [0.0, 1.0], 2),
        ],
        "node_id string, vector array<float>, dim int",
    )
    got = {
        (r["id_a"], r["id_b"])
        for r in dedup.embedding_cosine_pairs(emb, threshold=0.95).collect()
    }
    assert got == {("a", "b")}


def test_ann_brute_topk(spark):
    emb = spark.createDataFrame(
        [
            ("q", [1.0, 0.0], 2),
            ("n1", [0.9, 0.1], 2),
            ("n2", [0.5, 0.5], 2),
            ("n3", [0.0, 1.0], 2),
        ],
        "node_id string, vector array<float>, dim int",
    )
    got = ann.brute_topk(emb, ["q"], k=2).collect()
    assert [(r["id"], r["rnk"]) for r in got] == [("n1", 1), ("n2", 2)]


def test_ann_lsh_bucket_recall_of_identical(spark):
    """An identical vector always lands in the query's bucket."""
    emb = spark.createDataFrame(
        [
            ("q", [1.0] * 64, 64),
            ("twin", [1.0] * 64, 64),
            ("anti", [-1.0] * 64, 64),
        ],
        "node_id string, vector array<float>, dim int",
    )
    got = ann.lsh_bucketed_topk(emb, ["q"], k=5).collect()
    ids = [r["id"] for r in got]
    assert "twin" in ids and "anti" not in ids


def test_mllib_lsh_recall_vs_brute(spark):
    """MLlib BRP-LSH top-k against exact Euclidean ground truth on
    the sf0.001 fixture: the true NN must be contained (at rank 1,
    since MLlib ranks candidates by exact distance) and recall@5 must
    clear 0.8 — the invariant the ann_mllib_lsh_topk oracle asserts."""
    from vector_graph_native_database__spark.sources import embeddings_df

    emb = embeddings_df(spark, "/root/testdata/sf0.001")
    ids = ["0", "100", "200", "300", "400"]
    ml = ann.mllib_lsh_topk(emb, ids, k=5, dim=64).collect()
    ex = ann.brute_topk_euclidean(emb, ids, k=5).collect()
    ml_by_q: dict = {}
    for r in ml:
        ml_by_q.setdefault(r["qid"], set()).add(r["id"])
    hits = total = 0
    for qid in ids:
        truth = sorted(
            (r for r in ex if r["qid"] == qid), key=lambda r: r["rnk"]
        )
        got = ml_by_q[qid]
        assert truth[0]["id"] in got, f"true NN missing for qid={qid}"
        ml_top1 = min(
            (r for r in ml if r["qid"] == qid), key=lambda r: r["rnk"]
        )
        assert ml_top1["id"] == truth[0]["id"]
        hits += sum(1 for r in truth if r["id"] in got)
        total += len(truth)
    assert hits / total >= 0.8, f"recall@5 {hits}/{total} below 0.8"


def test_lang_id(spark):
    df = spark.createDataFrame(
        [
            ("e", "the house of cards and a dream to win"),
            ("f", "le chat et les chiens de la maison"),
            ("g", "der hund und die katze das haus zu hause"),
            ("x", "xyzzy plugh"),
        ],
        "id string, text string",
    )
    got = {r["id"]: r["guessed_lang"] for r in text_analysis.lang_id(df).collect()}
    assert got == {"e": "en", "f": "fr", "g": "de", "x": "und"}


def test_quality_score_bounds_and_empty(spark):
    got = {
        r["id"]: r for r in text_analysis.quality_score(_docs(spark)).collect()
    }
    assert got["d5"]["quality"] == 0.0 and got["d5"]["n_tokens"] == 0
    for r in got.values():
        assert 0.0 <= r["quality"] <= 1.0


def test_token_counts(spark):
    df = spark.createDataFrame(
        [("a", "hello world, it's 42 degrees!")], "id string, text string"
    )
    row = text_analysis.token_counts(df).collect()[0]
    assert row["ws_tokens"] == 5
    # hello|world|,|it|'|s|42|degrees|! → 9 subword tokens
    assert row["subword_tokens"] == 9
    assert row["n_chars"] == 29


def test_doc_fingerprint_dups_match(spark):
    got = {
        r["id"]: r for r in text_analysis.doc_fingerprint(_docs(spark)).collect()
    }
    assert got["d1"]["fingerprint"] == got["d2"]["fingerprint"]
    assert got["d5"]["fingerprint"] == -1 and got["d5"]["n_shingles"] == 0


def test_ivf_topk_finds_cluster_neighbors(spark):
    import random

    from vector_graph_native_database__spark.operators.ann import ivf_topk

    rnd = random.Random(7)
    rows = []
    # two well-separated clusters in 64-d: ids 0-19 near +e0, 20-39 near +e1
    for i in range(40):
        base = [0.0] * 64
        base[0 if i < 20 else 1] = 10.0
        vec = [v + rnd.uniform(-0.5, 0.5) for v in base]
        rows.append((str(i), vec, 64))
    emb = spark.createDataFrame(
        rows, "node_id string, vector array<float>, dim int"
    )
    got = ivf_topk(
        emb, ["0", "25"], k=5, n_centroids=2, iters=2, nprobe=1, dim=64
    ).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["qid"], []).append(int(r["id"]))
    assert all(n < 20 for n in by_q["0"]), by_q
    assert all(n >= 20 for n in by_q["25"]), by_q
    assert len(by_q["0"]) == 5 and len(by_q["25"]) == 5


def test_state_roundtrip_and_partition_pruning(spark, sf_dir):
    import shutil
    import tempfile

    from vector_graph_native_database__spark.plans import plan_string
    from vector_graph_native_database__spark.sources import (
        edges_df,
        embeddings_df,
        load_state,
        nodes_df,
        save_state,
    )

    tmp = tempfile.mkdtemp(prefix="vgs-state-")
    try:
        n, e, g = (
            nodes_df(spark, sf_dir),
            embeddings_df(spark, sf_dir),
            edges_df(spark, sf_dir),
        )
        save_state(tmp, n, e, g, coalesce_small=1)
        n2, e2, g2 = load_state(spark, tmp)
        assert n2.count() == n.count()
        assert e2.count() == e.count()
        assert sorted(g2.columns) == sorted(g.columns)
        assert g2.count() == g.count()
        # the traversal's type filter becomes partition pruning
        from pyspark.sql import functions as F

        p = plan_string(g2.filter(F.col("type") == "cites"))
        assert "cites" in p
        pruned = g2.filter(F.col("type") == "cites").count()
        direct = g.filter(F.col("type") == "cites").count()
        assert pruned == direct
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_csv_json_ingest(spark):
    import shutil
    import tempfile

    from vector_graph_native_database__spark.sources import (
        nodes_from_csv,
        nodes_from_json,
        nodes_from_orc,
    )

    tmp = tempfile.mkdtemp(prefix="vgs-ingest-")
    try:
        src = spark.createDataFrame(
            [("1", "hello world", "en"), ("2", "bonjour", "fr")],
            "id string, text string, lang string",
        )
        src.write.option("header", "true").mode("overwrite").csv(f"{tmp}/c")
        src.write.mode("overwrite").json(f"{tmp}/j")
        src.write.mode("overwrite").orc(f"{tmp}/o")
        for loader, path in (
            (nodes_from_csv, f"{tmp}/c"),
            (nodes_from_json, f"{tmp}/j"),
            (nodes_from_orc, f"{tmp}/o"),
        ):
            got = {
                r["id"]: (r["text"], dict(r["metadata"]))
                for r in loader(
                    spark, path, metadata_cols=["lang"]
                ).collect()
            }
            assert got == {
                "1": ("hello world", {"lang": "en"}),
                "2": ("bonjour", {"lang": "fr"}),
            }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_mllib_lsh_topk_overlaps_brute_force(spark):
    import random

    from vector_graph_native_database__spark.operators.ann import (
        brute_topk,
        mllib_lsh_topk,
    )

    rnd = random.Random(11)
    rows = [
        (str(i), [rnd.uniform(-1, 1) for _ in range(64)], 64)
        for i in range(80)
    ]
    emb = spark.createDataFrame(
        rows, "node_id string, vector array<float>, dim int"
    )
    got = mllib_lsh_topk(emb, ["0"], k=5, dim=64)
    rows_got = got.collect()
    assert {r["qid"] for r in rows_got} == {"0"}
    assert len(rows_got) == 5
    assert [r["rnk"] for r in sorted(rows_got, key=lambda r: r["rnk"])] == [
        1, 2, 3, 4, 5,
    ]
    # approxNearestNeighbors with unit bucket scale should recover a
    # decent share of the true (euclidean ~ cosine-on-random) top-5
    brute = {
        r["id"] for r in brute_topk(emb, ["0"], k=5).collect()
    }
    overlap = brute & {r["id"] for r in rows_got}
    assert len(overlap) >= 1


def test_concurrent_queries_share_session(spark, sf_dir):
    """Four different operator families run concurrently on one
    SparkSession (the serving pattern: FAIR-ish scheduling of
    independent jobs) and all return their expected results."""
    from concurrent.futures import ThreadPoolExecutor

    from vector_graph_native_database__spark import registry

    qs = registry.all_queries()
    names = ["vector_topk", "graph_bfs", "stats_counts", "text_token_count"]

    def run(name):
        return name, qs[name](spark, sf_dir).count()

    with ThreadPoolExecutor(max_workers=4) as pool:
        got = dict(pool.map(run, names))
    assert got["vector_topk"] == 10
    assert got["stats_counts"] == 1
    assert got["graph_bfs"] > 0 and got["text_token_count"] > 0


def test_sql_frontend(spark, sf_dir):
    """Free capability the reference lacks: ANSI SQL over the model
    views, optimized by Catalyst like any DataFrame plan."""
    from vector_graph_native_database__spark.sql import register_views, sql

    names = register_views(spark, sf_dir)
    assert {"nodes", "embeddings", "edges"} <= set(names)
    got = sql(
        spark,
        sf_dir,
        """
        SELECT n.lang, count(*) AS n_docs,
               count(e.node_id) AS n_embedded
        FROM nodes n LEFT JOIN embeddings e ON e.node_id = n.id
        GROUP BY n.lang ORDER BY n_docs DESC
        """,
    ).collect()
    assert sum(r["n_docs"] for r in got) == spark.table("nodes").count()
    top3 = sql(
        spark,
        sf_dir,
        """
        WITH deg AS (
          SELECT src AS id, count(*) AS out_deg FROM edges GROUP BY src
        ), ranked AS (
          SELECT id, out_deg,
                 rank() OVER (ORDER BY out_deg DESC, id) AS rnk
          FROM deg
        )
        SELECT * FROM ranked WHERE rnk <= 3
        """,
    ).collect()
    assert len(top3) == 3 and top3[0]["out_deg"] >= top3[-1]["out_deg"]


def test_asof_join_semantics(spark):
    from vector_graph_native_database__spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [("e1", 1, 100), ("e2", 1, 200), ("e3", 2, 50)],
        "event_id string, user_id int, ts long",
    )
    right = spark.createDataFrame(
        [(1, 100, 10.0), (1, 150, 20.0), (2, 60, 99.0)],
        "user_id int, ts long, value double",
    )
    # default <=: e1 ties with right@100 -> matched; e3 has no prior
    got = {
        r["event_id"]: (r["asof_value"], r["asof_ts"])
        for r in asof_join(left, right, ts="ts", by="user_id").collect()
    }
    assert got["e1"] == (10.0, 100)
    assert got["e2"] == (20.0, 150)
    assert got["e3"] == (None, None)
    # strict <: the tie no longer matches
    strict = {
        r["event_id"]: r["asof_value"]
        for r in asof_join(
            left, right, ts="ts", by="user_id", strict=True
        ).collect()
    }
    assert strict["e1"] is None and strict["e2"] == 20.0


def test_pq_topk_finds_cluster_members(spark):
    # 8 well-separated clusters of 5 near-identical vectors: cluster
    # members quantize to identical PQ codes, so the query's own
    # cluster must fill the top-k (ties broken by id)
    import random

    from vector_graph_native_database__spark.operators.ann import pq_topk

    rnd = random.Random(7)
    rows = []
    for g in range(8):
        center = [rnd.uniform(-1, 1) for _ in range(64)]
        for j in range(5):
            rows.append(
                (
                    str(g * 10 + j),
                    [x + rnd.uniform(-0.01, 0.01) for x in center],
                    64,
                )
            )
    emb = spark.createDataFrame(
        rows, "node_id string, vector array<float>, dim int"
    )
    got = pq_topk(emb, ["0"], k=4, m=4, ksub=8, iters=2)
    assert {r["id"] for r in got.collect()} == {"1", "2", "3", "4"}


def test_asof_join_duplicate_ts_pick_is_deterministic(spark):
    # two right rows share (user_id, ts): the window tiebreak must
    # pick the same one regardless of input order / partitioning
    from vector_graph_native_database__spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [("e1", 1, 200)], "event_id string, user_id int, ts long"
    )
    dup_rows = [(1, 100, 10.0), (1, 100, 20.0), (1, 100, 15.0)]
    picks = set()
    for perm in (dup_rows, dup_rows[::-1], dup_rows[1:] + dup_rows[:1]):
        right = spark.createDataFrame(
            perm, "user_id int, ts long, value double"
        ).repartition(3)
        got = asof_join(left, right, ts="ts", by="user_id").collect()
        picks.add(got[0]["asof_value"])
    assert len(picks) == 1, f"nondeterministic duplicate-ts pick: {picks}"


def test_range_join_binned_boundaries(spark):
    from vector_graph_native_database__spark.operators.asof import (
        range_join_binned,
    )

    points = spark.createDataFrame(
        [("p1", 0), ("p2", 3599), ("p3", 3600), ("p4", 7200)],
        "pid string, ts long",
    )
    intervals = spark.createDataFrame(
        [("i1", 0, 3600), ("i2", 3600, 7200)],
        "iid string, start long, end long",
    )
    got = {
        (r["iid"], r["pid"])
        for r in range_join_binned(points, intervals).collect()
    }
    # half-open [start, end): 3600 belongs to i2 only; 7200 to neither
    assert got == {("i1", "p1"), ("i1", "p2"), ("i2", "p3")}


def test_ann_int8_recall_vs_exact(spark, sf_dir):
    from vector_graph_native_database__spark.sources import embeddings_df

    emb = embeddings_df(spark, sf_dir)
    qids = ["0", "10"]
    exact = {
        (r["qid"], r["id"])
        for r in ann.brute_topk(emb, qids, k=10, round_scores=6).collect()
    }
    quant = {
        (r["qid"], r["id"])
        for r in ann.brute_topk_int8(emb, qids, k=10).collect()
    }
    # int8 quantization error is ~0.4% of scale per component; top-10
    # membership should survive nearly intact
    recall = len(exact & quant) / len(exact)
    assert recall >= 0.8, f"recall {recall}"


def test_multiprobe_dedup_pairs_superset_of_single_probe(spark):
    """The Hamming-1 probe set is a strict candidate superset, so the
    multi-probe pair output must contain every single-probe pair and
    (on this fixture: 2 vs 10 of the 66 exact pairs) strictly more,
    while staying a subset of the exact all-pairs output."""
    from vector_graph_native_database__spark.sources import embeddings_df

    emb = embeddings_df(spark, "/root/testdata/sf0.001")
    single = {
        (r["id_a"], r["id_b"])
        for r in dedup.embedding_cosine_pairs_lsh(emb, threshold=0.4).collect()
    }
    multi = {
        (r["id_a"], r["id_b"])
        for r in dedup.embedding_cosine_pairs_multiprobe(
            emb, threshold=0.4
        ).collect()
    }
    exact = {
        (r["id_a"], r["id_b"])
        for r in dedup.embedding_cosine_pairs(emb, threshold=0.4).collect()
    }
    assert single <= multi, "multi-probe must contain every single-probe pair"
    assert len(multi) > len(single), (len(multi), len(single))
    assert multi <= exact, "approximate pairs must be exact-verified pairs"


def test_ivfpq_topk_finds_cluster_neighbors(spark):
    """Two well-separated clusters: IVF-PQ's probed-cell + ADC path
    must return same-cluster neighbors for a query from each cluster
    (codes are lossy but inter-cluster distance dwarfs quantization
    error). nprobe=2 so each query covers its whole cluster even when
    the 4-cell coarse quantizer splits a cluster in two — with
    nprobe=1 the probed cell can legitimately hold <k candidates (the
    documented pruned-ANN trade)."""
    import random

    rnd = random.Random(11)
    rows = []
    for i in range(40):
        base = [0.0] * 64
        base[0 if i < 20 else 1] = 10.0
        vec = [v + rnd.uniform(-0.5, 0.5) for v in base]
        rows.append((str(i), vec, 64))
    emb = spark.createDataFrame(
        rows, "node_id string, vector array<float>, dim int"
    )
    got = ann.ivfpq_topk(
        emb, ["0", "25"], k=5, n_centroids=4, iters=2, nprobe=2,
        m=4, ksub=8,
    ).collect()
    by_q: dict = {}
    for r in got:
        by_q.setdefault(r["qid"], []).append(int(r["id"]))
    assert all(n < 20 for n in by_q["0"]), by_q["0"]
    assert all(n >= 20 for n in by_q["25"]), by_q["25"]
    assert len(by_q["0"]) == 5 and len(by_q["25"]) == 5
