"""Vector / hybrid / BM25 semantics on the reference's micro-fixtures.

Re-expresses TC-VEC-01/02/03 and TC-HYB-01/02
(``/root/reference/test_final.py:388-496,632-796``) as DataFrame
tests, plus an independent pure-Python Okapi BM25 cross-check (the
public rank_bm25 formula with k1=1.5, b=0.75, epsilon=0.25).
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from vector_graph_native_database__spark.functions.textfn import embed_hash_df
from vector_graph_native_database__spark.operators.bm25 import bm25_scores
from vector_graph_native_database__spark.operators.hybrid import hybrid_search
from vector_graph_native_database__spark.operators.vector_search import (
    vector_topk,
)

VEC_TRIO = [
    (
        "A",
        "Convolutional neural networks for deep learning image "
        "classification tasks",
    ),
    (
        "B",
        "Deep learning methods for audio classification and speech "
        "processing",
    ),
    ("C", "Classical music orchestras and symphonies"),
]
QUERY = "deep learning image classification convolutional neural networks"


def _nodes(spark, rows, meta=None):
    data = [
        (i, t, {} if meta is None else meta.get(i, {})) for i, t in rows
    ]
    return spark.createDataFrame(
        data, "id string, text string, metadata map<string,string>"
    )


def _embed(spark, rows):
    """Hash-embed (id, text) rows → embeddings frame."""
    df = spark.createDataFrame(rows, "id string, text string")
    return embed_hash_df(df).select(
        F.col("id").alias("node_id"), "vector", "dim"
    )


def _query_frame(spark, text):
    return embed_hash_df(
        spark.createDataFrame([("q", text)], "id string, text string")
    ).select(F.col("vector").alias("qvec"))


def test_vec_trio_ordering(spark):
    """TC-VEC-01: similarity ranks A > B > C; A's score ≥ 0.5."""
    nodes = _nodes(spark, VEC_TRIO)
    emb = _embed(spark, VEC_TRIO)
    res = vector_topk(nodes, emb, _query_frame(spark, QUERY), top_k=3).collect()
    assert [r["id"] for r in res] == ["A", "B", "C"]
    assert res[0]["score"] >= 0.5


def test_topk_exceeds_corpus(spark):
    """TC-VEC-02: top_k > corpus returns exactly the embedded set."""
    nodes = _nodes(spark, VEC_TRIO + [("D", "no embedding here")])
    emb = _embed(spark, VEC_TRIO)
    res = vector_topk(nodes, emb, _query_frame(spark, QUERY), top_k=100)
    assert res.count() == 3


def test_metadata_filter_topk(spark):
    """TC-VEC-03: metadata filter excludes non-matching nodes."""
    meta = {
        "A": {"type": "note"},
        "B": {"type": "note"},
        "C": {"type": "paper"},
    }
    nodes = _nodes(spark, VEC_TRIO, meta)
    emb = _embed(spark, VEC_TRIO)
    res = vector_topk(
        nodes,
        emb,
        _query_frame(spark, QUERY),
        top_k=10,
        meta_filter={"type": "note"},
    ).collect()
    assert {r["id"] for r in res} == {"A", "B"}


def test_dim_mismatch_skipped(spark):
    """Embeddings whose dim ≠ query dim are skipped (app.py:407-408)."""
    nodes = _nodes(spark, [("A", "a"), ("B", "b")])
    emb = spark.createDataFrame(
        [("A", [1.0, 0.0], 2), ("B", [1.0, 0.0, 0.0], 3)],
        "node_id string, vector array<float>, dim int",
    )
    q = spark.createDataFrame([([1.0, 0.0],)], "qvec array<float>")
    res = vector_topk(nodes, emb, q, top_k=10).collect()
    assert [r["id"] for r in res] == ["A"]


def test_manual_vector_unnormalized(spark):
    """SURVEY §4.8.2: manual vectors stored as-given, raw-dot scored."""
    nodes = _nodes(spark, [("A", "a"), ("B", "b")])
    emb = spark.createDataFrame(
        [("A", [3.0, 0.0], 2), ("B", [0.5, 0.0], 2)],
        "node_id string, vector array<float>, dim int",
    )
    q = spark.createDataFrame([([1.0, 0.0],)], "qvec array<float>")
    res = vector_topk(nodes, emb, q, top_k=2).collect()
    assert [(r["id"], r["score"]) for r in res] == [("A", 3.0), ("B", 0.5)]


# --- hybrid fixture (test_final.py:599-629) ---------------------------------

HYB = [
    ("V", "deep learning neural networks image classification"),
    ("G", "completely unrelated cooking recipes pasta"),
    ("N", "neutral document about weather patterns"),
]
HYB_EDGES = [("e1", "N", "G", "rel", 1.0)]


def _hybrid(spark, vw, gw, start, depth=2, k=10):
    nodes = _nodes(spark, HYB)
    emb = _embed(spark, HYB)
    edges = spark.createDataFrame(
        HYB_EDGES, "id string, src string, dst string, type string, weight double"
    )
    return hybrid_search(
        nodes,
        emb,
        edges,
        _query_frame(spark, "deep learning image classification"),
        vector_weight=vw,
        graph_weight=gw,
        top_k=k,
        graph_start_id=start,
        graph_depth=depth,
    ).collect()


def test_hybrid_formula_exact(spark):
    """TC-HYB-01: final == 0.7*vec_norm + 0.3*graph to 1e-6."""
    rows = _hybrid(spark, 0.7, 0.3, start="N")
    for r in rows:
        assert r["final_score"] == pytest.approx(
            0.7 * r["vector_score"] + 0.3 * r["graph_score"], abs=1e-6
        )
    by_id = {r["id"]: r for r in rows}
    # V-similar best vector score (normalized to 1); N is the start (g=1)
    assert by_id["V"]["vector_score"] == pytest.approx(1.0, abs=1e-6)
    assert by_id["N"]["graph_score"] == pytest.approx(1.0, abs=1e-6)


def test_hybrid_vector_only_matches_vector_ordering(spark):
    """TC-HYB-02A: (1,0) reproduces vector-only ordering."""
    rows = _hybrid(spark, 1.0, 0.0, start=None)
    nodes = _nodes(spark, HYB)
    emb = _embed(spark, HYB)
    vec = vector_topk(
        nodes, emb, _query_frame(spark, "deep learning image classification"),
        top_k=10,
    ).collect()
    vec_order = [r["id"] for r in vec if r["score"] > 0]
    hyb_order = [r["id"] for r in rows]
    assert hyb_order == vec_order[: len(hyb_order)]


def test_hybrid_graph_only(spark):
    """TC-HYB-02B: (0,1) ⇒ final == graph_score; unreached drop out."""
    rows = _hybrid(spark, 0.0, 1.0, start="N")
    ids = {r["id"] for r in rows}
    assert "V" not in ids  # unreached, zero score, dropped (app.py:726)
    for r in rows:
        assert r["final_score"] == pytest.approx(r["graph_score"], abs=1e-9)
    by_id = {r["id"]: r for r in rows}
    assert by_id["N"]["final_score"] == pytest.approx(1.0)
    # G: distance 1 from N, base=(2-1+1)/3=2/3, sole max weight ⇒ wf=1.0
    assert by_id["G"]["final_score"] == pytest.approx(2 / 3, abs=1e-6)


# --- BM25 cross-check -------------------------------------------------------


def _bm25_reference(corpus: dict[str, str], query: str) -> dict[str, float]:
    """Pure-Python Okapi BM25 (public formula; rank_bm25 defaults)."""
    k1, b, eps = 1.5, 0.75, 0.25
    docs = {i: t.lower().split() for i, t in corpus.items()}
    n = len(docs)
    avgdl = sum(len(d) for d in docs.values()) / n
    df: dict[str, int] = {}
    for toks in docs.values():
        for t in set(toks):
            df[t] = df.get(t, 0) + 1
    raw = {t: math.log(n - f + 0.5) - math.log(f + 0.5) for t, f in df.items()}
    avg_idf = sum(raw.values()) / len(raw)
    idf = {t: (eps * avg_idf if v < 0 else v) for t, v in raw.items()}
    out = {}
    for i, toks in docs.items():
        s = 0.0
        for qt in query.lower().split():
            if qt not in idf:
                continue
            tf = toks.count(qt)
            if tf == 0:
                continue
            s += idf[qt] * tf * (k1 + 1) / (
                tf + k1 * (1 - b + b * len(toks) / avgdl)
            )
        out[i] = s
    return out


def test_bm25_matches_independent_formula(spark):
    corpus = {
        "A": "the quick brown fox jumps over the lazy dog",
        "B": "the quick blue hare sleeps",
        "C": "lorem ipsum dolor sit amet fox",
        "D": "completely different text about spark",
    }
    nodes = spark.createDataFrame(
        list(corpus.items()), "id string, text string"
    )
    got = {
        r["id"]: r["score"]
        for r in bm25_scores(nodes, "quick fox").collect()
    }
    want = _bm25_reference(corpus, "quick fox")
    for i in corpus:
        assert got[i] == pytest.approx(want.get(i, 0.0), abs=1e-9), i


def test_phrase_search_order_sensitive_and_counts(spark):
    from vector_graph_native_database__spark.operators.bm25 import (
        phrase_search,
    )

    df = spark.createDataFrame(
        [
            ("d1", "hash table hash table scan"),
            ("d2", "table hash"),
            ("d3", "table scan hash"),
        ],
        "id string, text string",
    )
    got = {
        r["id"]: (r["n_occurrences"], r["rnk"])
        for r in phrase_search(df, ["hash", "table"]).collect()
    }
    # d1 has the phrase twice; d2 has only the REVERSED phrase; d3 has
    # both tokens non-adjacent — order and adjacency must both matter
    assert got == {"d1": (2, 1)}
