"""End-to-end facade tests: the reference's 13-case suite driven
through VectorGraphEngine (TC-API/VEC/GRAPH/HYB over live engine
state instead of live HTTP)."""

from __future__ import annotations

import math

import pytest

from vector_graph_native_database__spark.api import VectorGraphEngine


@pytest.fixture()
def engine(spark):
    return VectorGraphEngine(spark)


def cosine(a, b):
    d = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(x * x for x in b))
    return d / (na * nb) if na and nb else 0.0


def test_tc_api_01_create_roundtrip(engine):
    nid = engine.create_node(
        "machine learning and distributed systems", {"type": "note"}
    )
    got = engine.get_node(nid)
    assert got["text"] == "machine learning and distributed systems"
    assert got["metadata"] == {"type": "note"}
    assert got["has_embedding"] is True


def test_tc_api_02_edge_appears_outgoing(engine):
    a = engine.create_node("node a")
    b = engine.create_node("node b")
    eid = engine.create_edge(a, b, "references", weight=0.8)
    out = engine.get_node(a)["outgoing"]
    assert out == [
        {"id": eid, "target_id": b, "type": "references", "weight": 0.8}
    ]
    assert engine.get_node(b)["incoming"][0]["source_id"] == a


def test_tc_api_03_regen_embedding_changes_vector(engine):
    nid = engine.create_node("the original text about databases")
    v_old = engine._encode("the original text about databases")
    engine.update_node(
        nid,
        text="completely different content on astrophysics",
        regen_embedding=True,
    )
    got = engine.get_node(nid)
    assert got["text"] == "completely different content on astrophysics"
    v_new = engine._encode("completely different content on astrophysics")
    assert cosine(v_old, v_new) < 0.99


def test_tc_api_04_cascade_delete(engine):
    x = engine.create_node("doomed")
    a = engine.create_node("survivor")
    e1 = engine.create_edge(x, a, "t")
    e2 = engine.create_edge(a, x, "t")
    engine.delete_node(x)
    with pytest.raises(KeyError):
        engine.get_node(x)
    for eid in (e1, e2):
        with pytest.raises(KeyError):
            engine.get_edge(eid)
    assert engine.get_node(a)["outgoing"] == []


def test_tc_api_05_edge_crud_and_traversal_weight(engine):
    a = engine.create_node("a")
    b = engine.create_node("b")
    eid = engine.create_edge(a, b, "linked", weight=1.0)
    engine.update_edge(eid, weight=7.5)
    assert engine.get_edge(eid)["weight"] == 7.5
    res = engine.graph_search(a, depth=1)
    assert res["nodes"][0]["path_weight"] == 7.5
    engine.delete_edge(eid)
    with pytest.raises(KeyError):
        engine.get_edge(eid)


def test_edge_creation_validates_endpoints(engine):
    a = engine.create_node("exists")
    with pytest.raises(KeyError):
        engine.create_edge(a, "missing-node", "t")


def test_tc_vec_semantics(engine):
    a = engine.create_node("apple banana cherry fruit salad")
    engine.create_node("apple banana bread")
    engine.create_node("quantum chromodynamics lattice")
    hits = engine.vector_search("apple banana cherry", top_k=10)
    assert hits[0]["id"] == a
    assert hits[0]["vector_score"] >= 0.5
    # top_k > corpus returns all embedded nodes
    assert len(engine.vector_search("apple", top_k=99)) == 3


def test_tc_vec_03_metadata_filter(engine):
    engine.create_node("apple pie recipe", {"type": "note"})
    engine.create_node("apple pie recipe", {"type": "post"})
    hits = engine.vector_search(
        "apple pie", top_k=10, metadata_filter={"type": "note"}
    )
    assert {h["id"] for h in hits} == {
        n for n in (h["id"] for h in hits)
    }
    assert all(
        engine.get_node(h["id"])["metadata"]["type"] == "note" for h in hits
    )
    assert len(hits) == 1


def test_tc_graph_01_depth_limit(engine):
    ids = [engine.create_node(t) for t in "abcd"]
    for u, v in zip(ids, ids[1:]):
        engine.create_edge(u, v, "chain", weight=1.0)
    res = engine.graph_search(ids[0], depth=2)
    got = {n["id"]: n["distance"] for n in res["nodes"]}
    assert got == {ids[1]: 1, ids[2]: 2}


def test_tc_graph_03_cycle_terminates(engine):
    a = engine.create_node("a")
    b = engine.create_node("b")
    engine.create_edge(a, b, "t")
    engine.create_edge(b, a, "t")
    res = engine.graph_search(a, depth=3)
    assert [n["id"] for n in res["nodes"]] == [b]


def test_tc_hyb_01_weighted_fusion(engine):
    vsim = engine.create_node("solar panels renewable energy grid")
    gclose = engine.create_node("unrelated topic entirely different")
    neutral = engine.create_node("solar panels on rooftops")
    engine.create_edge(neutral, gclose, "rel", weight=2.0)
    hits = engine.hybrid_search(
        "solar panels renewable energy",
        vector_weight=0.7,
        graph_weight=0.3,
        graph_start_id=neutral,
        top_k=10,
    )
    by_id = {h["id"]: h for h in hits}
    for h in hits:
        assert math.isclose(
            h["final_score"],
            0.7 * h["vector_score"] + 0.3 * h["graph_score"],
            abs_tol=1e-6,
        )
    assert by_id[vsim]["final_score"] > by_id[gclose]["final_score"]


def test_tc_hyb_02_extremes(engine):
    vsim = engine.create_node("solar panels renewable energy grid")
    gclose = engine.create_node("unrelated topic entirely different")
    neutral = engine.create_node("solar panels on rooftops")
    engine.create_edge(neutral, gclose, "rel", weight=2.0)

    vec_only = engine.hybrid_search(
        "solar panels renewable energy", vector_weight=1.0, graph_weight=0.0
    )
    pure_vec = engine.vector_search("solar panels renewable energy", top_k=10)
    assert [h["id"] for h in vec_only] == [
        h["id"] for h in pure_vec if h["id"] in {x["id"] for x in vec_only}
    ]

    graph_only = engine.hybrid_search(
        "solar panels renewable energy",
        vector_weight=0.0,
        graph_weight=1.0,
        graph_start_id=neutral,
    )
    for h in graph_only:
        assert math.isclose(
            h["final_score"], h["graph_score"], abs_tol=1e-6
        )
    ids = {h["id"] for h in graph_only}
    assert gclose in ids and vsim not in ids  # unreached nodes drop out


def test_stats_and_health(engine):
    engine.create_node("x", auto_embed=False)
    engine.create_node("y")
    assert engine.health() == {"status": "ok"}
    s = engine.stats()
    assert s["total_nodes"] == 2
    assert s["nodes_with_embeddings"] == 1
    assert s["total_edges"] == 0


def test_manual_embeddings_stored_unnormalized_quirk(engine):
    """SURVEY §4.8.2: user-supplied vectors are stored AS GIVEN (the
    reference never normalizes them, app.py:763-764), so scoring is
    raw dot — a big manual vector outranks a unit one."""
    big = engine.create_node("x", embedding=[10.0, 0.0], auto_embed=False)
    unit = engine.create_node("y", embedding=[1.0, 0.0], auto_embed=False)
    q = engine.create_node("q", embedding=[1.0, 0.0], auto_embed=False)
    from vector_graph_native_database__spark.operators.vector_search import (
        vector_topk,
    )

    qvec = engine.spark.createDataFrame([([1.0, 0.0],)], "qvec array<double>")
    hits = vector_topk(engine.nodes, engine.embeddings, qvec, top_k=10)
    scores = {r["id"]: r["score"] for r in hits.collect()}
    assert scores[big] == 10.0 and scores[unit] == 1.0
    assert scores[big] > scores[q]


def test_empty_engine_operations(engine):
    """Every read/search path degrades to empty results — not errors —
    on a fresh engine (the reference's empty-corpus behavior)."""
    assert engine.vector_search("anything", top_k=5) == []
    assert engine.bm25_search("anything") == []
    assert engine.hybrid_search("anything") == []
    assert engine.stats() == {
        "total_nodes": 0,
        "nodes_with_embeddings": 0,
        "total_edges": 0,
    }
    with pytest.raises(KeyError):
        engine.get_node("nope")
    with pytest.raises(KeyError):
        engine.graph_search("nope")
