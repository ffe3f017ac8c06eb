"""Graph operator semantics on the reference's micro-fixtures.

Re-expresses TC-GRAPH-01/02/03 and TC-API-05's traversal checks
(``/root/reference/test_final.py:501-594,355-380``) as DataFrame
tests on literal fixtures (FIXTURES.md §2).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vector_graph_native_database__spark.operators.graph import (
    graph_bfs,
    graph_score,
    graph_search,
    subgraph_edges,
)

EDGE_SCHEMA = "id string, src string, dst string, type string, weight double"


def edges(spark, rows):
    return spark.createDataFrame(rows, EDGE_SCHEMA)


def bfs_map(df):
    return {r["id"]: (r["distance"], r["path_weight"]) for r in df.collect()}


def test_chain_depth_limit(spark):
    """TC-GRAPH-01: A→B→C→D, depth 2 from A reaches {B:1, C:2}, not D."""
    e = edges(
        spark,
        [
            ("e1", "A", "B", "cites", 1.0),
            ("e2", "B", "C", "cites", 1.0),
            ("e3", "C", "D", "cites", 1.0),
        ],
    )
    got = bfs_map(graph_bfs(e, "A", 2))
    assert got == {"A": (0, 0.0), "B": (1, 1.0), "C": (2, 2.0)}


def test_typed_star_filter(spark):
    """TC-GRAPH-02: follow only 'author_of' edges."""
    e = edges(
        spark,
        [
            ("e1", "A", "P1", "author_of", 2.0),
            ("e2", "A", "P2", "cites", 1.0),
        ],
    )
    got = bfs_map(graph_bfs(e, "A", 2, edge_type="author_of"))
    assert got == {"A": (0, 0.0), "P1": (1, 2.0)}


def test_cycle_terminates_start_excluded(spark):
    """TC-GRAPH-03: 2-cycle terminates; start excluded from results."""
    nodes = spark.createDataFrame(
        [("A", "node a"), ("B", "node b")], "id string, text string"
    )
    e = edges(
        spark,
        [("e1", "A", "B", "cycle", 1.0), ("e2", "B", "A", "cycle", 1.0)],
    )
    result_nodes, induced = graph_search(nodes, e, "A", 3)
    rows = result_nodes.collect()
    assert [r["id"] for r in rows] == ["B"]
    assert rows[0]["distance"] == 1 and rows[0]["path_weight"] == 1.0
    # induced subgraph spans the reached set INCLUDING start
    assert {r["id"] for r in induced.collect()} == {"e1", "e2"}


def test_weighted_edge_path_weight(spark):
    """TC-API-05: path_weight reflects the edge weight."""
    e = edges(spark, [("e1", "A", "B", "rel", 3.5)])
    got = bfs_map(graph_bfs(e, "A", 2))
    assert got["B"] == (1, 3.5)


def test_isolated_start_returns_itself(spark):
    e = edges(spark, [("e1", "X", "Y", "rel", 1.0)])
    got = bfs_map(graph_bfs(e, "A", 3))
    assert got == {"A": (0, 0.0)}


def test_max_weight_among_min_distance_paths(spark):
    """SURVEY §4.8.4 decision: equal-distance relaxation keeps max weight."""
    e = edges(
        spark,
        [
            ("e1", "A", "B", "r", 1.0),
            ("e2", "A", "C", "r", 5.0),
            ("e3", "B", "D", "r", 1.0),
            ("e4", "C", "D", "r", 1.0),
        ],
    )
    got = bfs_map(graph_bfs(e, "A", 2))
    assert got["D"] == (2, 6.0)  # via C, the heavier path


def test_graph_score_formula(spark):
    """graph_score: base*(0.5+0.5*w/max_w); start=1.0 (app.py:551-589)."""
    e = edges(
        spark,
        [("e1", "A", "B", "r", 1.0), ("e2", "B", "C", "r", 3.0)],
    )
    bfs = graph_bfs(e, "A", 2)
    scores = {
        r["id"]: r["g_score"] for r in graph_score(bfs, "A", 2).collect()
    }
    # max_w = 4.0 (C). B: base=(2-1+1)/3=2/3, wf=0.5+0.5*(1/4)=0.625
    assert scores["A"] == pytest.approx(1.0)
    assert scores["B"] == pytest.approx((2 / 3) * 0.625, abs=1e-9)
    assert scores["C"] == pytest.approx((1 / 3) * 1.0, abs=1e-9)


def test_graph_score_zero_weights(spark):
    """All-zero path weights ⇒ weight factor 0.5."""
    e = edges(spark, [("e1", "A", "B", "r", 0.0)])
    bfs = graph_bfs(e, "A", 2)
    scores = {
        r["id"]: r["g_score"] for r in graph_score(bfs, "A", 2).collect()
    }
    assert scores["B"] == pytest.approx((2 / 3) * 0.5, abs=1e-9)


def test_subgraph_edges_ignore_type_filter(spark):
    """Induced edges include non-traversed types (app.py:613-621 quirk)."""
    nodes = spark.createDataFrame(
        [("A", "a"), ("B", "b")], "id string, text string"
    )
    e = edges(
        spark,
        [
            ("e1", "A", "B", "author_of", 2.0),
            ("e2", "B", "A", "cites", 1.0),
        ],
    )
    _, induced = graph_search(nodes, e, "A", 2, edge_type="author_of")
    assert {r["id"] for r in induced.collect()} == {"e1", "e2"}
