"""CRUD batch-transition semantics (TC-API-01..05 re-expressed)."""

from __future__ import annotations

from pyspark.sql import functions as F

from vector_graph_native_database__spark.operators import crud

NODES = [("X", "node x"), ("Y", "node y"), ("Z", "node z")]
EDGES = [
    ("e1", "X", "Y", "rel", 1.0),
    ("e2", "Y", "X", "rel", 2.0),
    ("e3", "Y", "Z", "rel", 3.0),
]


def _nodes(spark):
    return spark.createDataFrame(NODES, "id string, text string")


def _edges(spark):
    return spark.createDataFrame(
        EDGES, "id string, src string, dst string, type string, weight double"
    )


def test_upsert_replaces_and_inserts(spark):
    """TC-API-01: create is INSERT OR REPLACE (app.py:131-134)."""
    batch = spark.createDataFrame(
        [("X", "replaced"), ("W", "new")], "id string, text string"
    )
    got = {
        r["id"]: r["text"]
        for r in crud.upsert(_nodes(spark), batch, "id").collect()
    }
    assert got == {"X": "replaced", "Y": "node y", "Z": "node z", "W": "new"}


def test_update_partial_null_keeps_old(spark):
    """TC-API-03/05: NULL field keeps the stored value."""
    changes = spark.createDataFrame(
        [("e1", None, 9.5), ("e3", "cites", None)],
        "id string, type string, weight double",
    )
    got = {
        r["id"]: (r["type"], r["weight"])
        for r in crud.update_partial(
            _edges(spark), changes, "id", ["type", "weight"]
        ).collect()
    }
    assert got["e1"] == ("rel", 9.5)
    assert got["e2"] == ("rel", 2.0)
    assert got["e3"] == ("cites", 3.0)


def test_edge_insert_validates_endpoints(spark):
    """TC-API edge creation 404s on a missing endpoint (app.py:843-846)."""
    batch = spark.createDataFrame(
        [
            ("n1", "X", "Z", "rel", 1.0),
            ("n2", "X", "MISSING", "rel", 1.0),
            ("n3", "MISSING", "Z", "rel", 1.0),
        ],
        "id string, src string, dst string, type string, weight double",
    )
    got = {
        r["id"]
        for r in crud.edge_insert_validated(
            _edges(spark), _nodes(spark), batch
        ).collect()
    }
    assert got == {"e1", "e2", "e3", "n1"}


def test_node_delete_cascade(spark):
    """TC-API-04: deleting X removes X, its embedding, and BOTH
    incident edges."""
    emb = spark.createDataFrame(
        [("X", [1.0], 1), ("Y", [1.0], 1)],
        "node_id string, vector array<float>, dim int",
    )
    dels = spark.createDataFrame([("X",)], "id string")
    n2, e2, ed2 = crud.node_delete_cascade(
        _nodes(spark), emb, _edges(spark), dels
    )
    assert {r["id"] for r in n2.collect()} == {"Y", "Z"}
    assert {r["node_id"] for r in e2.collect()} == {"Y"}
    assert {r["id"] for r in ed2.collect()} == {"e3"}


def test_edge_delete(spark):
    dels = spark.createDataFrame([("e2",)], "id string")
    got = {r["id"] for r in crud.edge_delete(_edges(spark), dels).collect()}
    assert got == {"e1", "e3"}
