"""Round-4 semantics pins: ADVICE fixes (ktruss zero-support
survivors, changelog base-vs-log seq ties) plus the round's new
operators as they land."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(a, b, "t", 1.0) for a, b in pairs],
        "src string, dst string, type string, weight double",
    )


def test_ktruss_k2_keeps_triangle_free_edges_support0(spark):
    from vector_graph_native_database__spark.operators.analytics import (
        ktruss_peel,
    )

    # a triangle plus a pendant path: every edge is a 2-truss (k−2 = 0
    # triangles required), so k=2 must return ALL edges, pendants with
    # support 0 — the identity the round-3 inner join silently broke.
    pairs = [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d"), ("d", "e")]
    got = {
        (r["a"], r["b"]): r["support"]
        for r in ktruss_peel(_edges(spark, pairs), k=2, rounds=2).collect()
    }
    assert got == {
        ("a", "b"): 1,
        ("a", "c"): 1,
        ("b", "c"): 1,
        ("c", "d"): 0,
        ("d", "e"): 0,
    }


def test_bm25_topk_indexed_equals_cold(spark, sf_dir):
    from vector_graph_native_database__spark.registry import searchq

    cold = searchq.q_bm25_topk(spark, sf_dir).collect()
    staged = searchq.q_bm25_topk_indexed(spark, sf_dir).collect()
    assert [tuple(r) for r in cold] == [tuple(r) for r in staged]
    assert len(cold) > 0


def test_changelog_apply_seq_tie_log_beats_base(spark):
    from vector_graph_native_database__spark.operators.cdc import (
        changelog_apply,
    )

    base = spark.createDataFrame(
        [("a", 1.0), ("b", 2.0)], "k string, v double"
    )
    # seq 0 ties the synthetic base seq — the changelog row must win
    # deterministically (source priority), including a seq-0 delete.
    log = spark.createDataFrame(
        [("a", 10.0, 0, "U"), ("b", 0.0, 0, "D")],
        "k string, v double, seq long, op string",
    )
    got = {
        r["k"]: r["v"]
        for r in changelog_apply(base, log, ["k"]).collect()
    }
    assert got == {"a": 10.0}
