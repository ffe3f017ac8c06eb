"""Property-based semantics checks (hypothesis).

Each property runs the engine operator on a small random input and
compares against an independent pure-Python reference implementation
— a different failure surface than the fixed-fixture tests and the
DuckDB oracle (which shares the SQL formulation). Example counts are
kept small because every example is a Spark round-trip.
"""

from __future__ import annotations

import math

from hypothesis import given, settings, strategies as st

from vector_graph_native_database__spark.operators.bm25 import bm25_scores
from vector_graph_native_database__spark.operators.crud import upsert
from vector_graph_native_database__spark.operators.graph import graph_bfs

SETTINGS = dict(max_examples=8, deadline=None)

# -- BFS ---------------------------------------------------------------------

edges_strategy = st.lists(
    st.tuples(
        st.integers(0, 5),  # src
        st.integers(0, 5),  # dst
        st.integers(1, 9),  # weight (ints keep float equality exact)
    ),
    min_size=0,
    max_size=12,
)


def py_bfs(edges, start, depth):
    """Level-synchronous reference: per node min hop distance, max
    accumulated weight among min-distance paths (SURVEY §4.8.4)."""
    best = {start: (0, 0.0)}
    frontier = {start: 0.0}
    for level in range(1, depth + 1):
        nxt: dict[str, float] = {}
        for src, w_acc in frontier.items():
            for s, d, w in edges:
                if str(s) == src:
                    cand = w_acc + w
                    key = str(d)
                    if key not in nxt or cand > nxt[key]:
                        nxt[key] = cand
        nxt = {k: v for k, v in nxt.items() if k not in best}
        if not nxt:
            break
        for k, v in nxt.items():
            best[k] = (level, v)
        frontier = nxt
    return best


@given(edges=edges_strategy, depth=st.integers(1, 4))
@settings(**SETTINGS)
def test_bfs_matches_level_synchronous_reference(spark, edges, depth):
    rows = [
        (f"e{i}", str(s), str(d), "t", float(w))
        for i, (s, d, w) in enumerate(edges)
    ]
    edf = spark.createDataFrame(
        rows or [("e0", "0", "0", "t", 0.0)][:0],
        "id string, src string, dst string, type string, weight double",
    )
    got = {
        r["id"]: (r["distance"], r["path_weight"])
        for r in graph_bfs(edf, "0", depth).collect()
    }
    assert got == py_bfs(edges, "0", depth)


# -- BM25 --------------------------------------------------------------------

corpus_strategy = st.lists(
    st.text(alphabet="ab c", min_size=0, max_size=12),
    min_size=1,
    max_size=6,
)


def py_bm25(texts, query, k1=1.5, b=0.75, eps=0.25):
    """Okapi BM25 exactly as rank_bm25.BM25Okapi computes it."""
    docs = [t.lower().split() for t in texts]
    n = len(docs)
    avgdl = sum(len(d) for d in docs) / n
    df: dict[str, int] = {}
    for d in docs:
        for tok in set(d):
            df[tok] = df.get(tok, 0) + 1
    idf = {
        t: math.log(n - f + 0.5) - math.log(f + 0.5) for t, f in df.items()
    }
    avg_idf = sum(idf.values()) / len(idf) if idf else 0.0
    idf = {t: (v if v >= 0 else eps * avg_idf) for t, v in idf.items()}
    scores = []
    qtoks = query.lower().split()
    for d in docs:
        s = 0.0
        for qt in qtoks:
            tf = d.count(qt)
            if tf == 0 or qt not in idf:
                continue
            s += idf[qt] * tf * (k1 + 1) / (
                tf + k1 * (1 - b + b * len(d) / avgdl)
            )
        scores.append(s)
    return scores


@given(texts=corpus_strategy, query=st.text(alphabet="ab c", max_size=8))
@settings(**SETTINGS)
def test_bm25_matches_okapi_reference(spark, texts, query):
    nodes = spark.createDataFrame(
        [(str(i), t) for i, t in enumerate(texts)], "id string, text string"
    )
    got = {
        r["id"]: r["score"] for r in bm25_scores(nodes, query).collect()
    }
    want = py_bm25(texts, query)
    for i, w in enumerate(want):
        assert math.isclose(got[str(i)], w, rel_tol=1e-9, abs_tol=1e-9)


# -- CRUD laws ---------------------------------------------------------------

table_strategy = st.lists(
    st.tuples(st.integers(0, 9), st.integers(0, 99)),
    min_size=0,
    max_size=8,
    unique_by=lambda r: r[0],
)
batch_strategy = st.lists(
    st.tuples(st.integers(0, 9), st.integers(0, 99)),
    min_size=0,
    max_size=5,
    unique_by=lambda r: r[0],
)


@given(table=table_strategy, batch=batch_strategy)
@settings(**SETTINGS)
def test_upsert_is_idempotent_and_batch_wins(spark, table, batch):
    schema = "id string, v long"
    t = spark.createDataFrame(
        [(str(k), v) for k, v in table], schema
    )
    b = spark.createDataFrame(
        [(str(k), v) for k, v in batch], schema
    )
    once = upsert(t, b, "id")
    twice = upsert(once, b, "id")
    want = {str(k): v for k, v in table} | {str(k): v for k, v in batch}
    got_once = {r["id"]: r["v"] for r in once.collect()}
    got_twice = {r["id"]: r["v"] for r in twice.collect()}
    assert got_once == want
    assert got_twice == want


# -- hot-key-salted join -----------------------------------------------------

salted_rows = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 99)),  # (key, payload)
    min_size=0,
    max_size=40,
)
salted_dim = st.lists(
    st.tuples(st.integers(0, 5), st.text("abc", min_size=1, max_size=2)),
    min_size=0,
    max_size=8,
)


@given(rows=salted_rows, dim=salted_dim, threshold=st.integers(1, 10))
@settings(**SETTINGS)
def test_salted_join_equals_plain_join(spark, rows, dim, threshold):
    """For ANY inputs and ANY hot threshold, the hot-key-salted join
    is multiset-identical to the plain inner join — salting must
    never duplicate or drop a row, whichever keys land hot."""
    from vector_graph_native_database__spark.operators.skew import (
        salted_join_hot_keys,
    )

    facts = spark.createDataFrame(
        [(f"k{k}", p) for k, p in rows], "k string, payload int"
    )
    # dedup dim keys: a dim side with duplicate keys multiplies rows
    # in BOTH joins identically, but distinct keys keep the reference
    # model trivial
    dim_rows = list({f"k{k}": lab for k, lab in dim}.items())
    dimdf = spark.createDataFrame(dim_rows, "k string, label string")
    got = sorted(
        (r["k"], r["payload"], r["label"])
        for r in salted_join_hot_keys(
            facts, dimdf, "k", salt_buckets=4, hot_row_threshold=threshold
        ).collect()
    )
    dmap = dict(dim_rows)
    want = sorted(
        (f"k{k}", p, dmap[f"k{k}"]) for k, p in rows if f"k{k}" in dmap
    )
    assert got == want


# -- exact group quantiles ---------------------------------------------------

vals_strategy = st.lists(
    st.tuples(st.sampled_from(["a", "b"]), st.integers(-50, 50)),
    min_size=1,
    max_size=40,
)


@given(rows=vals_strategy)
@settings(**SETTINGS)
def test_group_quantiles_match_type1_reference(spark, rows):
    from vector_graph_native_database__spark.operators.profiling import (
        group_quantiles,
    )

    df = spark.createDataFrame(
        [(g, float(v)) for g, v in rows], "g string, v double"
    )
    got = {r.grp: r for r in group_quantiles(df, "g", "v").collect()}
    by_g = {}
    for g, v in rows:
        by_g.setdefault(g, []).append(v)
    for g, xs in by_g.items():
        xs = sorted(xs)
        n = len(xs)
        assert got[g].n == n
        for p, col in ((0.25, "q_0_25"), (0.5, "q_0_5"), (0.75, "q_0_75")):
            target = math.ceil(p * n)
            assert getattr(got[g], col) == xs[target - 1]
