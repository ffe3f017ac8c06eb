"""Tokenizer / embedder / vector-math unit semantics."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from vector_graph_native_database__spark.functions import (
    cosine,
    dot,
    l2_norm,
    l2_normalize,
    minmax_normalize,
    tokenize,
)
from vector_graph_native_database__spark.functions.textfn import embed_hash_df


def test_tokenize_matches_python_split(spark):
    cases = [
        "Hello  World",
        "  leading and trailing  ",
        "",
        "one",
        "tabs\tand\nnewlines here",
        "MiXeD Case TOKENS",
    ]
    df = spark.createDataFrame([(c,) for c in cases], "text string")
    got = [r[0] for r in df.select(tokenize("text")).collect()]
    want = [c.lower().split() for c in cases]
    assert got == want


def test_embed_hash_deterministic_and_normalized(spark):
    df = spark.createDataFrame(
        [("a", "spark join merge"), ("b", ""), ("c", "spark spark spark")],
        "id string, text string",
    )
    out = {r["id"]: r for r in embed_hash_df(df).collect()}
    # normalized unless empty
    assert math.isclose(
        sum(x * x for x in out["a"]["vector"]), 1.0, abs_tol=1e-9
    )
    # empty text → zero vector, stays zero (reference guard)
    assert sum(out["b"]["vector"]) == 0.0
    assert len(out["b"]["vector"]) == 256
    # single repeated token → a one-hot regardless of count
    assert max(out["c"]["vector"]) == pytest.approx(1.0)
    # determinism across invocations
    out2 = {r["id"]: r for r in embed_hash_df(df).collect()}
    assert out["a"]["vector"] == out2["a"]["vector"]


def test_dot_and_cosine(spark):
    df = spark.createDataFrame(
        [([1.0, 2.0, 3.0], [4.0, 5.0, 6.0])],
        "a array<double>, b array<double>",
    )
    row = df.select(
        dot("a", "b").alias("d"),
        cosine("a", "b").alias("c"),
        l2_norm("a").alias("na"),
    ).collect()[0]
    assert row["d"] == pytest.approx(32.0)
    assert row["na"] == pytest.approx(math.sqrt(14))
    assert row["c"] == pytest.approx(32.0 / (math.sqrt(14) * math.sqrt(77)))


def test_l2_normalize_zero_guard(spark):
    df = spark.createDataFrame(
        [([0.0, 0.0],), ([3.0, 4.0],)], "v array<double>"
    )
    got = [r[0] for r in df.select(l2_normalize("v")).collect()]
    assert got[0] == [0.0, 0.0]
    assert got[1] == pytest.approx([0.6, 0.8])


def test_minmax_all_equal_maps_to_one(spark):
    df = spark.createDataFrame([(1, 5.0), (2, 5.0)], "id int, s double")
    got = minmax_normalize(df, "s").select("norm_score").collect()
    assert [r[0] for r in got] == [1.0, 1.0]


def test_minmax_range(spark):
    df = spark.createDataFrame(
        [(1, 0.0), (2, 5.0), (3, 10.0)], "id int, s double"
    )
    got = {
        r["id"]: r["norm_score"]
        for r in minmax_normalize(df, "s").collect()
    }
    assert got == {1: 0.0, 2: 0.5, 3: 1.0}


def test_salted_agg_matches_direct(spark):
    from pyspark.sql import functions as F

    from vector_graph_native_database__spark.operators.skew import salted_agg

    # heavily skewed: key 'hot' holds 90% of rows
    rows = [("hot", i % 7, float(i)) for i in range(900)]
    rows += [(f"k{i}", i, float(i)) for i in range(100)]
    df = spark.createDataFrame(rows, "k string, a long, v double")
    got = {
        r["k"]: (r["n"], r["s"], r["mn"], r["mx"])
        for r in salted_agg(
            df,
            "k",
            {"n": ("count", "a"), "s": ("sum", "v"),
             "mn": ("min", "v"), "mx": ("max", "v")},
        ).collect()
    }
    want = {
        r["k"]: (r["n"], r["s"], r["mn"], r["mx"])
        for r in df.groupBy("k")
        .agg(F.count("a").alias("n"), F.sum("v").alias("s"),
             F.min("v").alias("mn"), F.max("v").alias("mx"))
        .collect()
    }
    assert got == want


def test_quantize_int8_roundtrip_error_bound(spark):
    from vector_graph_native_database__spark.functions.vectorfn import (
        quantize_int8,
    )

    df = spark.createDataFrame(
        [
            ("a", [0.5, -1.0, 0.25, 0.003]),
            ("b", [2.0, 2.0, -2.0, 0.0]),
            ("z", [0.0, 0.0, 0.0, 0.0]),  # zero vector → scale 0
        ],
        "id string, vector array<float>",
    )
    scale, q = quantize_int8("vector")
    rows = df.select("id", scale.alias("s"), q.alias("q"), "vector").collect()
    for r in rows:
        if r["s"] == 0:
            assert all(c == 0 for c in r["q"])
            continue
        for orig, code in zip(r["vector"], r["q"]):
            assert -127 <= code <= 127
            # dequantized value within half a quantization step
            assert abs(code * r["s"] / 127.0 - orig) <= r["s"] / 254.0 + 1e-9
