"""Sampling / splitting / chunking semantics on synthetic fixtures."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vector_graph_native_database__spark.operators import sampling

DOCS = [(str(i), f"tok{j} " * 5 + "the a of and to") for i, j in enumerate(range(40))]


def _docs(spark):
    return spark.createDataFrame(DOCS, "id string, text string")


def test_hash_sample_deterministic_and_subset(spark):
    df = _docs(spark)
    a = {r["id"] for r in sampling.hash_sample(df, 0.5).collect()}
    b = {r["id"] for r in sampling.hash_sample(df, 0.5).collect()}
    assert a == b  # pure function of id — rerun-stable
    smaller = {r["id"] for r in sampling.hash_sample(df, 0.2).collect()}
    assert smaller <= a  # threshold monotonicity: 20% sample ⊂ 50% sample
    assert 0 < len(a) < 40


def test_train_eval_split_partitions_everything(spark):
    got = sampling.train_eval_split(_docs(spark), train_frac=0.75).collect()
    assert len(got) == 40
    splits = {r["split"] for r in got}
    assert splits == {"train", "eval"}
    train = sum(r["split"] == "train" for r in got)
    assert 20 <= train <= 39  # ~30 expected; bound loosely, but majority


def test_stratified_sample_respects_quota(spark):
    df = spark.createDataFrame(
        [(str(i), f"g{i % 3}") for i in range(30)], "id string, source string"
    )
    got = sampling.stratified_sample(df, "source", 4).collect()
    per_group = {}
    for r in got:
        per_group.setdefault(r["source"], []).append(r["rk"])
    assert set(per_group) == {"g0", "g1", "g2"}
    assert all(sorted(v) == [1, 2, 3, 4] for v in per_group.values())
    again = sampling.stratified_sample(df, "source", 4).collect()
    assert {r["id"] for r in got} == {r["id"] for r in again}


def test_chunk_documents_covers_all_tokens(spark):
    df = spark.createDataFrame(
        [("d1", " ".join(f"t{i}" for i in range(70))), ("d2", "a b"), ("d3", "")],
        "id string, text string",
    )
    rows = sampling.chunk_documents(df, size=32, stride=24).collect()
    by_id = {}
    for r in rows:
        by_id.setdefault(r["id"], []).append(r)
    # d1: 70 tokens → strided starts 1, 25 plus clamped final start 39
    assert sorted(r["start"] for r in by_id["d1"]) == [1, 25, 39]
    covered = set()
    for r in by_id["d1"]:
        assert r["n_chunk_tokens"] == 32
        covered |= set(range(r["start"], r["start"] + 32))
    assert covered == set(range(1, 71))  # gap-free, tail included
    # short doc: one chunk with everything; empty doc: one empty chunk
    (d2,) = by_id["d2"]
    assert d2["start"] == 1 and d2["chunk_text"] == "a b" and d2["n_chunk_tokens"] == 2
    (d3,) = by_id["d3"]
    assert d3["n_chunk_tokens"] == 0 and d3["chunk_text"] == ""


def test_chunk_documents_rejects_gappy_stride(spark):
    with pytest.raises(ValueError):
        sampling.chunk_documents(_docs(spark), size=8, stride=9)


def test_corpus_clean_quality_gate_and_dedup(spark):
    df = spark.createDataFrame(
        [
            # high quality (stopword-rich, reasonable length), duplicated text
            ("d1", "the quick brown fox and the lazy dog of the farm go to town"),
            ("d2", "the quick brown fox and the lazy dog of the farm go to town"),
            ("d3", "zz"),  # low quality: 1 token, no stopwords
        ],
        "id string, text string",
    )
    got = sampling.corpus_clean(df, min_quality=0.3).collect()
    ids = {r["id"] for r in got}
    assert ids == {"d1"}  # d2 deduped away (min-id keeper), d3 quality-gated
    assert got[0]["quality"] >= 0.3


def test_pack_greedy_layout_invariants(spark):
    df = spark.createDataFrame(
        [(str(i), 10 + i % 7) for i in range(40)], "id string, w int"
    )
    got = sampling.pack_greedy(df, "w", budget=32, n_shards=3).collect()
    assert len(got) == 40
    by_shard = {}
    for r in got:
        by_shard.setdefault(r["shard"], []).append(r)
    assert set(by_shard) <= {0, 1, 2}
    for rows in by_shard.values():
        rows.sort(key=lambda r: r["start_offset"])
        # offsets tile the shard stream exactly end-to-end
        expect = 0
        for r in rows:
            assert r["start_offset"] == expect
            assert r["bin_id"] == r["start_offset"] // 32
            expect += r["weight"]
        # bins are contiguous and non-decreasing in stream order
        bins = [r["bin_id"] for r in rows]
        assert bins == sorted(bins)
    # rerun is byte-identical (pure function of ids)
    again = sampling.pack_greedy(df, "w", budget=32, n_shards=3).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, again))
