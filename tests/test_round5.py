"""Round-5 additions: commit-lock lease hardening, JPEG sniff
fill/RSTn markers, bench partial-rep sample handling, and the new
registry entries (ann_tier_report, ann_ivfpq_multi, exact SCC,
TPC-H Q12/Q21, streaming->BM25 loop)."""

from __future__ import annotations

import os
import time

import pytest


# ---------------------------------------------------------------------------
# Commit-lock lease (ADVICE r4: mtime heartbeat, owner token,
# tombstone-arbitrated stale reclaim)
# ---------------------------------------------------------------------------


def test_lock_heartbeat_keeps_long_commit_live(tmp_path, monkeypatch):
    """A held lease refreshes the lock mtime, so a commit that outlives
    the stale TTL still presents as LIVE to a second writer (the r4
    fail-open: long snapshot write -> lock looks stale -> reclaimed
    mid-commit)."""
    from vector_graph_native_database__spark.streaming import ingest

    monkeypatch.setattr(ingest, "_LOCK_STALE_SECS", 1.0)  # beat every 0.1s
    sd = str(tmp_path / "state")
    os.makedirs(sd)
    lease = ingest._acquire_commit_lock(sd)
    try:
        time.sleep(1.5)  # well past the (patched) stale TTL
        age = time.time() - os.path.getmtime(lease.path)
        assert age < 1.0, "heartbeat did not refresh the lock mtime"
        # a second writer must still see a LIVE lock and refuse
        with pytest.raises(ingest.ConcurrentWriterError, match="live commit"):
            ingest._acquire_commit_lock(sd)
    finally:
        lease.release()
    assert not os.path.exists(lease.path)


def test_lock_lease_verify_detects_reclaim_and_release_is_safe(tmp_path):
    """verify() is False once the lock carries a different owner token,
    and release() never unlinks a lock another writer now owns."""
    from vector_graph_native_database__spark.streaming import ingest

    sd = str(tmp_path / "state")
    os.makedirs(sd)
    lease = ingest._acquire_commit_lock(sd)
    assert lease.verify()
    with open(lease.path, "w") as f:  # simulate a reclaimer taking over
        f.write("other-writer:deadbeef\n")
    assert not lease.verify()
    lease.release()
    assert os.path.exists(lease.path), "release() unlinked a foreign lock"
    os.unlink(lease.path)


def test_stale_reclaim_single_winner_via_tombstone(tmp_path):
    """Reclaim renames the stale lock to a tombstone first: a loser
    whose os.replace hits FileNotFoundError loops instead of crashing,
    and never unlinks the winner's fresh lock."""
    from vector_graph_native_database__spark.streaming import ingest

    sd = str(tmp_path / "state")
    os.makedirs(sd)
    path = os.path.join(sd, ingest._LOCK)
    with open(path, "w") as f:
        f.write("crashed-writer\n")
    old = time.time() - 2 * ingest._LOCK_STALE_SECS
    os.utime(path, (old, old))
    lease = ingest._acquire_commit_lock(sd)  # reclaims via tombstone
    try:
        assert lease.verify()
        assert not any(
            e.startswith(ingest._LOCK + ".reclaimed")
            for e in os.listdir(sd)
        ), "tombstone not cleaned up"
        # a racing reclaimer now sees a YOUNG lock -> refuses (does not
        # unlink the winner's lock)
        with pytest.raises(ingest.ConcurrentWriterError):
            ingest._acquire_commit_lock(sd)
        assert lease.verify()
    finally:
        lease.release()


def test_commit_aborts_without_flip_when_lease_lost(tmp_path, spark):
    """If the lease is lost before the pointer flip, commit_state
    raises and the previously committed snapshot stays live."""
    from vector_graph_native_database__spark.streaming import ingest

    sd = str(tmp_path / "state")
    df1 = spark.createDataFrame([(1, "a")], "k long, v string")
    assert ingest.commit_state(df1, sd) == "v000001"

    real_verify = ingest._CommitLease.verify

    def stolen(self):  # lease looks lost at the point of no return
        return False

    ingest._CommitLease.verify = stolen
    try:
        df2 = spark.createDataFrame([(2, "b")], "k long, v string")
        with pytest.raises(ingest.ConcurrentWriterError, match="lease"):
            ingest.commit_state(df2, sd)
    finally:
        ingest._CommitLease.verify = real_verify
    # with verify() forced False, release() correctly refused to unlink
    # a lock it could not prove it owned — clear it as the "usurper"
    lock = os.path.join(sd, ingest._LOCK)
    if os.path.exists(lock):
        os.unlink(lock)
    assert ingest._current_version(sd) == "v000001"
    assert [r["k"] for r in ingest.read_state(spark, sd).collect()] == [1]
    # the orphaned v000002 dir is invisible and the next commit reuses it
    assert ingest.commit_state(df2, sd) == "v000002"
    assert sorted(
        r["k"] for r in ingest.read_state(spark, sd).collect()
    ) == [2]


# ---------------------------------------------------------------------------
# JPEG sniffer: fill bytes + standalone markers (ADVICE r4)
# ---------------------------------------------------------------------------


def _jpeg_bytes(segments: list[bytes]) -> bytes:
    return b"\xff\xd8" + b"".join(segments)


def test_jpeg_sniff_skips_fill_bytes_and_standalone_markers():
    from vector_graph_native_database__spark.multimodal.columns import (
        sniff_image_meta,
    )
    import struct

    sof0 = b"\xff\xc0" + struct.pack(">H", 17) + b"\x08" + struct.pack(
        ">HH", 480, 640
    ) + b"\x03" + b"\x00" * 9
    app0 = b"\xff\xe0" + struct.pack(">H", 4) + b"JF"

    # plain walk still works
    assert sniff_image_meta(_jpeg_bytes([app0, sof0])) == (640, 480, 3)
    # 0xFF fill padding before a marker must be skipped, not misread
    assert sniff_image_meta(
        _jpeg_bytes([app0, b"\xff\xff\xff", sof0])
    ) == (640, 480, 3)
    # TEM (0x01) and RSTn (0xD0-0xD7) are length-less: advance 2 bytes
    assert sniff_image_meta(
        _jpeg_bytes([b"\xff\x01", b"\xff\xd3", app0, sof0])
    ) == (640, 480, 3)
    # corrupt (non-FF where a marker must start) still returns None
    assert sniff_image_meta(_jpeg_bytes([b"\x00\x00" * 8])) is None


# ---------------------------------------------------------------------------
# bench._run_set: a query failing in a later rep must not leave a
# short-sample median that satisfies the canary guard (ADVICE r4)
# ---------------------------------------------------------------------------


def test_bench_run_set_drops_partial_samples(monkeypatch, spark):
    import bench
    from vector_graph_native_database__spark import registry

    calls = {"n": 0}

    def flaky(s, sf):
        calls["n"] += 1
        if calls["n"] >= 2:
            raise RuntimeError("boom on rep 2")
        return s.range(3)

    def steady(s, sf):
        return s.range(5)

    monkeypatch.setattr(
        registry, "all_queries", lambda: {"flaky": flaky, "steady": steady}
    )
    monkeypatch.setattr(
        bench, "get_spark", lambda *a, **k: spark, raising=False
    )
    # _run_set imports get_spark inside the function body
    import vector_graph_native_database__spark.session as sess

    monkeypatch.setattr(sess, "get_spark", lambda *a, **k: spark)

    times, errors, cold = bench._run_set(["flaky", "steady"], reps=3)
    assert "flaky" not in times, "partial samples must be dropped"
    assert "flaky" in errors
    assert "steady" in times
    assert "steady" in cold and "flaky" not in cold


# ---------------------------------------------------------------------------
# ann_ivfpq_multi: train-once / answer-many serving shape
# ---------------------------------------------------------------------------


def test_ivfpq_multi_agrees_with_cold_entry_on_shared_queries(spark, sf_dir):
    """Same index parameters => the 10-query batched entry must return
    byte-identical rows for the 5 canonical query ids as the cold
    single-shot entry (training is deterministic; batching must not
    perturb results)."""
    from vector_graph_native_database__spark.registry.pipelineq import (
        ANN_QUERY_IDS,
        q_ann_ivfpq_multi,
        q_ann_ivfpq_topk,
    )

    cold = {
        (r["qid"], r["id"], r["adist"], r["rnk"])
        for r in q_ann_ivfpq_topk(spark, sf_dir).collect()
    }
    multi = {
        (r["qid"], r["id"], r["adist"], r["rnk"])
        for r in q_ann_ivfpq_multi(spark, sf_dir).collect()
        if r["qid"] in ANN_QUERY_IDS
    }
    assert multi == cold


# ---------------------------------------------------------------------------
# ann_tier_report: the frontier's pinned monotonicities (verdict r4
# task 1): brute is exact, multi-probe >= single-probe, rerank >=
# binary, residual-PQ distortion <= plain-PQ distortion.
# ---------------------------------------------------------------------------


def test_ann_tier_report_monotonicities(spark, sf_dir):
    from vector_graph_native_database__spark.registry.qualityq import (
        q_ann_tier_report,
    )

    rows = {r["tier"]: r for r in q_ann_tier_report(spark, sf_dir).collect()}
    assert set(rows) == {
        "brute", "int8", "lsh", "multiprobe_lsh", "ivf", "pq", "ivfpq",
        "ivfpq_residual", "matryoshka", "jl", "binary_hamming",
        "binary_rerank",
    }
    # ground truth anchors: brute is exact by construction
    assert rows["brute"]["recall_at_k"] == 1.0
    assert rows["brute"]["nn_hits"] == 5
    assert rows["brute"]["n_pairs"] == 25
    for r in rows.values():  # k=5 x 5 queries bounds every tier
        assert r["n_pairs"] <= 25
        assert r["n_hits"] <= r["n_pairs"]
    # probing more buckets can only add candidates -> recall
    assert (
        rows["multiprobe_lsh"]["recall_at_k"] >= rows["lsh"]["recall_at_k"]
    )
    # exact-cosine rerank of the Hamming shortlist can only improve
    # the ordering (and therefore recall within the shortlist)
    assert (
        rows["binary_rerank"]["recall_at_k"]
        >= rows["binary_hamming"]["recall_at_k"]
    )
    assert (
        rows["binary_rerank"]["nn_hits"] >= rows["binary_hamming"]["nn_hits"]
    )


def test_multiprobe_candidates_superset_of_single_probe(spark, sf_dir):
    """Hamming-1 multi-probe scans the query's bucket plus all 8
    single-bit-flip buckets: its candidate count per query must be >=
    single-probe's (the candidate-count axis of the tier frontier)."""
    from pyspark.sql import functions as F

    from vector_graph_native_database__spark.operators.ann import (
        hyperplanes,
        lsh_buckets,
    )
    from vector_graph_native_database__spark.registry.pipelineq import (
        ANN_QUERY_IDS,
        model,
    )

    _, emb, _ = model(spark, sf_dir)
    b = lsh_buckets(emb, hyperplanes(spark, 8, 64)).select(
        "node_id", "bucket"
    )
    q = b.filter(F.col("node_id").isin(ANN_QUERY_IDS)).select(
        F.col("node_id").alias("qid"), F.col("bucket").alias("qb")
    )
    single = (
        b.join(q, b["bucket"] == q["qb"])
        .filter(F.col("node_id") != F.col("qid"))
        .groupBy("qid")
        .count()
        .collect()
    )
    probes = q.select(
        "qid",
        F.explode(
            F.array(
                F.col("qb"),
                *[F.col("qb").bitwiseXOR(F.lit(1 << p)) for p in range(8)],
            )
        ).alias("pb"),
    )
    multi = (
        b.join(probes, b["bucket"] == probes["pb"])
        .filter(F.col("node_id") != F.col("qid"))
        .groupBy("qid")
        .count()
        .collect()
    )
    s = {r["qid"]: r["count"] for r in single}
    m = {r["qid"]: r["count"] for r in multi}
    assert set(m) >= set(s)
    for qid, n in m.items():
        assert n >= s.get(qid, 0)
    assert sum(m.values()) > sum(s.values()), (
        "multi-probe should widen at least one query's candidate set"
    )


def test_residual_pq_distortion_not_worse_than_plain(spark, sf_dir):
    """faiss's reason for residual encoding, pinned: mean |adist -
    exact squared L2| over the returned pairs is <= plain IVF-PQ's
    (deterministic trainings + fixed data => a constant comparison)."""
    import numpy as np

    from vector_graph_native_database__spark.registry.pipelineq import (
        model,
        q_ann_ivfpq_residual_topk,
        q_ann_ivfpq_topk,
    )

    _, emb, _ = model(spark, sf_dir)
    vecs = {
        r["node_id"]: np.array(r["vector"], dtype=np.float64)
        for r in emb.filter("size(vector) = 64").collect()
    }

    def mae(rows):
        return float(
            np.mean(
                [
                    abs(
                        r["adist"]
                        - float(np.sum((vecs[r["qid"]] - vecs[r["id"]]) ** 2))
                    )
                    for r in rows
                ]
            )
        )

    plain = mae(q_ann_ivfpq_topk(spark, sf_dir).collect())
    residual = mae(q_ann_ivfpq_residual_topk(spark, sf_dir).collect())
    assert residual <= plain


# ---------------------------------------------------------------------------
# scc_exact: exact labels beyond the bounded tier's budget (verdict
# r4 task 3)
# ---------------------------------------------------------------------------


def _edges_df(spark, pairs):
    return spark.createDataFrame(
        [(s, d) for s, d in pairs], "src string, dst string"
    )


def test_scc_exact_merges_long_cycle_bounded_splits(spark):
    """A chordless 10-cycle: bounded-3 mutual witnesses need cycle
    length <= 6, so scc_bounded splits it; scc_exact escalates the
    hop budget and merges it exactly."""
    from vector_graph_native_database__spark.operators.analytics import (
        scc_bounded,
        scc_exact,
    )

    cyc = [(str(i), str((i + 1) % 10)) for i in range(10)]
    extra = [("10", "11"), ("11", "10"), ("9", "12"), ("12", "13")]
    verts = spark.createDataFrame(
        [(str(i),) for i in range(14)], "id string"
    )
    exact = {
        r["id"]: r["scc_id"]
        for r in scc_exact(verts, _edges_df(spark, cyc + extra)).collect()
    }
    assert {exact[str(i)] for i in range(10)} == {"0"}
    assert exact["10"] == exact["11"] == "10"
    assert exact["12"] == "12" and exact["13"] == "13"
    bounded = {
        r["id"]: r["scc_id"]
        for r in scc_bounded(
            verts, _edges_df(spark, cyc + extra), max_hops=3
        ).collect()
    }
    assert len({bounded[str(i)] for i in range(10)}) > 1


def test_scc_exact_equals_bounded_on_driver_graph(spark, sf_dir):
    """The driver graph's only cycles are 2-cycles (structural proof
    in the registry docstring), so the exact labels must coincide
    with the 3-hop bounded tier's — and the certificate must
    terminate without budget escalation."""
    from vector_graph_native_database__spark.registry.analyticsq import (
        q_graph_scc_bounded,
        q_graph_scc_exact,
    )

    b = {
        (r["id"], r["scc_id"])
        for r in q_graph_scc_bounded(spark, sf_dir).collect()
    }
    e = {
        (r["id"], r["scc_id"])
        for r in q_graph_scc_exact(spark, sf_dir).collect()
    }
    assert b == e


def test_scc_condensation_is_acyclic(spark, sf_dir):
    """The exact condensation must be a DAG: verify no 1- or 2-cycles
    and (id-monotone key) no edge goes backward."""
    from vector_graph_native_database__spark.registry.analyticsq import (
        q_graph_scc_condensation,
    )

    rows = q_graph_scc_condensation(spark, sf_dir).collect()
    pairs = {(r["src_scc"], r["dst_scc"]) for r in rows}
    assert all(s != d for s, d in pairs)
    assert not any((d, s) in pairs for s, d in pairs)
