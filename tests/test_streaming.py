"""Structured Streaming: windowed aggs over the stream match batch;
foreachBatch incremental index maintenance applies latest-wins."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from vector_graph_native_database__spark.sources import load_table
from vector_graph_native_database__spark.streaming import (
    commit_state,
    incremental_index_maintenance,
    read_state,
    stream_events,
)
from vector_graph_native_database__spark.streaming.windows import tumbling_agg


def test_stream_tumbling_matches_batch(spark, sf_dir):
    stream = stream_events(spark, sf_dir, with_watermark="30 minutes")
    assert stream.isStreaming
    agg = tumbling_agg(stream)
    tmp = tempfile.mkdtemp(prefix="vgs-stream-")
    try:
        q = (
            agg.writeStream.format("memory")
            .queryName("tumbling_test")
            .outputMode("complete")
            .option("checkpointLocation", f"{tmp}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        got = {
            (r["window_start"], r["event_type"]): (r["n"], round(r["sum_value"], 6))
            for r in spark.sql("SELECT * FROM tumbling_test").collect()
        }
        want = {
            (r["window_start"], r["event_type"]): (r["n"], round(r["sum_value"], 6))
            for r in tumbling_agg(load_table(spark, sf_dir, "events")).collect()
        }
        assert got == want and len(got) > 0
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_incremental_index_maintenance(spark):
    tmp = tempfile.mkdtemp(prefix="vgs-ingest-")
    src, state, ckpt = f"{tmp}/src", f"{tmp}/state", f"{tmp}/ckpt"
    schema = "id string, text string, seq long"
    try:
        # micro-batch 1: two docs
        spark.createDataFrame(
            [("a", "first version", 1), ("b", "doc b", 1)], schema
        ).write.mode("append").parquet(src)
        incremental_index_maintenance(spark, src, schema, state, ckpt)
        s1 = {r["node_id"] for r in read_state(spark, state).collect()}
        assert s1 == {"a", "b"}

        # micro-batch 2: update a, add c — only the new batch is embedded
        spark.createDataFrame(
            [("a", "second version", 2), ("c", "doc c", 2)], schema
        ).write.mode("append").parquet(src)
        incremental_index_maintenance(spark, src, schema, state, ckpt)
        final = {r["node_id"]: r["vector"] for r in read_state(spark, state).collect()}
        assert set(final) == {"a", "b", "c"}

        # latest wins: a's vector reflects "second version"
        from vector_graph_native_database__spark.functions.textfn import (
            embed_hash_df,
        )

        want = embed_hash_df(
            spark.createDataFrame([("a", "second version")], "id string, text string")
        ).collect()[0]["vector"]
        assert final["a"] == want
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_state_commit_is_crash_safe(spark):
    """Kill the commit protocol between every pair of steps and prove
    the previously committed snapshot is still served.

    Simulated crash points: (a) after the new version dir is fully
    written but before the pointer flip — the classic torn two-step
    swap the old implementation could corrupt on; (b) mid-pointer-
    write, leaving a partial ._CURRENT.tmp; (c) after the flip but
    before GC. Then a real commit on the damaged store must succeed
    and supersede the orphans.
    """
    import os

    tmp = tempfile.mkdtemp(prefix="vgs-txstate-")
    state = f"{tmp}/state"
    mk = lambda rows: spark.createDataFrame(rows, "id string, n long")
    try:
        v1 = commit_state(mk([("a", 1)]), state)
        assert {r["id"] for r in read_state(spark, state).collect()} == {"a"}

        # (a) crash AFTER writing the next version's data, BEFORE the
        # pointer flip: write the orphan dir exactly where commit
        # no. 2 would put it
        mk([("BAD", 99)]).write.parquet(os.path.join(state, "v000002"))
        got = {r["id"] for r in read_state(spark, state).collect()}
        assert got == {"a"}, "orphan version must be invisible"

        # (b) crash mid-pointer-write: partial temp file lingers
        with open(os.path.join(state, "._CURRENT.tmp"), "w") as f:
            f.write("v0000")  # torn write
        assert {r["id"] for r in read_state(spark, state).collect()} == {"a"}

        # recovery: the next real commit overwrites the orphan and
        # becomes visible atomically
        v2 = commit_state(mk([("a", 1), ("b", 2)]), state)
        assert v2 == "v000002"
        assert {r["id"] for r in read_state(spark, state).collect()} == {
            "a",
            "b",
        }

        # (c) GC keeps the previous version for in-flight readers,
        # sweeps older ones on the following commit
        assert os.path.isdir(os.path.join(state, v1))
        v3 = commit_state(mk([("c", 3)]), state)
        versions = sorted(
            e for e in os.listdir(state) if e.startswith("v")
        )
        assert versions == [v2, v3], "only live + previous retained"
        assert {r["id"] for r in read_state(spark, state).collect()} == {"c"}
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_legacy_flat_state_refused_then_migrated(spark):
    """A pre-versioning flat state dir must RAISE from read_state
    (silently reading it as 'no prior state' would make the next
    maintenance commit drop all accumulated state), and migrate_state
    must adopt it as the first committed version losslessly."""
    from vector_graph_native_database__spark.streaming import migrate_state

    tmp = tempfile.mkdtemp(prefix="vgs-legacy-")
    state = f"{tmp}/state"
    try:
        spark.createDataFrame(
            [("a", 1), ("b", 2)], "id string, n long"
        ).write.parquet(state)
        with pytest.raises(ValueError, match="migrate_state"):
            read_state(spark, state)
        v = migrate_state(spark, state)
        assert v == "v000001"
        got = {
            r["id"]: r["n"] for r in read_state(spark, state).collect()
        }
        assert got == {"a": 1, "b": 2}
        # idempotent: a second call is a no-op on an adopted dir
        assert migrate_state(spark, state) is None
        # and normal commits continue from the adopted version
        v2 = commit_state(
            spark.createDataFrame([("c", 3)], "id string, n long"), state
        )
        assert v2 == "v000002"
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_multimodal_plumbing(spark):
    from vector_graph_native_database__spark.multimodal import (
        attach_binary,
        fake_decode_image_meta,
        frame_sample,
    )

    df = spark.createDataFrame(
        [("a", "x" * 100), ("b", "y" * 600)], "id string, text string"
    )
    binary = attach_binary(df)
    row = {r["id"]: r for r in binary.collect()}
    assert bytes(row["a"]["payload"]) == b"x" * 100
    assert row["a"]["n_bytes"] == 100

    meta = {r["id"]: r for r in fake_decode_image_meta(binary).collect()}
    assert meta["a"]["width"] == 64 + (100 % 577)
    assert meta["b"]["height"] == 64 + ((600 * 31) % 449)

    frames = frame_sample(binary).groupBy("id").count().collect()
    by_id = {r["id"]: r["count"] for r in frames}
    assert by_id == {"a": 1, "b": 8}  # 100//64=1 frame; 600//64=9 → capped 8

    with pytest.raises(Exception, match="PIL|NotImplemented"):
        fake_decode_image_meta(binary, real_decode=True).collect()


def test_stateful_running_totals_accumulate_across_batches(spark):
    import pandas as pd

    from vector_graph_native_database__spark.streaming import (
        running_user_totals,
    )

    tmp = tempfile.mkdtemp(prefix="vgs-stateful-")
    src, ckpt = f"{tmp}/src", f"{tmp}/ckpt"
    schema = "user_id long, value double"

    def run_batch():
        stream = spark.readStream.schema(schema).parquet(src)
        rows = []

        def capture(batch_df, batch_id):
            rows.extend(batch_df.collect())

        q = (
            running_user_totals(stream)
            .writeStream.foreachBatch(capture)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return {
            r["user_id"]: (r["n_events"], r["sum_value"], r["max_value"])
            for r in rows
        }

    try:
        spark.createDataFrame(
            [(1, 10.0), (1, 5.0), (2, 7.0)], schema
        ).write.mode("append").parquet(src)
        got1 = run_batch()
        assert got1[1] == (2, 15.0, 10.0) and got1[2] == (1, 7.0, 7.0)

        # second batch: state picks up where batch 1 left off
        spark.createDataFrame([(1, 1.0), (3, 2.0)], schema).write.mode(
            "append"
        ).parquet(src)
        got2 = run_batch()
        assert got2[1] == (3, 16.0, 10.0)
        assert got2[3] == (1, 2.0, 2.0)
        assert 2 not in got2  # no new rows for user 2 -> no update emitted
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_incremental_bm25_state_matches_full_recompute(spark):
    from vector_graph_native_database__spark.operators.bm25 import (
        bm25_scores,
        stats_from_posting,
    )
    from vector_graph_native_database__spark.streaming import (
        incremental_bm25_maintenance,
    )

    tmp = tempfile.mkdtemp(prefix="vgs-bm25inc-")
    src, state, ckpt = f"{tmp}/src", f"{tmp}/state", f"{tmp}/ckpt"
    schema = "id string, text string, seq long"
    try:
        spark.createDataFrame(
            [("a", "the quick brown fox", 1), ("b", "lazy dog sleeps", 1)],
            schema,
        ).write.mode("append").parquet(src)
        incremental_bm25_maintenance(spark, src, schema, state, ckpt)

        # batch 2 rewrites a and adds c — only the delta is tokenized
        spark.createDataFrame(
            [("a", "quick quick fox jumps", 2), ("c", "the dog barks", 2)],
            schema,
        ).write.mode("append").parquet(src)
        incremental_bm25_maintenance(spark, src, schema, state, ckpt)

        final_corpus = spark.createDataFrame(
            [("a", "quick quick fox jumps"), ("b", "lazy dog sleeps"),
             ("c", "the dog barks")],
            "id string, text string",
        )
        want = {
            r["id"]: round(r["score"], 9)
            for r in bm25_scores(final_corpus, "quick dog").collect()
        }
        stats = stats_from_posting(read_state(spark, state))
        got = {
            r["id"]: round(r["score"], 9)
            for r in bm25_scores(final_corpus, "quick dog", stats=stats).collect()
        }
        assert got == want and len(got) == 3
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_watermark_drops_late_data_across_restarts(spark):
    """Append-mode windowed agg: a row arriving after the watermark
    passed its window is dropped; the finalized window emits without
    it. Driven as three checkpointed availableNow runs (watermark
    state persists in the checkpoint)."""
    from datetime import datetime as dt

    from vector_graph_native_database__spark.streaming.windows import (
        tumbling_agg,
    )

    tmp = tempfile.mkdtemp(prefix="vgs-late-")
    src, out, ckpt = f"{tmp}/src", f"{tmp}/out", f"{tmp}/ckpt"
    schema = "ts timestamp, event_type string, value double"

    def run(rows):
        spark.createDataFrame(rows, schema).write.mode("append").parquet(src)
        stream = spark.readStream.schema(schema).parquet(src).withWatermark(
            "ts", "10 minutes"
        )
        q = (
            tumbling_agg(stream)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        try:
            return {
                r["window_start"]: (r["n"], r["sum_value"])
                for r in spark.read.parquet(out).collect()
            }
        except Exception:
            return {}

    try:
        # batch 0: two rows in the 10:00 window + one at 12:05 that
        # will advance the watermark to 11:55
        got = run(
            [
                (dt(2024, 1, 1, 10, 5), "x", 1.0),
                (dt(2024, 1, 1, 10, 30), "x", 2.0),
                (dt(2024, 1, 1, 12, 5), "x", 4.0),
            ]
        )
        # the availableNow run ends with a no-data micro-batch that
        # advances the watermark to 11:55 and finalizes 10:00-11:00
        assert got == {"2024-01-01 10:00:00": (2, 3.0)}
        # run 2: 10:45 is LATE (watermark passed its window) → dropped;
        # 13:30 advances the watermark and finalizes the 12:00 window
        got = run(
            [
                (dt(2024, 1, 1, 10, 45), "x", 8.0),
                (dt(2024, 1, 1, 13, 30), "x", 16.0),
            ]
        )
        assert got["2024-01-01 10:00:00"] == (2, 3.0)  # late row absent
        assert got["2024-01-01 12:00:00"] == (1, 4.0)
        # run 3: finalize the 13:00 window; the dropped late row never
        # resurfaces anywhere
        got = run([(dt(2024, 1, 1, 15, 0), "x", 32.0)])
        assert got["2024-01-01 13:00:00"] == (1, 16.0)
        assert got["2024-01-01 10:00:00"] == (2, 3.0)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_stream_dedup_within_watermark(spark):
    from datetime import datetime as dt

    from vector_graph_native_database__spark.streaming.ingest import (
        dedup_stream,
    )

    tmp = tempfile.mkdtemp(prefix="vgs-sdedup-")
    src, ckpt = f"{tmp}/src", f"{tmp}/ckpt"
    schema = "event_id long, ts timestamp, value double"
    try:
        spark.createDataFrame(
            [
                (1, dt(2024, 1, 1, 10, 0), 1.0),
                (1, dt(2024, 1, 1, 10, 5), 1.0),  # dup within horizon
                (2, dt(2024, 1, 1, 10, 10), 2.0),
            ],
            schema,
        ).write.mode("append").parquet(src)
        stream = spark.readStream.schema(schema).parquet(src)
        q = (
            dedup_stream(stream, ["event_id"])
            .writeStream.format("memory")
            .queryName("sdedup_test")
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        got = spark.sql("SELECT event_id FROM sdedup_test").collect()
        assert sorted(r["event_id"] for r in got) == [1, 2]
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_stream_interval_join_pairs_bounded_by_lookback(spark):
    from vector_graph_native_database__spark.registry.eventsq import (
        q_events_stream_join,
    )

    rows = q_events_stream_join(spark, "/root/testdata/sf0.001").collect()
    assert rows, "expected purchase<-click attribution pairs"
    # batch twin computed inline: identical pair counts per user
    from pyspark.sql import functions as F

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    p = ev.filter(
        (F.col("event_type") == "purchase") & F.col("user_id").isNotNull()
    ).select("user_id", F.col("ts").alias("p_ts"))
    c = ev.filter(
        (F.col("event_type") == "click") & F.col("user_id").isNotNull()
    ).select(F.col("user_id").alias("cu"), F.col("ts").alias("c_ts"))
    batch = (
        p.join(
            c,
            (F.col("user_id") == F.col("cu"))
            & (F.col("c_ts") <= F.col("p_ts"))
            & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR")),
        )
        .groupBy("user_id")
        .agg(F.count("*").alias("n_pairs"))
    )
    got = {r["user_id"]: r["n_pairs"] for r in rows}
    want = {r["user_id"]: r["n_pairs"] for r in batch.collect()}
    assert got == want


def test_tws_running_totals_v2_api(spark):
    # transformWithStateInPandas execution needs a working protobuf
    # (see UserTotalsProcessor docstring); skip in containers without it
    pytest.importorskip("google.protobuf.descriptor")
    import pandas as pd  # noqa: F401

    from vector_graph_native_database__spark.streaming.stateful import (
        running_user_totals_tws,
    )

    tmp = tempfile.mkdtemp(prefix="vgs-tws-")
    src, ckpt = f"{tmp}/src", f"{tmp}/ckpt"
    schema = "user_id long, value double"
    spark.createDataFrame(
        [(1, 10.0), (1, 5.0), (2, 7.0)], schema
    ).write.mode("append").parquet(src)
    rows = []

    def capture(batch_df, batch_id):
        rows.extend(batch_df.collect())

    q = (
        running_user_totals_tws(
            spark.readStream.schema(schema).parquet(src)
        )
        .writeStream.foreachBatch(capture)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        r["user_id"]: (r["n_events"], r["sum_value"], r["max_value"])
        for r in rows
    }
    assert got == {1: (2, 15.0, 10.0), 2: (1, 7.0, 7.0)}


def test_tws_plan_builds_without_protobuf(spark):
    """The v2-API operator must at least ANALYZE in this container
    (the capability gate is at execution, not plan time)."""
    from vector_graph_native_database__spark.streaming.stateful import (
        running_user_totals_tws,
    )

    schema = "user_id long, value double"
    stream = spark.readStream.schema(schema).parquet(
        tempfile.mkdtemp(prefix="vgs-twsplan-")
    )
    df = running_user_totals_tws(stream)
    assert df.schema.simpleString().startswith(
        "struct<user_id:bigint,n_events:bigint"
    )


def test_time_travel_versions_and_orphan_rejection(spark, tmp_path):
    import os

    from vector_graph_native_database__spark.streaming.ingest import (
        commit_state,
        list_state_versions,
        read_state_version,
    )

    state = str(tmp_path / "state")
    df1 = spark.createDataFrame([(1, "a")], "k long, v string")
    df2 = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    v1 = commit_state(df1, state)
    v2 = commit_state(df2, state)
    assert list_state_versions(state) == [v1, v2]
    assert read_state_version(spark, state, v1).count() == 1
    assert read_state_version(spark, state, v2).count() == 2
    # an uncommitted orphan newer than _CURRENT must not be readable
    orphan = os.path.join(state, "v999999")
    os.makedirs(orphan)
    assert "v999999" not in list_state_versions(state)
    try:
        read_state_version(spark, state, "v999999")
        assert False, "orphan read should raise"
    except ValueError:
        pass
