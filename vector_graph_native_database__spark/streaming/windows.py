"""Windowed aggregations over the events stream table.

The reference has no streaming at all (SURVEY §2.8) — ingestion is
synchronous CRUD that rebuilds indexes per write. These operators are
the Spark-native capability: tumbling / sliding / session windows
expressed with the built-in ``window`` / ``session_window``
functions, which work identically over a batch DataFrame and a
Structured Stream (add ``withWatermark`` upstream for late data —
see ingest.py). Window starts are epoch-aligned, so the DuckDB
oracle reproduces them with epoch arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_agg(
    events: DataFrame, width: str = "1 hour"
) -> DataFrame:
    """Per (tumbling window, event_type): count + sum(value)."""
    return (
        events.groupBy(
            F.window("ts", width).alias("w"), "event_type"
        )
        .agg(F.count("*").alias("n"), F.sum("value").alias("sum_value"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "event_type",
            "n",
            "sum_value",
        )
    )


def sliding_agg(
    events: DataFrame, width: str = "1 hour", slide: str = "30 minutes"
) -> DataFrame:
    """Per (sliding window, event_type): count + sum(value).

    Each event lands in width/slide overlapping windows; Spark's
    ``window`` explodes that JVM-side.
    """
    return (
        events.groupBy(
            F.window("ts", width, slide).alias("w"), "event_type"
        )
        .agg(F.count("*").alias("n"), F.sum("value").alias("sum_value"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "event_type",
            "n",
            "sum_value",
        )
    )


def session_agg(events: DataFrame, gap: str = "10 minutes") -> DataFrame:
    """Per (user, gap-based session): start, event count, sum(value).

    ``session_window`` is the built-in stateful-capable operator —
    the same expression runs under Structured Streaming with a
    watermark for incremental session maintenance.
    """
    return (
        events.groupBy(
            F.session_window("ts", gap).alias("w"), "user_id"
        )
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            "user_id",
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias(
                "session_start"
            ),
            "n_events",
            "sum_value",
        )
    )


def stream_interval_join(
    events: DataFrame,
    left_type: str = "purchase",
    right_type: str = "click",
    lookback: str = "1 hour",
    watermark: str = "1 hour",
) -> DataFrame:
    """Stream–stream INTERVAL join: each ``left_type`` event matched
    to the same user's ``right_type`` events in the preceding
    ``lookback`` → (user_id, left_id, right_id, left_ts, right_ts).

    The canonical attribution join ("which clicks preceded this
    purchase"), expressed as Structured Streaming's watermarked
    stream-stream inner join: both sides carry a watermark and the
    join predicate carries the time-range bound, so the state store
    holds only ``lookback + watermark`` of either stream per user —
    bounded state at any volume, keyed by user (AQE/skew concerns
    are the same as any keyed join). Works identically over batch
    frames (same API), which is how the gate's DuckDB twin checks
    the emitted pairs exactly.
    """
    left = (
        events.filter(
            (F.col("event_type") == left_type)
            & F.col("user_id").isNotNull()
        )
        .select(
            "user_id",
            F.col("event_id").alias("left_id"),
            F.col("ts").alias("left_ts"),
        )
        .withWatermark("left_ts", watermark)
    )
    right = (
        events.filter(
            (F.col("event_type") == right_type)
            & F.col("user_id").isNotNull()
        )
        .select(
            F.col("user_id").alias("r_user"),
            F.col("event_id").alias("right_id"),
            F.col("ts").alias("right_ts"),
        )
        .withWatermark("right_ts", watermark)
    )
    return left.join(
        right,
        (F.col("user_id") == F.col("r_user"))
        & (F.col("right_ts") <= F.col("left_ts"))
        & (
            F.col("right_ts")
            >= F.col("left_ts") - F.expr(f"INTERVAL {lookback}")
        ),
    ).select("user_id", "left_id", "right_id", "left_ts", "right_ts")


def stream_interval_join_outer(
    events: DataFrame,
    left_type: str = "purchase",
    right_type: str = "click",
    lookback: str = "1 hour",
    watermark: str = "1 hour",
) -> DataFrame:
    """LEFT-OUTER watermarked stream–stream interval join: every
    ``left_type`` event paired with the same user's preceding
    ``right_type`` events, plus one null-right row for lefts with NO
    match — the attribution join that also surfaces the un-attributed
    conversions, which the inner variant silently drops.

    Unmatched lefts are emitted by the engine only once the global
    watermark (min over both sides of max-event-time - delay) passes
    them, so callers that need a replay-deterministic result must cut
    the output at a timestamp safely below the final watermark — the
    registry entry does exactly that and documents why. State stays
    bounded to ``lookback + watermark`` per side, same as the inner
    join.
    """
    left = (
        events.filter(
            (F.col("event_type") == left_type)
            & F.col("user_id").isNotNull()
        )
        .select(
            "user_id",
            F.col("event_id").alias("left_id"),
            F.col("ts").alias("left_ts"),
        )
        .withWatermark("left_ts", watermark)
    )
    right = (
        events.filter(
            (F.col("event_type") == right_type)
            & F.col("user_id").isNotNull()
        )
        .select(
            F.col("user_id").alias("r_user"),
            F.col("event_id").alias("right_id"),
            F.col("ts").alias("right_ts"),
        )
        .withWatermark("right_ts", watermark)
    )
    return left.join(
        right,
        (F.col("user_id") == F.col("r_user"))
        & (F.col("right_ts") <= F.col("left_ts"))
        & (
            F.col("right_ts")
            >= F.col("left_ts") - F.expr(f"INTERVAL {lookback}")
        ),
        "leftOuter",
    ).select("user_id", "left_id", "right_id", "left_ts", "right_ts")
