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
