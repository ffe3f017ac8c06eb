"""Windowed aggregations over the events table (streaming-shaped).

Batch expressions of the streaming operators in streaming/windows.py
(identical semantics; the streaming variants add watermarks). Window
starts are epoch-aligned so DuckDB reproduces them with epoch
arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from ..streaming.windows import session_agg, sliding_agg, tumbling_agg


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")


def q_events_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tumbling_agg(_events(spark, sf_dir)).withColumn(
        "sum_value", F.round("sum_value", 6)
    )


def q_events_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sliding_agg(_events(spark, sf_dir)).withColumn(
        "sum_value", F.round("sum_value", 6)
    )


def q_events_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    return session_agg(_events(spark, sf_dir)).withColumn(
        "sum_value", F.round("sum_value", 6)
    )


QUERIES = {
    "events_tumbling": q_events_tumbling,
    "events_sliding": q_events_sliding,
    "events_session": q_events_session,
}

ORACLES = {
    "events_tumbling": """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type, count(*) AS n, round(sum(value), 6) AS sum_value
FROM events GROUP BY 1, 2""",
    "events_sliding": """
WITH ex AS (
  SELECT event_type, value,
         make_timestamp(CAST((floor(epoch(ts) / 1800) * 1800 - k.k * 1800)
                             * 1000000 AS BIGINT)) AS wstart
  FROM events CROSS JOIN (SELECT unnest([0, 1]) AS k) k
)
SELECT strftime(wstart, '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type, count(*) AS n, round(sum(value), 6) AS sum_value
FROM ex GROUP BY 1, 2""",
    "events_session": """
WITH o AS (
  SELECT user_id, ts, value,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pts
  FROM events
),
f AS (
  SELECT *, CASE WHEN pts IS NULL OR epoch(ts) - epoch(pts) >= 600
            THEN 1 ELSE 0 END AS new_s
  FROM o
),
s AS (
  SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
            ROWS UNBOUNDED PRECEDING) AS sid
  FROM f
)
SELECT user_id, strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       count(*) AS n_events, round(sum(value), 6) AS sum_value
FROM s GROUP BY user_id, sid""",
}
