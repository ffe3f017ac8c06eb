"""Temporal join queries: as-of and range joins over the events table.

The oracle side is DuckDB's NATIVE ``ASOF JOIN`` and a plain
``BETWEEN`` theta-join — i.e. our shuffle-friendly compositions
(union+window; bucket equi-join) are value-checked against
first-class implementations of the same semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.asof import asof_join, range_join_binned
from ..sources import load_table


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    # bounded slice keeps the oracle-side theta join cheap
    return load_table(spark, sf_dir, "events").filter(F.col("user_id") < 30)


def q_events_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each click/view event + the user's latest purchase at-or-before
    it (classic feature-attribution as-of)."""
    ev = _events(spark, sf_dir)
    points = ev.filter(F.col("event_type").isin("click", "view")).select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    out = asof_join(points, purchases, ts="ts", by="user_id")
    return out.select(
        "event_id",
        "user_id",
        F.round("asof_value", 6).alias("purchase_value"),
        F.date_format("asof_ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
    )


def q_events_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events falling inside 2-hour windows opened by each error event
    of user 0..9 (incident attribution range-join)."""
    ev = _events(spark, sf_dir)
    points = ev.select("event_id", "user_id", "ts")
    intervals = (
        ev.filter((F.col("event_type") == "error") & (F.col("user_id") < 10))
        .select(
            F.col("event_id").alias("incident_id"),
            F.col("ts").alias("start"),
            (F.col("ts") + F.expr("INTERVAL 2 HOURS")).alias("end"),
        )
    )
    return (
        range_join_binned(points, intervals, ts="ts", start="start", end="end")
        .select("incident_id", "event_id", "user_id")
    )


QUERIES = {
    "events_asof_join": q_events_asof_join,
    "events_range_join": q_events_range_join,
}

ORACLES = {
    "events_asof_join": """
WITH ev AS (SELECT * FROM events WHERE user_id < 30),
points AS (
  SELECT event_id, user_id, ts FROM ev
  WHERE event_type IN ('click', 'view')
),
purchases AS (
  SELECT user_id, ts, value FROM ev WHERE event_type = 'purchase'
)
SELECT p.event_id, p.user_id,
       round(r.value, 6) AS purchase_value,
       strftime(r.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts
FROM points p
ASOF LEFT JOIN purchases r
  ON p.user_id = r.user_id AND r.ts <= p.ts""",
    "events_range_join": """
WITH ev AS (SELECT * FROM events WHERE user_id < 30),
intervals AS (
  SELECT event_id AS incident_id, ts AS start_ts,
         ts + INTERVAL 2 HOUR AS end_ts
  FROM ev WHERE event_type = 'error' AND user_id < 10
)
SELECT i.incident_id, p.event_id, p.user_id
FROM ev p JOIN intervals i
  ON i.start_ts <= p.ts AND p.ts < i.end_ts""",
}
