"""Round-7 regression pins: advisor findings (NULL-money RFM users,
version-padding rollover in the state store) and the sf1-battery
catch (excess-stock distinct grain)."""

from __future__ import annotations

import datetime
import os

from pyspark.sql import functions as F

from vector_graph_native_database__spark import registry
from vector_graph_native_database__spark.streaming import ingest


def test_rfm_null_money_users_stay_in_grid(spark, tmp_path):
    """A user whose events all carry NULL value must land in the RFM
    grid with money 0 — not be silently dropped by
    attach_exact_ntile's non-null join-back (the oracle's ntile keeps
    the row, so a drop is a value-gate divergence on legal input)."""
    base = datetime.datetime(2024, 1, 1)
    rows = []
    for u in range(10):
        for i in range(3):
            rows.append(
                (
                    u * 10 + i,
                    base + datetime.timedelta(hours=u * 3 + i),
                    u,
                    "view",
                    # users 0 and 7: every event has NULL value
                    None if u in (0, 7) else float(u + i),
                    "{}",
                )
            )
    spark.createDataFrame(rows, ingest.EVENTS_SCHEMA).write.mode(
        "overwrite"
    ).parquet(os.path.join(str(tmp_path), "events.parquet"))
    grid = registry.all_queries()["events_rfm_segments"](
        spark, str(tmp_path)
    )
    total = grid.agg(F.sum("n_users")).collect()[0][0]
    assert total == 10, "NULL-money users must not be dropped"


def test_commit_state_retention_survives_padding_rollover(
    spark, tmp_path
):
    """Retention and version listing compare PARSED integer suffixes:
    past commit 999,999 the names outgrow the v%06d zero-padding and
    lexicographic order would keep the wrong snapshots (v1000000 <
    v999999 as strings)."""
    sd = str(tmp_path / "state")
    ingest.commit_state(spark.range(1), sd, keep_last=2)
    # simulate a store arriving at the padding boundary
    os.rename(
        os.path.join(sd, "v000001"), os.path.join(sd, "v999999")
    )
    with open(os.path.join(sd, "_CURRENT"), "w") as f:
        f.write("v999999\n")
    ingest.commit_state(spark.range(2), sd, keep_last=2)
    ingest.commit_state(spark.range(3), sd, keep_last=2)
    assert ingest.list_state_versions(sd) == ["v1000000", "v1000001"]
    assert ingest.read_state(spark, sd).count() == 3
    assert (
        ingest.read_state_version(spark, sd, "v1000000").count() == 2
    )


def test_excess_stock_distinct_is_projection_grain(spark, tmp_path):
    """olap_excess_stock dedups on the PROJECTED (s_name, n_name) —
    two suppliers sharing a name are one answer row (the sf1 scaled
    replica repeats names across key offsets; the oracle's SELECT
    DISTINCT collapses them, so the engine must too)."""
    sf = "/root/testdata/sf0.001"
    df = registry.all_queries()["olap_excess_stock"](spark, sf)
    assert df.count() == df.select("s_name", "n_name").distinct().count()
