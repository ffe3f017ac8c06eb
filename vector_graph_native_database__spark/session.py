"""SparkSession factory with scale-appropriate defaults.

Defaults target correctness tests on ``local[*]`` while keeping every
knob that matters on a real cluster explicit: AQE (runtime re-plan,
skew-join splitting, shuffle coalescing), Arrow for the few
``mapInPandas`` extension points, and a shuffle-partition count that
callers override per deployment (32 for the local harness; thousands
on a 100 TB cluster).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "vector-graph-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's defaults."""
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_SHUFFLE_PARTITIONS", "32"))

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # harness events.parquet stores TIMESTAMP(NANOS); Spark has no
        # nanos type — read as long, loaders convert to micros.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Local-mode niceties; harmless on a cluster.
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
    )
    return builder.getOrCreate()
