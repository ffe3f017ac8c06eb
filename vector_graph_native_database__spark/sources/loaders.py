"""Parquet loaders for the harness test tables.

Plain ``spark.read.parquet`` — Catalyst handles column pruning and
predicate pushdown into these scans, which is the entire point of
keeping sources declarative. At cluster scale the same loaders work
against partitioned directories; nothing here assumes local files.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one harness table (see TESTDATA.md) as a DataFrame.

    The events table stores TIMESTAMP(NANOS), which Spark reads as a
    long (``spark.sql.legacy.parquet.nanosAsLong``); convert to a
    real timestamp at microsecond precision (truncating, same as
    DuckDB's µs timestamps) so window functions see a timestamp.
    """
    from pyspark.sql import functions as F

    if name not in TABLES:
        raise ValueError(f"unknown table {name!r}; expected one of {TABLES}")
    # Runtime-settable SQL conf: events.parquet stores TIMESTAMP(NANOS),
    # which Spark refuses to read unless nanos are mapped to long. Set it
    # here (not only at session build) so the loader works in ANY session,
    # including ones the caller constructed without session.py.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    for field in df.schema.fields:
        if field.dataType.simpleString() == "bigint" and (
            field.name == "ts" or field.name.endswith("date")
        ):
            df = df.withColumn(
                field.name,
                F.timestamp_micros(F.expr(f"{field.name} div 1000")),
            )
    return df
