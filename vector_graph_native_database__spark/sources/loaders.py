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
    """Load one harness table (see TESTDATA.md) as a DataFrame."""
    if name not in TABLES:
        raise ValueError(f"unknown table {name!r}; expected one of {TABLES}")
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
