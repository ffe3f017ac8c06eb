"""SQL frontend: the engine's data model as Spark SQL views.

The reference has no SQL surface at all (SURVEY §2: "no SQL
frontend, no optimizer"); on Spark one is free. ``register_views``
publishes the model frames — and the harness star-schema tables — as
temp views so any ANSI SQL (joins, window functions, grouping sets,
CTEs) runs against them through Catalyst with the exact same
pushdown/pruning behavior the DataFrame operators get. ``sql`` is a
convenience passthrough that registers-then-queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .sources import TABLES, edges_df, embeddings_df, load_table, nodes_df

MODEL_VIEWS = ("nodes", "embeddings", "edges")


def register_views(
    spark: SparkSession, sf_dir: str, include_raw_tables: bool = True
) -> list[str]:
    """Create temp views for the model frames (nodes / embeddings /
    edges) and, optionally, every raw harness table. Returns the view
    names registered."""
    nodes_df(spark, sf_dir).createOrReplaceTempView("nodes")
    embeddings_df(spark, sf_dir).createOrReplaceTempView("embeddings")
    edges_df(spark, sf_dir).createOrReplaceTempView("edges")
    names = list(MODEL_VIEWS)
    if include_raw_tables:
        for t in TABLES:
            if t in ("documents", "embeddings"):
                # raw documents/embeddings are superseded by the
                # model views built on them
                continue
            load_table(spark, sf_dir, t).createOrReplaceTempView(t)
            names.append(t)
    return names


def sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    """Register the views and run one SQL query against them."""
    register_views(spark, sf_dir)
    return spark.sql(query)
