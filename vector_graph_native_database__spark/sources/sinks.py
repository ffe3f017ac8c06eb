"""State persistence + alternate ingest formats.

The reference persists to a single SQLite file; the engine's analog
is a parquet state directory with one table per model frame, laid out
for the read paths:

- ``nodes``: plain columnar (point lookups are id-filter scans;
  Catalyst prunes columns, and row-group statistics prune on id).
- ``edges``: partitioned by ``type`` — the traversal type filter
  (graph_bfs edge_type) becomes partition pruning, reading only the
  matching directory.
- ``embeddings``: plain; the scan is always full (vector search) so
  layout optimizes for sequential throughput, not pruning.

``coalesce_small`` exists because a 100 TB deployment tunes file
counts; tests and local runs keep the default. CSV/JSON ingest
helpers normalize external drops onto the model schemas so every
downstream operator works unchanged.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .adapters import nodes_df  # noqa: F401  (re-export convenience)

NODES_SCHEMA = "id string, text string, metadata map<string,string>"
EDGES_SCHEMA = (
    "id string, src string, dst string, type string, weight double"
)


def save_state(
    state_dir: str,
    nodes: DataFrame,
    embeddings: DataFrame,
    edges: DataFrame,
    coalesce_small: int | None = None,
) -> None:
    """Write the three model frames under ``state_dir``."""

    def _w(df: DataFrame, name: str, partition_by: list[str] | None = None):
        if coalesce_small:
            df = df.coalesce(coalesce_small)
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(os.path.join(state_dir, name))

    _w(nodes, "nodes")
    _w(embeddings, "embeddings")
    _w(edges, "edges", partition_by=["type"])


def load_state(
    spark: SparkSession, state_dir: str
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Read back (nodes, embeddings, edges); edge column order is
    restored to the model schema (partitionBy moves ``type`` last)."""
    nodes = spark.read.parquet(os.path.join(state_dir, "nodes"))
    emb = spark.read.parquet(os.path.join(state_dir, "embeddings"))
    edges = spark.read.parquet(os.path.join(state_dir, "edges")).select(
        "id", "src", "dst", "type", "weight"
    )
    return nodes, emb, edges


def nodes_from_csv(
    spark: SparkSession,
    path: str,
    id_col: str = "id",
    text_col: str = "text",
    metadata_cols: list[str] | None = None,
) -> DataFrame:
    """CSV drop → nodes(id, text, metadata map) on the model schema."""
    raw = spark.read.option("header", "true").csv(path)
    return _to_nodes(raw, id_col, text_col, metadata_cols)


def nodes_from_json(
    spark: SparkSession,
    path: str,
    id_col: str = "id",
    text_col: str = "text",
    metadata_cols: list[str] | None = None,
) -> DataFrame:
    """JSON-lines drop → nodes(id, text, metadata map)."""
    raw = spark.read.json(path)
    return _to_nodes(raw, id_col, text_col, metadata_cols)


def nodes_from_orc(
    spark: SparkSession,
    path: str,
    id_col: str = "id",
    text_col: str = "text",
    metadata_cols: list[str] | None = None,
) -> DataFrame:
    """ORC drop → nodes(id, text, metadata map). Native ORC reader —
    columnar with predicate pushdown, so model projections prune at
    the stripe level just like parquet."""
    raw = spark.read.orc(path)
    return _to_nodes(raw, id_col, text_col, metadata_cols)


def _to_nodes(
    raw: DataFrame,
    id_col: str,
    text_col: str,
    metadata_cols: list[str] | None,
) -> DataFrame:
    meta_cols = metadata_cols or []
    entries = []
    for c in meta_cols:
        entries.extend([F.lit(c), F.col(c).cast("string")])
    metadata = (
        F.create_map(*entries)
        if entries
        else F.create_map().cast("map<string,string>")
    )
    return raw.select(
        F.col(id_col).cast("string").alias("id"),
        F.col(text_col).cast("string").alias("text"),
        metadata.alias("metadata"),
    )


def save_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
    path: str | None = None,
) -> None:
    """Write a hash-bucketed (optionally per-bucket-sorted) table.

    Bucketing is the pre-shuffle: two tables bucketed on the same key
    with the same bucket count join WITHOUT an Exchange — at 100 TB
    that turns every recurring id-keyed join (score⨝details,
    embedding attach, CRUD merge) from a full shuffle into a local
    zip of co-located buckets. Bucket count is chosen per deployment
    (here 32 = local core count; thousands on a real cluster).
    """
    w = df.write.mode("overwrite").format("parquet").bucketBy(
        num_buckets, *bucket_cols
    )
    if sort_cols:
        w = w.sortBy(*sort_cols)
    if path:
        w = w.option("path", path)
    w.saveAsTable(table)
