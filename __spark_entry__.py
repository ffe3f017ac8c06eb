"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Engine: ``vector_graph_native_database__spark`` — see SURVEY.md §2
for the operator inventory each key maps to. Float outputs are
rounded to 6 decimals on BOTH sides (matching the reference tests'
1e-6 epsilon, ``test_final.py:10-11``) and every ranked output is
totally ordered by (score DESC, id ASC) per SURVEY §4.8.5.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vector_graph_native_database__spark.sources import (
    edges_df,
    embeddings_df,
    nodes_df,
)
from vector_graph_native_database__spark.operators import vector_search

SF0001 = "/root/testdata/sf0.001"

# ---------------------------------------------------------------------------
# Shared DuckDB oracle prelude: the engine-model views (nodes / emb /
# edges) derived from the driver's parquet views exactly like
# sources/adapters.py derives them. Appended per-query CTEs continue
# the WITH list.
# ---------------------------------------------------------------------------
ORACLE_PRELUDE = """
WITH RECURSIVE
nodes AS (
  SELECT CAST(doc_id AS VARCHAR) AS id, text, lang, source, n_chars
  FROM documents
),
emb AS (
  SELECT CAST(vec_id AS VARCHAR) AS node_id, embedding AS vector,
         len(embedding) AS dim
  FROM embeddings
),
__ids AS (SELECT doc_id FROM documents),
edges AS (
  SELECT 'e-' || d.doc_id || '-' || (d.doc_id + 1) AS id,
         CAST(d.doc_id AS VARCHAR) AS src,
         CAST(d.doc_id + 1 AS VARCHAR) AS dst,
         'cites' AS type,
         1.0 + CAST(d.doc_id % 5 AS DOUBLE) AS weight
  FROM __ids d
  WHERE EXISTS (SELECT 1 FROM __ids x WHERE x.doc_id = d.doc_id + 1)
  UNION ALL
  SELECT 'e-' || d.doc_id || '-' || (d.doc_id + t.j),
         CAST(d.doc_id AS VARCHAR),
         CAST(d.doc_id + t.j AS VARCHAR),
         'author_of', 2.0
  FROM __ids d CROSS JOIN (SELECT 2 AS j UNION ALL SELECT 3) t
  WHERE d.doc_id % 10 = 0
    AND EXISTS (SELECT 1 FROM __ids x WHERE x.doc_id = d.doc_id + t.j)
  UNION ALL
  SELECT 'e-' || (d.doc_id + 1) || '-' || d.doc_id,
         CAST(d.doc_id + 1 AS VARCHAR),
         CAST(d.doc_id AS VARCHAR),
         'related', 0.5
  FROM __ids d
  WHERE d.doc_id % 7 = 0
    AND EXISTS (SELECT 1 FROM __ids x WHERE x.doc_id = d.doc_id + 1)
)"""


def _model(spark: SparkSession, sf_dir: str):
    return (
        nodes_df(spark, sf_dir),
        embeddings_df(spark, sf_dir),
        edges_df(spark, sf_dir),
    )


def _query_vec(spark: SparkSession, sf_dir: str, node_id: str = "0") -> DataFrame:
    """1-row broadcastable query-vector frame (qvec) = stored embedding."""
    return (
        embeddings_df(spark, sf_dir)
        .filter(F.col("node_id") == node_id)
        .select(F.col("vector").alias("qvec"))
    )


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------


def q_scan_nodes(spark: SparkSession, sf_dir: str) -> DataFrame:
    nodes, _, _ = _model(spark, sf_dir)
    return nodes.select("id", "text", "lang", "source", "n_chars")


def q_scan_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    from vector_graph_native_database__spark.functions import l2_norm

    _, emb, _ = _model(spark, sf_dir)
    return emb.select(
        "node_id", "dim", F.round(l2_norm("vector"), 6).alias("norm")
    )


def q_scan_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    _, _, edges = _model(spark, sf_dir)
    return edges.select("id", "src", "dst", "type", "weight")


def q_stats_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    nodes, emb, edges = _model(spark, sf_dir)
    embedded = nodes.join(
        emb, nodes["id"] == emb["node_id"], "left_semi"
    ).count()
    return spark.createDataFrame(
        [(nodes.count(), embedded, edges.count())],
        "total_nodes long, nodes_with_embeddings long, total_edges long",
    )


def q_metadata_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    nodes, _, _ = _model(spark, sf_dir)
    return nodes.filter(
        vector_search.metadata_predicate({"lang": "en", "source": "src3"})
    ).select("id", "text")


def q_dim_match_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    _, emb, _ = _model(spark, sf_dir)
    return emb.filter(F.col("dim") == 64).select("node_id", "dim")


def q_vector_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    nodes, emb, _ = _model(spark, sf_dir)
    return vector_search.vector_topk(
        nodes, emb, _query_vec(spark, sf_dir), top_k=10, round_scores=6
    )


def q_vector_topk_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    nodes, emb, _ = _model(spark, sf_dir)
    return vector_search.vector_topk(
        nodes,
        emb,
        _query_vec(spark, sf_dir),
        top_k=10,
        meta_filter={"lang": "en"},
        round_scores=6,
    )


_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "scan_nodes": q_scan_nodes,
    "scan_embeddings": q_scan_embeddings,
    "scan_edges": q_scan_edges,
    "stats_counts": q_stats_counts,
    "metadata_filter": q_metadata_filter,
    "dim_match_filter": q_dim_match_filter,
    "vector_topk": q_vector_topk,
    "vector_topk_filtered": q_vector_topk_filtered,
}

_ORACLES: dict[str, str] = {
    "scan_nodes": ORACLE_PRELUDE
    + """
SELECT id, text, lang, source, n_chars FROM nodes ORDER BY id""",
    "scan_embeddings": ORACLE_PRELUDE
    + """
SELECT node_id, dim,
       round(sqrt(list_dot_product(CAST(vector AS DOUBLE[]),
                                   CAST(vector AS DOUBLE[]))), 6) AS norm
FROM emb ORDER BY node_id""",
    "scan_edges": ORACLE_PRELUDE
    + """
SELECT id, src, dst, type, weight FROM edges ORDER BY id""",
    "stats_counts": ORACLE_PRELUDE
    + """
SELECT (SELECT count(*) FROM nodes) AS total_nodes,
       (SELECT count(*) FROM nodes n
         WHERE EXISTS (SELECT 1 FROM emb e WHERE e.node_id = n.id))
         AS nodes_with_embeddings,
       (SELECT count(*) FROM edges) AS total_edges""",
    "metadata_filter": ORACLE_PRELUDE
    + """
SELECT id, text FROM nodes
WHERE lang = 'en' AND source = 'src3' ORDER BY id""",
    "dim_match_filter": ORACLE_PRELUDE
    + """
SELECT node_id, dim FROM emb WHERE dim = 64 ORDER BY node_id""",
    "vector_topk": ORACLE_PRELUDE
    + """,
q AS (SELECT vector AS qvec FROM emb WHERE node_id = '0'),
scored AS (
  SELECT e.node_id AS id,
         round(list_dot_product(CAST(e.vector AS DOUBLE[]),
                                CAST(q.qvec AS DOUBLE[])), 6) AS score
  FROM emb e, q WHERE len(e.vector) = len(q.qvec)
)
SELECT s.id, n.text, s.score
FROM scored s JOIN nodes n ON n.id = s.id
ORDER BY s.score DESC, s.id ASC LIMIT 10""",
    "vector_topk_filtered": ORACLE_PRELUDE
    + """,
q AS (SELECT vector AS qvec FROM emb WHERE node_id = '0'),
scored AS (
  SELECT e.node_id AS id,
         round(list_dot_product(CAST(e.vector AS DOUBLE[]),
                                CAST(q.qvec AS DOUBLE[])), 6) AS score
  FROM emb e, q WHERE len(e.vector) = len(q.qvec)
)
SELECT s.id, n.text, s.score
FROM scored s JOIN nodes n ON n.id = s.id
WHERE n.lang = 'en'
ORDER BY s.score DESC, s.id ASC LIMIT 10""",
}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: vector top-k over sf0.001 (driver checks rows>0)."""
    return q_vector_topk(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent for each queries() key."""
    return dict(_ORACLES)
