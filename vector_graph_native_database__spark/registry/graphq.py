"""Graph operator queries (SURVEY §2.4)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.graph import (
    graph_bfs,
    graph_score,
    graph_search,
    subgraph_edges,
)
from .common import ORACLE_PRELUDE, model, sql_bfs_cte


def q_adjacency_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §2.4 adjacency_build (app.py:498-510): the type-filtered
    out-adjacency of each node. Never materialized as a driver dict —
    represented as a deterministic sorted "dst:weight" join string per
    source so the value hash is stable across engines."""
    _, _, edges = model(spark, sf_dir)
    return (
        edges.filter(F.col("type") == "cites")
        .groupBy(F.col("src"))
        .agg(
            F.array_join(
                F.array_sort(
                    F.collect_list(
                        F.concat("dst", F.lit(":"), F.col("weight").cast("string"))
                    )
                ),
                ",",
            ).alias("adj")
        )
    )


def q_graph_bfs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BFS from '0', depth 3, all edge types."""
    _, _, edges = model(spark, sf_dir)
    return graph_bfs(edges, "0", 3).select(
        "id", "distance", F.round("path_weight", 6).alias("path_weight")
    )


def q_graph_bfs_typed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BFS from '0', depth 3, following only 'cites' edges."""
    _, _, edges = model(spark, sf_dir)
    return graph_bfs(edges, "0", 3, edge_type="cites").select(
        "id", "distance", F.round("path_weight", 6).alias("path_weight")
    )


def q_graph_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closeness scores over the depth-2 ball around '0'."""
    _, _, edges = model(spark, sf_dir)
    bfs = graph_bfs(edges, "0", 2)
    return graph_score(bfs, "0", 2).select(
        "id",
        "distance",
        F.round("path_weight", 6).alias("path_weight"),
        F.round("g_score", 6).alias("g_score"),
    )


def q_subgraph_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Induced edges of the depth-2 ball around '0' (incl. start)."""
    _, _, edges = model(spark, sf_dir)
    reached = graph_bfs(edges, "0", 2)
    return subgraph_edges(edges, reached)


def q_graph_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed traversal ('cites' only, depth 3): node results."""
    nodes, _, edges = model(spark, sf_dir)
    result_nodes, _ = graph_search(nodes, edges, "0", 3, edge_type="cites")
    return result_nodes.select(
        "id", "text", "distance", F.round("path_weight", 6).alias("path_weight")
    )


def q_graph_search_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Induced edges of the typed traversal — note they deliberately
    ignore the type filter (reference quirk, ``app.py:613-621``)."""
    nodes, _, edges = model(spark, sf_dir)
    _, induced = graph_search(nodes, edges, "0", 3, edge_type="cites")
    return induced


_SCORE_SQL = """,
maxw AS (SELECT max(path_weight) AS mw FROM bfsr)
SELECT b.id, b.distance, round(b.path_weight, 6) AS path_weight,
       round(CASE WHEN b.id = '0' THEN 1.0
             ELSE ((2 - b.distance + 1) / 3.0)
                  * (0.5 + 0.5 * CASE WHEN m.mw > 0
                                 THEN b.path_weight / m.mw ELSE 0.0 END)
             END, 6) AS g_score
FROM bfsr b, maxw m"""

QUERIES = {
    "adjacency_build": q_adjacency_build,
    "graph_bfs": q_graph_bfs,
    "graph_bfs_typed": q_graph_bfs_typed,
    "graph_score": q_graph_score,
    "subgraph_edges": q_subgraph_edges,
    "graph_search": q_graph_search,
    "graph_search_edges": q_graph_search_edges,
}

ORACLES = {
    "adjacency_build": ORACLE_PRELUDE
    + """
SELECT src,
       string_agg(dst || ':' || CAST(weight AS VARCHAR), ','
                  ORDER BY dst || ':' || CAST(weight AS VARCHAR)) AS adj
FROM edges WHERE type = 'cites' GROUP BY src""",
    "graph_bfs": ORACLE_PRELUDE
    + sql_bfs_cte("0", 3)
    + "\nSELECT id, distance, round(path_weight, 6) AS path_weight FROM bfsr",
    "graph_bfs_typed": ORACLE_PRELUDE
    + sql_bfs_cte("0", 3, "cites")
    + "\nSELECT id, distance, round(path_weight, 6) AS path_weight FROM bfsr",
    "graph_score": ORACLE_PRELUDE + sql_bfs_cte("0", 2) + _SCORE_SQL,
    "subgraph_edges": ORACLE_PRELUDE
    + sql_bfs_cte("0", 2)
    + """
SELECT e.id, e.src, e.dst, e.type, e.weight
FROM edges e
WHERE EXISTS (SELECT 1 FROM bfsr r WHERE r.id = e.src)
  AND EXISTS (SELECT 1 FROM bfsr r WHERE r.id = e.dst)""",
    "graph_search": ORACLE_PRELUDE
    + sql_bfs_cte("0", 3, "cites")
    + """
SELECT b.id, n.text, b.distance, round(b.path_weight, 6) AS path_weight
FROM bfsr b JOIN nodes n ON n.id = b.id
WHERE b.id <> '0'""",
    "graph_search_edges": ORACLE_PRELUDE
    + sql_bfs_cte("0", 3, "cites")
    + """
SELECT e.id, e.src, e.dst, e.type, e.weight
FROM edges e
WHERE EXISTS (SELECT 1 FROM bfsr r WHERE r.id = e.src)
  AND EXISTS (SELECT 1 FROM bfsr r WHERE r.id = e.dst)""",
}


def q_graph_bipartite_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bipartite projection of the author_of edges → weighted
    co-attribution graph (id_a, id_b, w): items sharing an author
    become an edge weighted by how many authors they share — how
    co-citation / co-occurrence / co-purchase graphs are built from
    any bipartite relation at corpus scale.

    Scale shape: one self-equi-join on the hub key (src) bounded by
    Σ deg_author² — never all-pairs across items; the a<b canonical
    filter halves the join output and the weight aggregate is
    map-side-combinable. A pathological super-hub (author with 10⁶
    items) is exactly the salting/AQE-skew case documented in
    operators/skew.py; degree-capping hubs before projecting is the
    standard corpus-scale mitigation."""
    _, _, edges = model(spark, sf_dir)
    e = edges.filter(F.col("type") == "author_of").select("src", "dst")
    a = e.select("src", F.col("dst").alias("id_a"))
    b = e.select("src", F.col("dst").alias("id_b"))
    return (
        a.join(b, "src")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("w"))
    )


QUERIES["graph_bipartite_project"] = q_graph_bipartite_project
ORACLES["graph_bipartite_project"] = ORACLE_PRELUDE + """
SELECT a.dst AS id_a, b.dst AS id_b, count(*) AS w
FROM (SELECT src, dst FROM edges WHERE type = 'author_of') a
JOIN (SELECT src, dst FROM edges WHERE type = 'author_of') b
  ON b.src = a.src AND a.dst < b.dst
GROUP BY a.dst, b.dst"""


WALK_STEPS = 3


def q_graph_walk_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash-guided random-walk corpus → one row per
    start vertex: (start, walk, walk_len): node2vec/DeepWalk-style
    sequence generation with the RNG replaced by md5 ordering — at
    each step the walker at ``cur`` moves to the out-neighbor with
    the smallest md5(start‖step‖dst) (ties by dst), or stays put at
    a dead end. Deterministic ⇒ the whole corpus is value-checkable;
    a production embedding pipeline swaps the hash for a seeded RNG
    and keeps the identical plan shape.

    Scale shape: ``steps`` rounds of frontier ⨝ adjacency on the
    current-node key, the argmin as a per-start row_number over the
    joined candidates (bounded by out-degree, AQE-skew-splittable on
    hubs) — the exact plan family of BFS/PageRank rounds; walks are
    strings, never arrays, so the output stays scalar-typed."""
    _, _, edges = model(spark, sf_dir)
    from pyspark.sql.window import Window

    adj = edges.select("src", "dst").distinct()
    cur = (
        adj.select("src")
        .union(edges.select("dst"))
        .distinct()
        .select(
            F.col("src").alias("start"),
            F.col("src").alias("node"),
            F.col("src").alias("walk"),
        )
    )
    for i in range(WALK_STEPS):
        cand = cur.join(adj, cur["node"] == adj["src"], "left_outer")
        h = F.md5(
            F.concat(
                F.col("start"), F.lit(f"#{i}#"), F.coalesce("dst", F.lit(""))
            )
        )
        w = Window.partitionBy("start").orderBy(
            F.when(F.col("dst").isNull(), F.lit(1)).otherwise(F.lit(0)),
            h,
            "dst",
        )
        cur = (
            cand.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .select(
                "start",
                F.coalesce("dst", "node").alias("node"),
                F.when(
                    F.col("dst").isNull(), F.col("walk")
                ).otherwise(
                    F.concat(F.col("walk"), F.lit(">"), F.col("dst"))
                ).alias("walk"),
            )
        )
    return cur.select(
        "start",
        "walk",
        (F.size(F.split("walk", ">")) - 1).alias("walk_len"),
    )


def _walk_sql(steps: int = WALK_STEPS) -> str:
    ctes = [
        """,
adj AS MATERIALIZED (SELECT DISTINCT src, dst FROM edges),
w0 AS MATERIALIZED (
  SELECT v AS start, v AS node, v AS walk FROM (
    SELECT DISTINCT src AS v FROM edges
    UNION SELECT DISTINCT dst FROM edges))"""
    ]
    for i in range(steps):
        ctes.append(
            f""",
c{i} AS MATERIALIZED (
  SELECT w.start, w.node, w.walk, a.dst,
         row_number() OVER (
           PARTITION BY w.start
           ORDER BY CASE WHEN a.dst IS NULL THEN 1 ELSE 0 END,
                    md5(w.start || '#{i}#' || COALESCE(a.dst, '')),
                    a.dst) AS rn
  FROM w{i} w LEFT JOIN adj a ON a.src = w.node),
w{i + 1} AS MATERIALIZED (
  SELECT start, COALESCE(dst, node) AS node,
         CASE WHEN dst IS NULL THEN walk
              ELSE walk || '>' || dst END AS walk
  FROM c{i} WHERE rn = 1)"""
        )
    return (
        ORACLE_PRELUDE
        + "".join(ctes)
        + f"""
SELECT start, walk,
       CAST(len(string_split(walk, '>')) - 1 AS INT) AS walk_len
FROM w{steps}"""
    )


QUERIES["graph_walk_corpus"] = q_graph_walk_corpus
ORACLES["graph_walk_corpus"] = _walk_sql()


def q_graph_reciprocal_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-edge detection → (a, b, w_ab, w_ba): canonical
    pairs where BOTH directions exist — the mutual-follow/2-cycle
    primitive of social-graph analytics (and the degenerate-SCC case
    a full Tarjan decomposition is not needed for; the general SCC
    recursion is deliberately out of scope — documented, not faked).

    Scale shape: one self-equi-join of the deduped edge list on the
    reversed key, a<b filter keeps each mutual pair once; weights
    aggregate max per direction before the join so multi-edges
    never multiply the join."""
    _, _, edges = model(spark, sf_dir)
    e = (
        edges.groupBy("src", "dst")
        .agg(F.max("weight").alias("w"))
    )
    fwd = e.select("src", "dst", F.col("w").alias("w_ab"))
    rev = e.select(
        F.col("dst").alias("src"),
        F.col("src").alias("dst"),
        F.col("w").alias("w_ba"),
    )
    return (
        fwd.join(rev, ["src", "dst"])
        .filter(F.col("src") < F.col("dst"))
        .select(
            F.col("src").alias("a"),
            F.col("dst").alias("b"),
            F.round("w_ab", 6).alias("w_ab"),
            F.round("w_ba", 6).alias("w_ba"),
        )
    )


QUERIES["graph_reciprocal_edges"] = q_graph_reciprocal_edges
ORACLES["graph_reciprocal_edges"] = ORACLE_PRELUDE + """,
e AS (SELECT src, dst, max(weight) AS w FROM edges GROUP BY src, dst)
SELECT a.src AS a, a.dst AS b,
       round(a.w, 6) AS w_ab, round(b.w, 6) AS w_ba
FROM e a JOIN e b ON b.src = a.dst AND b.dst = a.src
WHERE a.src < a.dst"""


def q_graph_bfs_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source BFS as a first-class frame → (qid, id, distance,
    path_weight) for the 3-query serving batch: Q level-synchronous
    traversals in ONE iterative job (the frontier carries the source
    id as a key column — per level one frontier⨝edges join + one
    (qid, id) aggregate, the shuffle count of a single BFS). The
    oracle unions Q single-source bounded-walk CTEs; a pytest
    additionally pins each (qid, ·) slice equal to graph_bfs."""
    from ..operators.graph import graph_bfs_multi
    from .searchq import HYBRID_MULTI_QIDS

    _, _, edges = model(spark, sf_dir)
    return graph_bfs_multi(edges, HYBRID_MULTI_QIDS, depth=2).select(
        "qid",
        "id",
        "distance",
        F.round("path_weight", 6).alias("path_weight"),
    )


def _bfs_multi_sql() -> str:
    from .common import sql_bfs_cte
    from .searchq import HYBRID_MULTI_QIDS

    branches = []
    for qid in HYBRID_MULTI_QIDS:
        body = sql_bfs_cte(qid, 2).lstrip(",\n")
        branches.append(
            f"""
SELECT '{qid}' AS qid, f.* FROM (
  WITH RECURSIVE
  {body}
  SELECT id, distance, round(path_weight, 6) AS path_weight FROM bfsr
) f"""
        )
    return ORACLE_PRELUDE + "\n" + "\nUNION ALL\n".join(branches)


QUERIES["graph_bfs_multi"] = q_graph_bfs_multi
ORACLES["graph_bfs_multi"] = _bfs_multi_sql()
