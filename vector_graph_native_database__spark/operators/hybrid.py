"""Hybrid search: weighted vector + graph rank fusion.

Reference semantics (``HybridSearchService.hybrid_search``,
``/root/reference/app.py:657-736``):

1. Vector scores for the whole corpus (no metadata filter,
   ``top_k = N``) → min-max normalized to [0,1]; the all-equal edge
   case maps every score to 1.0. Nodes without embeddings get 0.0
   AFTER normalization (they never appear in vector results).
2. Graph scores via BFS (edge_type=None) + ``graph_score`` from
   ``graph_start_id`` when given, else all 0.0.
3. ``final = vector_weight * vec_norm + graph_weight * g_score``;
   rows with ``final <= 0`` are dropped even when ``top_k >= N``
   (observable quirk, preserved — SURVEY §4.8.6); sort desc,
   truncate ``top_k``. The reported ``vector_score`` is the
   NORMALIZED score (``app.py:721,729``).

Per the reference's own note (``app.py:670-671``) BM25 is NOT fused
— hybrid is vector+graph only, so ``(v_w, g_w) = (1, 0)`` reproduces
vector-only ordering exactly (min-max is monotone).

Spark shape: the vector subplan and the graph subplan are
independent DataFrames merged with one full-outer join on ``id`` +
``coalesce(·, 0)``; normalization is a 1-row aggregate broadcast
back. Spark schedules the two subplans concurrently; the final
``orderBy().limit(k)`` is again a distributed TakeOrderedAndProject.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.vectorfn import minmax_normalize
from .graph import graph_bfs, graph_score
from .vector_search import score_embeddings


def hybrid_search(
    nodes: DataFrame,
    embeddings: DataFrame,
    edges: DataFrame,
    query: DataFrame,
    vector_weight: float = 0.5,
    graph_weight: float = 0.5,
    top_k: int = 10,
    graph_start_id: str | None = None,
    graph_depth: int = 2,
    round_scores: int | None = None,
) -> DataFrame:
    """→ (id, text, vector_score, graph_score, final_score)."""
    vec = minmax_normalize(
        score_embeddings(embeddings, query).select("node_id", "score"),
        "score",
        "vec_norm",
    ).select(F.col("node_id").alias("id"), "vec_norm")

    if graph_start_id is not None:
        g = graph_score(
            graph_bfs(edges, graph_start_id, graph_depth, edge_type=None),
            graph_start_id,
            graph_depth,
        ).select("id", "g_score")
    else:
        g = None

    base = nodes.select("id", "text").join(vec, "id", "left_outer")
    if g is not None:
        base = base.join(g, "id", "left_outer")
    else:
        base = base.withColumn("g_score", F.lit(0.0))

    out = base.select(
        "id",
        "text",
        F.coalesce("vec_norm", F.lit(0.0)).alias("vector_score"),
        F.coalesce("g_score", F.lit(0.0)).alias("graph_score"),
    ).withColumn(
        "final_score",
        F.lit(vector_weight) * F.col("vector_score")
        + F.lit(graph_weight) * F.col("graph_score"),
    )
    if round_scores is not None:
        for c in ("vector_score", "graph_score", "final_score"):
            out = out.withColumn(c, F.round(c, round_scores))
    return (
        out.filter(F.col("final_score") > 0)
        .orderBy(F.desc("final_score"), F.asc("id"))
        .limit(top_k)
    )
