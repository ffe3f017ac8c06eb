"""Vector search: full-scan k-NN over the embeddings table.

Reference semantics (``VectorSearchService.search``,
``/root/reference/app.py:394-444``):
encode/accept a query vector → dot-product against every stored
embedding, skipping dim mismatches (``app.py:407-408``) → attach node
details → apply the conjunctive metadata-equality filter AFTER
scoring but BEFORE truncation (= top-k *of the filtered set*,
TC-VEC-03) → sort score desc → truncate top_k. Nodes without
embeddings never appear; ``top_k > corpus`` returns all embedded
nodes (TC-VEC-02).

Spark shape: the single-row query vector is broadcast; scoring is a
``zip_with``/``aggregate`` column expression inside the embeddings
scan; ``orderBy(desc).limit(k)`` compiles to TakeOrderedAndProject —
a distributed top-k with no global sort, which is exactly the plan
you want at 100 TB. Ties are broken by ``id ASC`` (SURVEY §4.8.5) so
results are a total order instead of the reference's dict-order
nondeterminism.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.vectorfn import dot


def score_embeddings(embeddings: DataFrame, query: DataFrame) -> DataFrame:
    """Attach ``score`` = dot(vector, query vector) to every embedding.

    ``query`` is a 1-row DataFrame with a ``qvec`` array column; it is
    broadcast so scoring is a map-only stage over the embeddings scan.
    Dim-mismatched rows are skipped (reference ``app.py:407-408``).
    """
    return (
        embeddings.crossJoin(F.broadcast(query))
        .filter(F.size("vector") == F.size("qvec"))
        .withColumn("score", dot("vector", "qvec"))
        .drop("qvec")
    )


def metadata_predicate(meta_filter: Mapping[str, str] | None) -> Column:
    """Conjunctive equality over the metadata map (``app.py:427-436``)."""
    pred = F.lit(True)
    for k, v in (meta_filter or {}).items():
        pred = pred & (F.col("metadata")[k] == F.lit(v))
    return pred


def vector_topk(
    nodes: DataFrame,
    embeddings: DataFrame,
    query: DataFrame,
    top_k: int = 10,
    meta_filter: Mapping[str, str] | None = None,
    round_scores: int | None = None,
) -> DataFrame:
    """Full-scan k-NN: returns (id, text, score), score desc / id asc.

    The nodes join is on the compact id key; at small scale Catalyst
    broadcasts, at large scale AQE picks the shuffle strategy. The
    metadata filter sits before the limit so semantics are top-k of
    the filtered set.

    ``round_scores`` rounds BEFORE the sort so the (score, id) total
    order is identical to an oracle that sorts on rounded values.
    """
    scored = score_embeddings(embeddings, query)
    if round_scores is not None:
        scored = scored.withColumn("score", F.round("score", round_scores))
    return (
        scored.join(nodes, scored["node_id"] == nodes["id"])
        .filter(metadata_predicate(meta_filter))
        .select("id", "text", "score")
        .orderBy(F.desc("score"), F.asc("id"))
        .limit(top_k)
    )


def vector_topk_multi(
    nodes: DataFrame,
    embeddings: DataFrame,
    query_ids: list[str],
    top_k: int = 10,
    round_scores: int | None = None,
) -> DataFrame:
    """Batched full-scan k-NN → (qid, id, text, score): Q queries
    answered from ONE pass over the embeddings scan (a |Q|-row
    broadcast of query vectors, per-query rank window over the scored
    frame) — the batched-serving twin of vector_topk, per-query
    semantics identical (score desc, id asc on rounded scores;
    dim-mismatched rows skipped, reference app.py:407-408). At 100 TB
    the scan cost is paid once for the whole batch instead of once
    per query — the same amortization bm25_topk_multi pins for BM25.
    """
    from pyspark.sql.window import Window

    qs = embeddings.filter(F.col("node_id").isin(query_ids)).select(
        F.col("node_id").alias("qid"), F.col("vector").alias("qvec")
    )
    scored = (
        embeddings.crossJoin(F.broadcast(qs))
        .filter(F.size("vector") == F.size("qvec"))
        .select(
            "qid",
            F.col("node_id").alias("nid"),
            dot("vector", "qvec").alias("score"),
        )
    )
    if round_scores is not None:
        scored = scored.withColumn("score", F.round("score", round_scores))
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("nid"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= top_k)
        .join(nodes, F.col("nid") == nodes["id"])
        .select("qid", "id", "text", "score")
    )
