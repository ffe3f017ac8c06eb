"""Okapi BM25 scoring as pure DataFrame aggregations.

The reference delegates to ``rank_bm25.BM25Okapi`` with library
defaults (``/root/reference/app.py:460-489``): k1=1.5, b=0.75, and
the Okapi idf ``ln((N - df + 0.5)/(df + 0.5))`` with negative idfs
floored to ``epsilon * average_idf`` (epsilon=0.25, average over ALL
corpus terms' raw idfs). Query tokens are counted with multiplicity.
Note the reference exposes BM25 via no HTTP endpoint and does NOT
fuse it into hybrid (``app.py:670-671``) — it is a standalone
capability, which we implement faithfully.

Spark shape — the index IS two aggregate DataFrames:
``explode(tokens)`` → per-(doc,term) tf + per-doc length, one
``groupBy(term)`` for document frequencies, two single-row global
aggregates (N, avgdl) broadcast back. All map-side-combinable
shuffles on compact keys; scoring a query is one broadcast join of
the (tiny) query-term frame against tf. Unlike the reference's
rebuild-the-whole-index-per-write, these aggregates are recomputed
lazily per query batch — at 100 TB they can be persisted and
incrementally maintained, but semantics stay identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.textfn import tokenize

K1 = 1.5
B = 0.75
EPSILON = 0.25


def corpus_stats(nodes: DataFrame) -> tuple[DataFrame, DataFrame, DataFrame]:
    """→ (tf(id, tok, tf), doclen(id, dl), idf(tok, idf)).

    ``idf`` already has the Okapi negative-flooring applied.
    """
    toks = nodes.select(
        "id", F.explode_outer(tokenize("text")).alias("tok")
    )
    doclen = toks.groupBy("id").agg(F.count("tok").alias("dl"))
    tf = (
        toks.filter(F.col("tok").isNotNull())
        .groupBy("id", "tok")
        .agg(F.count("*").alias("tf"))
    )
    n_docs = nodes.count()
    df_ = tf.groupBy("tok").agg(F.count("*").alias("df"))
    raw = F.log(F.lit(float(n_docs)) - F.col("df") + 0.5) - F.log(
        F.col("df") + 0.5
    )
    with_raw = df_.withColumn("raw_idf", raw)
    avg_idf = with_raw.agg(F.avg("raw_idf").alias("__avg_idf"))
    idf = (
        with_raw.crossJoin(F.broadcast(avg_idf))
        .withColumn(
            "idf",
            F.when(
                F.col("raw_idf") < 0, F.lit(EPSILON) * F.col("__avg_idf")
            ).otherwise(F.col("raw_idf")),
        )
        .select("tok", "idf")
    )
    return tf, doclen, idf


def query_terms_df(nodes: DataFrame, query_text: str) -> DataFrame:
    """Tokenized query with multiplicity → (tok, qcnt), as a plan node."""
    spark = nodes.sparkSession
    toks = [t for t in query_text.lower().split()]
    return (
        spark.createDataFrame([(t,) for t in toks], "tok string")
        .groupBy("tok")
        .agg(F.count("*").alias("qcnt"))
    )


def bm25_scores(nodes: DataFrame, query_text: str) -> DataFrame:
    """Okapi BM25 score of every document → (id, score).

    Documents matching no query term score 0.0 (kept — the top-k
    variant applies the positive filter).
    """
    tf, doclen, idf = corpus_stats(nodes)
    avgdl = doclen.agg(F.avg("dl").alias("__avgdl"))
    q = F.broadcast(query_terms_df(nodes, query_text))

    contrib = (
        tf.join(q, "tok")
        .join(idf, "tok")
        .join(doclen, "id")
        .crossJoin(F.broadcast(avgdl))
        .withColumn(
            "contrib",
            F.col("qcnt")
            * F.col("idf")
            * (F.col("tf") * (K1 + 1))
            / (
                F.col("tf")
                + F.lit(K1)
                * (1 - B + F.lit(B) * F.col("dl") / F.col("__avgdl"))
            ),
        )
        .groupBy("id")
        .agg(F.sum("contrib").alias("score"))
    )
    return (
        nodes.select("id")
        .join(contrib, "id", "left_outer")
        .select("id", F.coalesce("score", F.lit(0.0)).alias("score"))
    )


def bm25_topk(
    nodes: DataFrame,
    query_text: str,
    top_k: int = 10,
    round_scores: int | None = None,
) -> DataFrame:
    """Top-k by BM25, zero/negative scores dropped (``app.py:486``)."""
    scored = bm25_scores(nodes, query_text)
    if round_scores is not None:
        scored = scored.withColumn("score", F.round("score", round_scores))
    return (
        scored.filter(F.col("score") > 0)
        .join(nodes.select("id", "text"), "id")
        .select("id", "text", "score")
        .orderBy(F.desc("score"), F.asc("id"))
        .limit(top_k)
    )
