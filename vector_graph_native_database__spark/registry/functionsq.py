"""Scalar / vector / text function battery (SURVEY §2.3)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import (
    cosine,
    dot,
    hash_bucket,
    l2_norm,
    l2_normalize,
    minmax_normalize,
    tokenize,
)
from ..operators.vector_search import score_embeddings
from .common import (
    ORACLE_PRELUDE,
    SQL_SCORED,
    SQL_TOKENS,
    model,
    query_vec,
    stable_round6,
)

_TOK = SQL_TOKENS.format(col="text")


def q_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(id, tok, cnt) — whitespace tokens with multiplicity."""
    nodes, _, _ = model(spark, sf_dir)
    return (
        nodes.select("id", F.explode(tokenize("text")).alias("tok"))
        .groupBy("id", "tok")
        .agg(F.count("*").alias("cnt"))
    )


def q_embed_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §2.3 embed_batch (``encode_batch``, app.py:379-380): the
    per-text encoder applied over a whole DataFrame — in Spark the
    batch form IS the operator. Output: per-doc vector L2 norm and
    nonzero-component count (scalar projections of the batch result
    so the value hash stays compact)."""
    from ..functions.textfn import embed_hash_df

    nodes, _, _ = model(spark, sf_dir)
    emb = embed_hash_df(nodes)
    return emb.select(
        "id",
        F.round(
            F.sqrt(
                F.aggregate(
                    "vector", F.lit(0.0), lambda a, x: a + x * x
                )
            ),
            6,
        ).alias("l2"),
        F.size(F.filter("vector", lambda x: x != 0)).alias("nnz"),
    )


def q_embed_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(id, bucket, val) — nonzero components of the L2-normalized
    256-dim hashed bag-of-words embedding (stable md5 bucket hash,
    SURVEY §4.8.1 — NOT the reference's process-salted hash())."""
    nodes, _, _ = model(spark, sf_dir)
    counts = (
        nodes.select("id", F.explode(tokenize("text")).alias("tok"))
        .withColumn("bucket", hash_bucket("tok"))
        .groupBy("id", "bucket")
        .agg(F.count("*").cast("double").alias("cnt"))
    )
    norms = counts.groupBy("id").agg(
        F.sqrt(F.sum(F.col("cnt") * F.col("cnt"))).alias("nrm")
    )
    return counts.join(norms, "id").select(
        "id", "bucket", F.round(F.col("cnt") / F.col("nrm"), 6).alias("val")
    )


def q_l2_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signature check: normalize 2·v, report component sum + norm."""
    _, emb, _ = model(spark, sf_dir)
    doubled = emb.select(
        "node_id",
        F.transform(F.col("vector").cast("array<double>"), lambda x: x * 2).alias("v"),
    )
    normed = doubled.select("node_id", l2_normalize("v").alias("nv"))
    return normed.select(
        "node_id",
        F.round(F.aggregate("nv", F.lit(0.0), lambda a, x: a + x), 6).alias(
            "comp_sum"
        ),
        F.round(l2_norm("nv"), 6).alias("norm"),
    )


def q_dot_product(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dot product of consecutive-id embedding pairs."""
    _, emb, _ = model(spark, sf_dir)
    a = emb.select(
        F.col("node_id").alias("id_a"),
        F.col("node_id").cast("long").alias("k"),
        F.col("vector").alias("va"),
    )
    b = emb.select(
        F.col("node_id").alias("id_b"),
        (F.col("node_id").cast("long") - 1).alias("k"),
        F.col("vector").alias("vb"),
    )
    return a.join(b, "k").select(
        "id_a", "id_b", F.round(dot("va", "vb"), 6).alias("dot")
    )


def q_cosine_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    _, emb, _ = model(spark, sf_dir)
    a = emb.select(
        F.col("node_id").alias("id_a"),
        F.col("node_id").cast("long").alias("k"),
        F.col("vector").alias("va"),
    )
    b = emb.select(
        F.col("node_id").alias("id_b"),
        (F.col("node_id").cast("long") - 1).alias("k"),
        F.col("vector").alias("vb"),
    )
    return a.join(b, "k").select(
        "id_a", "id_b", F.round(cosine("va", "vb"), 6).alias("cos")
    )


def q_minmax_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Min-max over the corpus's dot scores vs the node-0 query."""
    _, emb, _ = model(spark, sf_dir)
    scored = score_embeddings(emb, query_vec(spark, sf_dir)).select(
        F.col("node_id").alias("id"), "score"
    )
    return minmax_normalize(scored, "score", "norm_score").select(
        "id", F.round("norm_score", 6).alias("norm_score")
    )


def q_score_positive_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    _, emb, _ = model(spark, sf_dir)
    return (
        score_embeddings(emb, query_vec(spark, sf_dir))
        .filter(F.col("score") > 0)
        .select(F.col("node_id").alias("id"), F.round("score", 6).alias("score"))
    )


def q_json_metadata_codec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map → JSON at the storage boundary (``app.py:134,152,177``)."""
    nodes, _, _ = model(spark, sf_dir)
    return nodes.select("id", F.to_json("metadata").alias("meta_json"))


def q_id_gen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic content-derived ids: ``node-<md5(id)>``.

    SURVEY §4.8.7: the reference's timestamp ids (``app.py:756``) are
    collision-prone and nondeterministic; random UUIDs fix collisions
    but cannot be value-checked. Hash-derived ids are collision-safe
    AND replayable by the DuckDB oracle, so the operator gets a full
    hash check instead of a rows-only pass."""
    nodes, _, _ = model(spark, sf_dir)
    return nodes.select(
        "id", F.concat(F.lit("node-"), F.md5(F.col("id"))).alias("gen_id")
    )


def q_vec_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 scalar quantization of the embedding store —
    4× compression for the 100 TB vector tier; codes engine-portable
    via the floor(x+0.5) IEEE rounding trick. Output is flattened to
    scalar rows (node_id, scale, idx, code) — complex-typed columns
    are banned from registry outputs (driver canonicalizer sorts with
    pandas, which cannot order lists)."""
    from ..functions.vectorfn import quantize_int8

    _, emb, _ = model(spark, sf_dir)
    scale, q = quantize_int8("vector")
    return emb.select(
        "node_id", stable_round6(scale).alias("scale"), q.alias("qvec")
    ).select("node_id", "scale", F.posexplode("qvec").alias("idx", "code"))


QUERIES = {
    "vec_quantize_int8": q_vec_quantize_int8,
    "tokenize": q_tokenize,
    "embed_hash": q_embed_hash,
    "embed_batch": q_embed_batch,
    "l2_normalize": q_l2_normalize,
    "dot_product": q_dot_product,
    "cosine_similarity": q_cosine_similarity,
    "minmax_normalize": q_minmax_normalize,
    "score_positive_filter": q_score_positive_filter,
    "json_metadata_codec": q_json_metadata_codec,
    "id_gen": q_id_gen,
}

ORACLES = {
    "vec_quantize_int8": ORACLE_PRELUDE
    + """,
dv AS (
  SELECT node_id, CAST(vector AS DOUBLE[]) AS v,
         list_max(list_transform(CAST(vector AS DOUBLE[]),
                                 x -> abs(x))) AS scale
  FROM emb
)
SELECT node_id,
       floor(scale * 1000000.0 + 0.5) / 1000000.0 AS scale,
       i.i - 1 AS idx,
       CASE WHEN scale = 0 THEN 0
            ELSE CAST(floor(v[i.i] * 127.0 / scale + 0.5) AS INT) END
         AS code
FROM dv CROSS JOIN LATERAL
  (SELECT unnest(generate_series(1, len(v))) AS i) i""",
    "tokenize": ORACLE_PRELUDE
    + f""",
toks AS (SELECT id, unnest({_TOK}) AS tok FROM nodes)
SELECT id, tok, count(*) AS cnt FROM toks GROUP BY id, tok ORDER BY id, tok""",
    "embed_batch": ORACLE_PRELUDE
    + f""",
toks AS (SELECT id, unnest({_TOK}) AS tok FROM nodes),
cnts AS (
  SELECT id, ('0x' || substr(md5(tok), 1, 8))::BIGINT % 256 AS bucket,
         CAST(count(*) AS DOUBLE) AS cnt
  FROM toks GROUP BY 1, 2
),
agg AS (
  SELECT id, sqrt(sum(cnt * cnt)) AS nrm, count(*) AS nnz
  FROM cnts GROUP BY id
)
SELECT n.id,
       round(CASE WHEN a.nrm IS NULL OR a.nrm = 0 THEN 0.0 ELSE 1.0 END, 6)
         AS l2,
       CAST(coalesce(a.nnz, 0) AS INT) AS nnz
FROM nodes n LEFT JOIN agg a ON a.id = n.id""",
    "embed_hash": ORACLE_PRELUDE
    + f""",
toks AS (SELECT id, unnest({_TOK}) AS tok FROM nodes),
cnts AS (
  SELECT id, ('0x' || substr(md5(tok), 1, 8))::BIGINT % 256 AS bucket,
         CAST(count(*) AS DOUBLE) AS cnt
  FROM toks GROUP BY 1, 2
),
nrm AS (SELECT id, sqrt(sum(cnt * cnt)) AS nrm FROM cnts GROUP BY id)
SELECT c.id, c.bucket, round(c.cnt / n.nrm, 6) AS val
FROM cnts c JOIN nrm n ON n.id = c.id ORDER BY c.id, c.bucket""",
    "l2_normalize": ORACLE_PRELUDE
    + """,
dv AS (
  SELECT node_id,
         list_transform(CAST(vector AS DOUBLE[]), x -> x * 2) AS v
  FROM emb
),
nn AS (SELECT node_id, v, sqrt(list_dot_product(v, v)) AS n FROM dv)
SELECT node_id,
       round(CASE WHEN n > 0
             THEN list_sum(list_transform(v, x -> x / n)) ELSE 0.0 END, 6)
         AS comp_sum,
       round(CASE WHEN n > 0 THEN sqrt(list_dot_product(
             list_transform(v, x -> x / n), list_transform(v, x -> x / n)))
             ELSE 0.0 END, 6) AS norm
FROM nn ORDER BY node_id""",
    "dot_product": ORACLE_PRELUDE
    + """
SELECT a.node_id AS id_a, b.node_id AS id_b,
       round(list_dot_product(CAST(a.vector AS DOUBLE[]),
                              CAST(b.vector AS DOUBLE[])), 6) AS dot
FROM emb a JOIN emb b
  ON CAST(b.node_id AS BIGINT) = CAST(a.node_id AS BIGINT) + 1
ORDER BY id_a""",
    "cosine_similarity": ORACLE_PRELUDE
    + """
SELECT a.node_id AS id_a, b.node_id AS id_b,
       round(CASE WHEN na > 0 AND nb > 0 THEN d / (na * nb) ELSE 0.0 END, 6)
         AS cos
FROM (
  SELECT a.node_id, a.vector,
         sqrt(list_dot_product(CAST(a.vector AS DOUBLE[]),
                               CAST(a.vector AS DOUBLE[]))) AS na
  FROM emb a
) a
JOIN (
  SELECT node_id, vector,
         sqrt(list_dot_product(CAST(vector AS DOUBLE[]),
                               CAST(vector AS DOUBLE[]))) AS nb
  FROM emb
) b ON CAST(b.node_id AS BIGINT) = CAST(a.node_id AS BIGINT) + 1
CROSS JOIN LATERAL (
  SELECT list_dot_product(CAST(a.vector AS DOUBLE[]),
                          CAST(b.vector AS DOUBLE[])) AS d
) t
ORDER BY id_a""",
    "minmax_normalize": ORACLE_PRELUDE
    + SQL_SCORED
    + """,
bounds AS (SELECT min(score) AS mn, max(score) AS mx FROM scored)
SELECT s.id,
       round(CASE WHEN b.mx = b.mn THEN 1.0
             ELSE (s.score - b.mn) / (b.mx - b.mn) END, 6) AS norm_score
FROM scored s, bounds b ORDER BY s.id""",
    "score_positive_filter": ORACLE_PRELUDE
    + SQL_SCORED
    + """
SELECT id, round(score, 6) AS score FROM scored WHERE score > 0 ORDER BY id""",
    "json_metadata_codec": ORACLE_PRELUDE
    + """
SELECT id, '{"lang":"' || lang || '","source":"' || source || '"}' AS meta_json
FROM nodes ORDER BY id""",
    "id_gen": ORACLE_PRELUDE
    + """
SELECT id, 'node-' || md5(id) AS gen_id FROM nodes ORDER BY id""",
}
