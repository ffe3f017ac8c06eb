"""Text functions: tokenizer and the hashed bag-of-words embedder.

Tokenization matches Python ``str.split()`` (the reference's
tokenizer, ``app.py:365-366``): split on whitespace runs, drop
empties.

``embed_hash`` is the reference's 256-dim hashed bag-of-words encoder
(``app.py:368-377``) with one deliberate fix (SURVEY.md §4.8.1): the
reference uses process-salted Python ``hash()`` which is NOT
deterministic across runs despite its readme's claim; we use an
md5-prefix bucket — ``int(md5(token)[:8], 16) % dim`` — which Spark,
DuckDB, and any other engine can compute identically. Because
dim=256 divides 2**8, the bucket only depends on hex chars 7-8 of the
prefix, but we keep the full conv() form so any dim works.

All of it is explode/groupBy/higher-order-function work — fully
distributed, no UDFs, map-side partial aggregation on (id, bucket).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EMBED_DIM = 256


def tokenize(col: Column | str) -> Column:
    """Lowercase whitespace tokens, empties dropped (= str.split())."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.lower(c), r"\s+"), lambda t: t != "")


def hash_bucket(tok: Column | str, dim: int = EMBED_DIM) -> Column:
    """Stable token→bucket hash: int(md5(tok)[:8], 16) % dim."""
    c = F.col(tok) if isinstance(tok, str) else tok
    return F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("long") % dim


def embed_hash_df(
    df: DataFrame,
    id_col: str = "id",
    text_col: str = "text",
    dim: int = EMBED_DIM,
) -> DataFrame:
    """(id, text) → (id, vector array<double> L2-normalized, dim).

    Hashed bag-of-words: bucket counts → dense vector → L2 normalize
    (zero vector stays zero). Equivalent to MLlib HashingTF+Normalizer
    but with the portable md5 bucket hash. Two narrow aggregations:
    (id, bucket) counts (map-side combine), then one groupBy(id) that
    assembles the dense vector with ``transform(sequence(...))`` —
    no pivot, no 256-column explosion, scales with rows × distinct
    buckets.

    Documents whose token list is empty produce the zero vector, same
    as the reference encoder.
    """
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode_outer(tokenize(text_col)).alias("tok"),
    )
    counts = (
        toks.withColumn("bucket", hash_bucket("tok", dim))
        .groupBy("id", "bucket")
        .agg(F.count("tok").alias("cnt"))
    )
    dense = (
        counts.groupBy("id")
        .agg(
            F.map_from_entries(
                F.collect_list(
                    F.struct(
                        F.coalesce("bucket", F.lit(0)).alias("k"),
                        F.col("cnt").cast("double").alias("v"),
                    )
                )
            ).alias("m")
        )
        .select(
            "id",
            F.transform(
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda i: F.coalesce(F.element_at("m", i.cast("long")), F.lit(0.0)),
            ).alias("raw"),
        )
    )
    from .vectorfn import l2_normalize

    return dense.select(
        "id", l2_normalize("raw").alias("vector"), F.lit(dim).alias("dim")
    )
