"""Adapters mapping harness tables onto the engine's data model.

Engine model (SURVEY.md §1.4, mirroring the reference's three SQLite
tables at ``/root/reference/app.py:84-124``):

- ``nodes(id string, text string, metadata map<string,string>)``
- ``embeddings(node_id string, vector array<float>, dim int)``
- ``edges(id string, src string, dst string, type string, weight double)``

``nodes``/``embeddings`` come from the driver's ``documents`` /
``embeddings`` parquet. ``edges`` is derived deterministically from
doc_ids by the FIXTURES.md rule (chain + typed star + back-edge
cycles) so any party — Spark here, the DuckDB oracle in
``__spark_entry__.py`` — regenerates the identical edge set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .loaders import load_table


def nodes_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → nodes(id, text, metadata, n_chars).

    ``metadata`` keeps the reference's schemaless string→string map
    (``app.py:60``); ``lang``/``source`` are also left as flat columns
    so Catalyst can push metadata-equality filters into the parquet
    scan instead of evaluating map lookups post-scan.
    """
    return load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("string").alias("id"),
        "text",
        F.create_map(
            F.lit("lang"), F.col("lang"), F.lit("source"), F.col("source")
        ).alias("metadata"),
        "lang",
        "source",
        "n_chars",
    )


def embeddings_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """embeddings → embeddings(node_id, vector, dim).

    ``array<float>`` (not MLlib VectorUDT) so the higher-order
    functions (`zip_with`, `aggregate`, `transform`) do all vector
    math JVM-side; ``dim`` is stored per row like the reference
    (``app.py:100-107``) and mismatches are skipped at query time.
    """
    return load_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").cast("string").alias("node_id"),
        F.col("embedding").alias("vector"),
        F.size("embedding").alias("dim"),
    )


def edges_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic edges from doc_ids (FIXTURES.md §1):

    - chain:  i → i+1          type='cites'      weight=1.0 + (i % 5)
    - star:   i → i+{2,3}      type='author_of'  weight=2.0   (i % 10 == 0)
    - cycle:  i+1 → i          type='related'    weight=0.5   (i % 7 == 0)

    Presence of the far endpoint is checked with a left-semi self-join
    (same as the oracle's EXISTS); ids are compact so this is a cheap
    co-partitioned join, and at cluster scale it shuffles on the join
    key only once per branch.
    """
    ids = load_table(spark, sf_dir, "documents").select("doc_id")

    def present(df: DataFrame, target_col: str) -> DataFrame:
        return df.join(
            ids.select(F.col("doc_id").alias("__t")),
            F.col(target_col) == F.col("__t"),
            "left_semi",
        )

    chain = present(ids.withColumn("__dst", F.col("doc_id") + 1), "__dst").select(
        F.concat(F.lit("e-"), "doc_id", F.lit("-"), "__dst").alias("id"),
        F.col("doc_id").cast("string").alias("src"),
        F.col("__dst").cast("string").alias("dst"),
        F.lit("cites").alias("type"),
        (F.lit(1.0) + (F.col("doc_id") % 5).cast("double")).alias("weight"),
    )

    star = present(
        ids.filter(F.col("doc_id") % 10 == 0)
        .withColumn("__j", F.explode(F.array(F.lit(2), F.lit(3))))
        .withColumn("__dst", F.col("doc_id") + F.col("__j")),
        "__dst",
    ).select(
        F.concat(F.lit("e-"), "doc_id", F.lit("-"), "__dst").alias("id"),
        F.col("doc_id").cast("string").alias("src"),
        F.col("__dst").cast("string").alias("dst"),
        F.lit("author_of").alias("type"),
        F.lit(2.0).alias("weight"),
    )

    cycle = present(
        ids.filter(F.col("doc_id") % 7 == 0).withColumn("__src", F.col("doc_id") + 1),
        "__src",
    ).select(
        F.concat(F.lit("e-"), "__src", F.lit("-"), "doc_id").alias("id"),
        F.col("__src").cast("string").alias("src"),
        F.col("doc_id").cast("string").alias("dst"),
        F.lit("related").alias("type"),
        F.lit(0.5).alias("weight"),
    )

    return chain.unionByName(star).unionByName(cycle)
