"""Portable approximate-aggregate sketches.

Engine-native sketches (Spark HLL++ via ``approx_count_distinct``,
DuckDB's HLL) give no cross-engine parity — their estimates differ by
design, so they can only ever get a rows-only check. The KMV
(k-minimum-values) distinct sketch here is built on the same stable
md5-derived hash as the dedup/LSH operators, so Spark and the DuckDB
oracle compute bit-identical estimates: u = hash(value)/2^60 ∈ (0,1);
keep the k smallest u per group; if fewer than k values were seen the
count is exact, else estimate (k−1)/u_k (the classic KMV estimator,
Bar-Yossef et al. 2002). Standard error ≈ 1/√(k−2).

Scale design: the distinct + per-group window shuffles on
(group, value) then group — at 100 TB the same estimator is
map-side combinable (per-partition min-k arrays merged by a
commutative "merge two sorted top-k lists" agg); the windowed form
keeps the exact same semantics and oracle, which is what this
module pins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .dedup import stable_hash60

TWO_60 = float(1 << 60)


def kmv_distinct(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: int = 64,
    salt: str = "kmv",
) -> DataFrame:
    """→ (group, est_distinct, exact_distinct) per group.

    est_distinct is the KMV estimate from the k smallest hashes;
    exact_distinct rides along so consumers (and the bench) can see
    the realized error. Deterministic: same data → same estimate, on
    any engine that computes md5.
    """
    pairs = df.select(group_col, value_col).distinct()
    u = (
        stable_hash60(
            F.concat(F.lit(salt), F.col(value_col).cast("string"))
        )
        / F.lit(TWO_60)
    )
    w = Window.partitionBy(group_col).orderBy("u")
    kept = (
        pairs.withColumn("u", u)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
    )
    est = kept.groupBy(group_col).agg(
        F.count("*").alias("n_kept"), F.max("u").alias("u_k")
    )
    exact = pairs.groupBy(group_col).agg(
        F.count("*").alias("exact_distinct")
    )
    est_col = F.when(
        F.col("n_kept") < k, F.col("n_kept").cast("double")
    ).otherwise(F.lit(float(k - 1)) / F.col("u_k"))
    return (
        est.join(exact, group_col)
        .select(
            group_col,
            (F.floor(est_col * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)).alias(
                "est_distinct"
            ),
            "exact_distinct",
        )
    )
