"""Sampling / splitting / chunking operators for training-data pipelines.

Not part of the reference surface (the reference has no sampling of
any kind) — these are the corpus-preparation operators a 100 TB
training pipeline needs. Everything is DETERMINISTIC, keyed on a
stable md5-derived bucket of the row id, so (a) runs are reproducible
across clusters and engines, (b) the DuckDB oracle replays them
bit-for-bit, and (c) re-running on a grown corpus keeps previous
assignments stable (hash-based splits don't reshuffle old rows the
way `df.sample(seed)` does when partitioning changes).

Scale design:
- bucket = md5-prefix of (salt || id) mod 10_000: a narrow projection
  plus a filter — no shuffle at all for `hash_sample` and
  `train_eval_split`; Catalyst evaluates it scan-side.
- stratified_sample: one window (shuffle on the group key) with a
  deterministic (bucket, id) order; skew lives in the group key, so
  groups are the unit of parallelism — fine when groups >> executors.
- chunk_documents: tokenize → per-row chunk-start array → explode.
  Pure per-row work (no shuffle); output size is bounded by
  ceil(n_tok/stride) rows per doc.
- corpus_clean: quality filter (scan-side) → one groupBy on the
  128-bit content hash for keep-min-id dedup → left-semi join back.
  The groupBy is map-side combinable; the semi-join is broadcastable
  when the surviving keeper set is small.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.textfn import tokenize
from .text_analysis import quality_score

BUCKETS = 10_000


def stable_bucket(col, salt: str = "") -> Column:
    """Deterministic bucket in [0, 10000) from md5(salt || id).

    15 hex chars = 60 bits — positive int64 in Spark and DuckDB; the
    oracle twin is ``('0x' || substr(md5(salt || id), 1, 15))::BIGINT
    % 10000``.
    """
    c = F.col(col) if isinstance(col, str) else col
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), c.cast("string"))), 1, 15),
        16,
        10,
    ).cast("long")
    return h % BUCKETS


def hash_sample(
    df: DataFrame, fraction: float, id_col: str = "id", salt: str = "s1"
) -> DataFrame:
    """Deterministic Bernoulli-by-hash sample: keep rows whose bucket
    falls below fraction·10000. Unlike ``df.sample``, membership is a
    pure function of the id — stable across runs, partitionings, and
    engines."""
    return df.filter(stable_bucket(id_col, salt) < int(fraction * BUCKETS))


def train_eval_split(
    df: DataFrame, train_frac: float = 0.9, id_col: str = "id",
    salt: str = "split",
) -> DataFrame:
    """→ (id, split): 'train' | 'eval' assignment by hash threshold."""
    thr = int(train_frac * BUCKETS)
    return df.select(
        F.col(id_col).alias("id"),
        F.when(stable_bucket(id_col, salt) < thr, F.lit("train"))
        .otherwise(F.lit("eval"))
        .alias("split"),
    )


def stratified_sample(
    df: DataFrame,
    group_col: str,
    n_per_group: int,
    id_col: str = "id",
    salt: str = "strat",
) -> DataFrame:
    """Per-group quota sample: the n_per_group rows with the smallest
    (bucket, id) per group — a deterministic uniform draw within each
    stratum. → original columns + rk (1-based rank within group)."""
    w = Window.partitionBy(group_col).orderBy(
        stable_bucket(id_col, salt), F.col(id_col)
    )
    return (
        df.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= n_per_group)
    )


def chunk_documents(
    df: DataFrame,
    size: int = 32,
    stride: int = 24,
    id_col: str = "id",
    text_col: str = "text",
) -> DataFrame:
    """Fixed-size token windows with overlap (training-sample prep).

    → (id, start, chunk_text, n_chunk_tokens): chunks begin at token
    positions 1, 1+stride, … ≤ max(1, n−size+1), plus a final chunk
    clamped to end at the last token so no tail tokens are dropped.
    Requires stride ≤ size for gap-free coverage.
    """
    if stride > size:
        raise ValueError("stride must be <= size for gap-free coverage")
    toks = df.select(
        F.col(id_col).alias("id"), tokenize(text_col).alias("toks")
    )
    last_start = F.greatest(F.lit(1), F.size("toks") - F.lit(size - 1))
    starts = F.array_distinct(
        F.concat(
            F.sequence(F.lit(1), last_start, F.lit(stride)),
            F.array(last_start),
        )
    )
    return (
        toks.select("id", "toks", F.explode(starts).alias("start"))
        .select(
            "id",
            "start",
            F.array_join(
                F.slice("toks", F.col("start"), F.lit(size)), " "
            ).alias("chunk_text"),
            F.size(F.slice("toks", F.col("start"), F.lit(size))).alias(
                "n_chunk_tokens"
            ),
        )
    )


def pps_sample(
    df: DataFrame,
    frac: float = 0.5,
    weight_col: str = "n_chars",
    id_col: str = "id",
    salt: str = "pps",
) -> DataFrame:
    """Probability-proportional-to-size Bernoulli sample →
    (id, weight).

    Row i survives with p_i = frac · w_i / max(w) — the
    length-weighted draw a token-budgeted training mix uses (long
    documents carry more tokens, so equal-probability sampling
    under-represents them). Membership is a pure function of the id
    hash: deterministic across runs, partitionings, and engines, and
    map-only at any scale (one broadcast max).
    """
    mx = df.agg(F.max(weight_col).alias("__mx"))
    return (
        df.crossJoin(F.broadcast(mx))
        .filter(
            stable_bucket(id_col, salt)
            < F.lit(frac * BUCKETS) * F.col(weight_col) / F.col("__mx")
        )
        .select(F.col(id_col).alias("id"), F.col(weight_col).alias("weight"))
    )


def temperature_mix(
    df: DataFrame,
    group_col: str = "lang",
    alpha: float = 0.5,
    budget_frac: float = 0.5,
    id_col: str = "id",
    salt: str = "tmix",
    counts: DataFrame | None = None,
) -> DataFrame:
    """Temperature-scaled mixture sampling → kept rows (id, grp).

    ``counts`` optionally supplies the per-group count frame
    (grp, n_g) from an external source — e.g. the streaming-
    maintained state of ``tmix_incremental_equiv`` — instead of
    recomputing it from ``df``; membership semantics are identical
    because the fractions are a pure function of the counts.

    The multilingual/multi-source rebalancing step every large LM
    mixture runs (the T=1/α sampling of mBERT/XLM-R/mT5): group g
    gets mixture weight p_g ∝ n_g^alpha, so alpha=1 preserves the
    natural distribution, alpha→0 flattens it uniform, and 0<alpha<1
    up-samples the tail relative to the head. With a total budget of
    ``budget_frac``·N rows, group g keeps
    f_g = min(1, budget_frac·N·p_g / n_g) of its rows, drawn by the
    deterministic id-hash bucket (same primitive as ``hash_sample``).

    Scale design: the group-weight frame is |groups| rows from one
    map-side-combinable count, broadcast back onto the corpus —
    membership is then a map-only filter, pure function of the id.
    No shuffle ever touches the full corpus.
    """
    if counts is None:
        counts = df.groupBy(F.col(group_col).alias("grp")).agg(
            F.count("*").alias("n_g")
        )
    tot = counts.agg(
        F.sum("n_g").alias("n"),
        F.sum(F.pow("n_g", F.lit(alpha))).alias("z"),
    )
    fr = counts.crossJoin(F.broadcast(tot)).select(
        "grp",
        F.least(
            F.lit(1.0),
            F.lit(budget_frac)
            * F.col("n")
            * F.pow("n_g", F.lit(alpha))
            / F.col("z")
            / F.col("n_g"),
        ).alias("f"),
    )
    return (
        df.select(F.col(id_col).alias("id"), F.col(group_col).alias("grp"))
        .join(F.broadcast(fr), "grp")
        .filter(stable_bucket("id", salt) < F.col("f") * BUCKETS)
        .select("id", "grp")
    )


def corpus_clean(
    df: DataFrame,
    min_quality: float = 0.5,
    id_col: str = "id",
    text_col: str = "text",
) -> DataFrame:
    """Composed corpus-preparation pipeline: quality gate + exact
    content dedup (keep the min-id representative of each surviving
    text). → (id, n_tokens, quality) of the retained documents."""
    q = quality_score(df, id_col, text_col)
    passing = q.filter(F.col("quality") >= min_quality)
    hashed = (
        df.select(F.col(id_col).alias("id"), F.md5(text_col).alias("th"))
        .join(passing.select("id"), "id", "left_semi")
    )
    keepers = hashed.groupBy("th").agg(F.min("id").alias("id"))
    return passing.join(keepers.select("id"), "id", "left_semi").select(
        "id", "n_tokens", "quality"
    )


def pack_greedy(
    df: DataFrame,
    weight_col: str,
    budget: int,
    n_shards: int = 8,
    id_col: str = "id",
    salt: str = "pack",
) -> DataFrame:
    """Greedy sequential bin packing within hash shards
    → (id, weight, shard, start_offset, bin_id).

    Items are dealt deterministically into ``n_shards`` hash shards,
    ordered within each shard by (hash bucket, id), and laid out
    end-to-end; an item's bin is the one its START offset falls in
    (``start_offset // budget``) — the standard streaming fill rule,
    so a bin overflows by at most one item. Backs both training
    sequence packing (weight = token count, budget = context length)
    and multimodal shard manifests (weight = blob bytes, budget =
    shard size).

    Scale shape: packing is per-shard (one window partitioned by
    shard — parallel across shards, never a global single-reducer
    sort); determinism comes from the md5 deal + ordering, so any
    cluster layout reproduces the identical manifest.
    """
    d = df.select(
        F.col(id_col).alias("id"),
        F.col(weight_col).cast("long").alias("weight"),
    ).withColumn("__bkt", stable_bucket("id", salt))
    d = d.withColumn(
        "shard", (F.col("__bkt") % F.lit(n_shards)).cast("int")
    )
    w = Window.partitionBy("shard").orderBy("__bkt", "id")
    start = F.coalesce(
        F.sum("weight").over(
            w.rowsBetween(Window.unboundedPreceding, -1)
        ),
        F.lit(0).cast("long"),
    )
    return (
        d.withColumn("start_offset", start)
        .withColumn(
            "bin_id", F.floor(F.col("start_offset") / F.lit(budget)).cast("long")
        )
        .select("id", "weight", "shard", "start_offset", "bin_id")
    )


def balanced_downsample(
    df: DataFrame,
    class_col: str,
    id_col: str = "id",
    salt: str = "bal",
) -> DataFrame:
    """Class-balanced downsample → original columns + rk: every class
    capped at the size of the SMALLEST class, members chosen by the
    deterministic (md5-bucket, id) order — the majority-class
    rebalancer a training mix runs before loss weighting is even
    considered (contrast stratified_sample's fixed quota: here the
    quota is data-derived).

    Scale shape: class sizes are a class-cardinality aggregate whose
    1-row minimum broadcasts back (never a driver collect); the cap
    itself is the same single-shuffle per-class row_number window as
    stratified_sample. Skewed majority classes are exactly the case
    AQE's skew-split handles on the window exchange.
    """
    sizes = df.groupBy(class_col).agg(F.count("*").alias("__n"))
    min_n = sizes.agg(F.min("__n").alias("__min_n"))
    w = Window.partitionBy(class_col).orderBy(
        stable_bucket(id_col, salt), F.col(id_col)
    )
    return (
        df.withColumn("rk", F.row_number().over(w))
        .crossJoin(F.broadcast(min_n))
        .filter(F.col("rk") <= F.col("__min_n"))
        .drop("__min_n")
    )


def group_holdout_report(
    df: DataFrame,
    unit_col: str,
    group_col: str,
    train_frac: float = 0.9,
    salt: str = "gsplit",
) -> DataFrame:
    """Leak-proof holdout audit → (method, side, n_events, n_units,
    n_leaky_groups): the SAME deterministic hash split run two ways —
    naive (hash the row id) vs grouped (hash the GROUP id, e.g. user
    or document) — with the leakage each produces measured in-frame.

    A naive row-level split puts one user's history on both sides of
    the train/eval boundary, and any model that memorizes users reads
    the eval answer out of train (the classic leakage bug a 100 TB
    pipeline cannot eyeball). Hashing the group key instead sends
    EVERY row of a group to one side — a pure function of the group,
    no coordination, no shuffle beyond the counting aggregates —
    making n_leaky_groups 0 by construction, which this report
    witnesses next to the naive split's nonzero count. Same
    md5-bucket assignment as hash_sample/train_eval_split, so the
    split this audits is the split the engine actually ships."""
    thr = int(train_frac * BUCKETS)

    def labeled(method: str, key_col: str) -> DataFrame:
        return df.select(
            F.lit(method).alias("method"),
            F.when(
                stable_bucket(F.col(key_col), salt) < thr, F.lit("train")
            )
            .otherwise(F.lit("eval"))
            .alias("side"),
            F.col(unit_col).alias("unit"),
            F.col(group_col).alias("grp"),
        )

    lab = labeled("naive_by_row", unit_col).unionByName(
        labeled("group_by_key", group_col)
    )
    per_side = lab.groupBy("method", "side").agg(
        F.count("*").alias("n_events"),
        F.countDistinct("grp").alias("n_units"),
    )
    leaky = (
        lab.select("method", "grp", "side")
        .distinct()
        .groupBy("method", "grp")
        .agg(F.countDistinct("side").alias("ns"))
        .filter(F.col("ns") == 2)
        .groupBy("method")
        .agg(F.count("*").alias("n_leaky_groups"))
    )
    return (
        per_side.join(F.broadcast(leaky), "method", "left")
        .select(
            "method",
            "side",
            "n_events",
            "n_units",
            F.coalesce("n_leaky_groups", F.lit(0)).alias(
                "n_leaky_groups"
            ),
        )
    )
