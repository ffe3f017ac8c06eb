"""Corpus-curation operators for large-scale training-data pipelines.

Not part of the reference surface — these extend the dedup/text
families (BASELINE.json north star) with the steps a real pretraining
corpus build runs between "near-dup pairs found" and "corpus shipped":

- dedup cluster assignment: near-dup PAIRS → duplicate CLUSTERS
  (connected components over the pair graph) → one canonical keeper
  per cluster. Pairs alone don't dedup a corpus; transitive closure
  does.
- eval-set decontamination: flag training documents that share k-token
  shingles with a held-out eval split (the n-gram-overlap check every
  published pretraining pipeline runs before training).
- corpus unigram log-prob: score each document by the mean log
  probability of its tokens under the corpus unigram LM (the cheap
  perplexity proxy used for quality filtering).

Scale design: every op is shuffle-minimal — shingle joins are
equi-joins on a 60-bit hash (never on raw strings, never all-pairs);
cluster assignment reuses the pointer-jumping components operator
(O(log diameter) rounds); the unigram LM is one vocabulary aggregate
joined back by token hash. All hashing is md5-derived so the DuckDB
oracle replays bit-for-bit. (Per-source quota sampling already lives
in operators/sampling.py as ``stratified_sample``.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.textfn import tokenize
from .analytics import connected_components
from .dedup import minhash_lsh_dedup, shingles, stable_hash60


def dedup_cluster_assign(
    df: DataFrame,
    id_col: str = "id",
    text_col: str = "text",
    threshold: float = 0.8,
    index=None,
) -> DataFrame:
    """Near-dup pairs → duplicate clusters → (id, cluster, keep).

    MinHash-LSH pairs (verified Jaccard ≥ threshold) form an
    undirected graph; connected components assign each involved doc
    its cluster id (= min doc id in the component, string order); the
    canonical keeper is the doc equal to its cluster id. Docs in no
    pair are untouched (not emitted — they are all keepers).

    Pointer-jumping components converge in O(log diameter) rounds, so
    even pathological duplicate chains (quote-of-quote-of-quote) cost
    ~6 rounds at 100 TB, each one equi-join shuffle.
    """
    pairs = minhash_lsh_dedup(
        df, id_col, text_col, threshold=threshold, index=index
    )
    return cluster_from_pairs(pairs)


def cluster_from_pairs(pairs: DataFrame) -> DataFrame:
    """(id_a, id_b) near-dup pairs → (id, cluster, keep).

    Takes ANY pair frame — a deployment persists the pair output of
    its dedup pass and feeds it here directly, paying only the
    component rounds instead of recomputing signatures."""
    edges = pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    verts = (
        edges.select(F.col("src").alias("id"))
        .union(edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    comp = connected_components(verts, edges)
    return comp.select(
        "id",
        F.col("component").alias("cluster"),
        (F.col("id") == F.col("component")).cast("int").alias("keep"),
    )


def decontaminate(
    df: DataFrame,
    id_col: str = "id",
    text_col: str = "text",
    k: int = 3,
    eval_mod: int = 41,
    sh: DataFrame | None = None,
) -> DataFrame:
    """Flag train docs sharing k-token shingles with the eval split
    → (id, shared_shingles, eval_docs).

    The eval split is the deterministic holdout ``try_cast(doc_id as
    int) % eval_mod == 0``; a doc whose id is non-numeric casts to
    NULL and deterministically lands on the TRAIN side (coalesce to
    false), so it is still checked for contamination rather than
    silently vanishing from both splits. (``split_train_eval`` uses a
    different rule — an md5 hash-bucket threshold — so the two splits
    are intentionally independent.) A train doc is contaminated when
    any distinct k-shingle of it appears in any eval doc. Output
    counts the distinct shared shingles and the number of eval docs
    hit.

    The join key is the 60-bit shingle hash, not the shingle string —
    at 100 TB that shrinks shuffle width ~10× and the eval side
    (shingles of the holdout, ~1/eval_mod of the corpus) stays small
    enough that AQE picks a broadcast. One equi-join, no all-pairs.
    Pass ``sh`` (a prebuilt — e.g. staged — (id, shingle) frame for
    ``df``, same k) to skip the in-plan tokenize.
    """
    if sh is None:
        sh = shingles(df, id_col, text_col, k)
    sh = sh.withColumn("h", stable_hash60("shingle"))
    is_eval = F.coalesce(
        F.col("id").try_cast("int") % eval_mod == 0, F.lit(False)
    )
    ev = sh.filter(is_eval).select(F.col("id").alias("eval_id"), "h").distinct()
    tr = sh.filter(~is_eval).select("id", "h")
    return (
        tr.join(ev, "h")
        .groupBy("id")
        .agg(
            F.countDistinct("h").alias("shared_shingles"),
            F.countDistinct("eval_id").alias("eval_docs"),
        )
    )


def unigram_logprob(
    df: DataFrame, id_col: str = "id", text_col: str = "text"
) -> DataFrame:
    """Mean corpus-unigram log-probability per document
    → (id, n_tokens, avg_logprob).

    The corpus unigram LM is the vocabulary count table normalized by
    total token count; a document's score is the mean ln p(token).
    Low scores = rare-token-heavy docs (a cheap perplexity proxy for
    quality filtering). Two aggregates and one equi-join on the token
    hash: the vocabulary frame is vocabulary-sized (≪ corpus) and
    broadcast-eligible; the total-count frame is one row.
    """
    toks = df.select(
        F.col(id_col).alias("id"), F.explode(tokenize(text_col)).alias("tok")
    ).withColumn("h", stable_hash60("tok"))
    vocab = toks.groupBy("h").agg(F.count("*").alias("cnt"))
    total = vocab.agg(F.sum("cnt").alias("n_total"))
    return (
        toks.join(vocab, "h")
        .crossJoin(F.broadcast(total))
        .groupBy("id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.avg(F.log(F.col("cnt") / F.col("n_total"))).alias("lp"),
        )
        .select(
            "id",
            "n_tokens",
            (F.floor(F.col("lp") * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)).alias(
                "avg_logprob"
            ),
        )
    )


def dsir_importance(
    df: DataFrame,
    target,
    n_buckets: int = 64,
    id_col: str = "id",
    text_col: str = "text",
) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling") over hashed unigram
    features → (id, n_tokens, logw).

    ``target`` is a document-level boolean Column selecting the slice
    whose distribution the corpus should be resampled TOWARD (e.g. a
    curated source). Tokens hash into ``n_buckets`` features; two
    add-one-smoothed unigram LMs are fit over the buckets — p_target
    and p_raw — and a document's importance weight is

        logw(d) = Σ_tok  ln p_target(bucket(tok)) − ln p_raw(bucket(tok))
                = Σ_b    count_d(b) · Δ(b)

    High-logw documents look like the target slice; resampling by
    exp(logw) shifts the corpus mixture toward it without a trained
    classifier.

    Scale design: the feature-LM frame is ``n_buckets`` rows — built
    with ONE map-side-combinable aggregate over the token stream
    (conditional sums for target/raw in the same pass) and broadcast
    back. Per-doc scoring is groupBy (id, bucket) count → broadcast
    join → groupBy id: the only shuffles are keyed by doc id, never
    by token, and nothing is all-pairs. md5-derived bucketing makes
    the DuckDB oracle replay bit-for-bit.
    """
    toks = df.select(
        F.col(id_col).alias("id"),
        target.cast("int").alias("is_t"),
        F.explode(tokenize(text_col)).alias("tok"),
    ).withColumn("b", stable_hash60("tok") % n_buckets)
    stats = toks.groupBy("b").agg(
        F.sum("is_t").alias("ct"), F.count("*").alias("cr")
    )
    totals = stats.agg(
        F.sum("ct").alias("tt"), F.sum("cr").alias("tr")
    )
    delta = (
        stats.crossJoin(F.broadcast(totals))
        .select(
            "b",
            (
                F.log((F.col("ct") + 1) / (F.col("tt") + n_buckets))
                - F.log((F.col("cr") + 1) / (F.col("tr") + n_buckets))
            ).alias("delta"),
        )
    )
    per_bucket = toks.groupBy("id", "b").agg(F.count("*").alias("cnt"))
    return (
        per_bucket.join(F.broadcast(delta), "b")
        .groupBy("id")
        .agg(
            F.sum("cnt").alias("n_tokens"),
            (
                F.floor(
                    F.sum(F.col("cnt") * F.col("delta")) * F.lit(1e6)
                    + F.lit(0.5)
                )
                / F.lit(1e6)
            ).alias("logw"),
        )
    )


def dsir_resample_topk(
    df: DataFrame,
    target,
    n_keep: int = 100,
    n_buckets: int = 64,
    id_col: str = "id",
    text_col: str = "text",
    salt: str = "gum",
) -> DataFrame:
    """The resampling step on top of ``dsir_importance``: Gumbel
    top-k sampling without replacement → (id, logw, key), the
    ``n_keep`` selected documents.

    Sampling proportional-to-weight without replacement is exactly
    top-k over perturbed keys (the Gumbel-max trick):
    key_i = logw_i + G_i with G_i = −ln(−ln(u_i)) and u_i a uniform
    draw — here the deterministic id-hash bucket mapped to (0, 1), so
    the "randomness" replays in the oracle and across cluster runs.
    The selection is one TakeOrderedAndProject over the weight frame
    (keys rounded to 6dp before ordering, id tie-break): no sort of
    the corpus, no sequential draw loop — the only way
    without-replacement weighted sampling scales to 100 TB.
    """
    from .sampling import stable_bucket

    w = dsir_importance(df, target, n_buckets, id_col, text_col)
    u = (stable_bucket("id", salt) + F.lit(0.5)) / F.lit(10000.0)
    key = F.col("logw") + -F.log(-F.log(u))
    return (
        w.select(
            "id",
            "logw",
            (F.floor(key * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)).alias(
                "key"
            ),
        )
        .orderBy(F.desc("key"), "id")
        .limit(n_keep)
    )


def centroids_by_group(
    emb: DataFrame,
    labels: DataFrame,
    label_col: str = "lang",
    dim: int = 64,
) -> DataFrame:
    """Element-wise mean embedding per label → (label, idx, centroid).

    ``labels`` maps node_id → label (e.g. the documents' lang
    column). Exploding to (label, idx, value) rows keeps the
    aggregation a plain scalar groupBy — map-side combinable, no
    array state — and the output driver-canonicalizable. At 100 TB
    this is the canonical per-class summary: one shuffle keyed by
    (label, idx), |labels|·dim output rows."""
    joined = emb.filter(F.size("vector") == dim).join(
        labels.select(F.col("id").alias("node_id"), F.col(label_col).alias("label")),
        "node_id",
    )
    return (
        joined.select("label", F.posexplode("vector").alias("idx", "v"))
        .groupBy("label", "idx")
        .agg(
            (F.floor(F.avg("v") * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)).alias(
                "centroid"
            )
        )
    )


def keep_best_per_cluster(
    clusters: DataFrame, quality: DataFrame, score_col: str = "quality"
) -> DataFrame:
    """Duplicate clusters × quality scores → one representative per
    cluster: (cluster, best_id, best_quality, n_members).

    The min-id keeper rule (``dedup_cluster_assign``) is arbitrary;
    real pipelines keep the HIGHEST-QUALITY member of each duplicate
    cluster. One window over the cluster partitioning computes both
    the argmax (row_number over rounded score desc, id asc — the
    6dp-rounded score makes the ordering engine-portable) and the
    cluster size. Cluster count ≪ corpus, so this is a small-frame
    op regardless of corpus scale."""
    from pyspark.sql import Window

    j = clusters.select("id", "cluster").join(
        quality.select("id", F.col(score_col).alias("q")), "id"
    )
    w = Window.partitionBy("cluster")
    wr = w.orderBy(F.desc("q"), F.asc("id"))
    return (
        j.withColumn("rk", F.row_number().over(wr))
        .withColumn("n_members", F.count("*").over(w))
        .filter(F.col("rk") == 1)
        .select(
            "cluster",
            F.col("id").alias("best_id"),
            F.col("q").alias("best_quality"),
            "n_members",
        )
    )


def pca_pc1(
    emb: DataFrame, dim: int = 64, iterations: int = 5
) -> DataFrame:
    """First principal component of the embedding matrix via power
    iteration → (idx, loading), sign-normalized, 6dp.

    Each iteration multiplies the (uncentered-scale) covariance by
    the current direction WITHOUT materializing the d×d matrix:
    ``p = Σ_rows xc·(xc⊤v)`` is one map-side-combinable aggregate
    producing ``dim`` sums — a single pass over the data per
    iteration, no explode, no shuffle of row-level state. The
    direction ``v`` lives in a 1-row broadcast frame (never
    collected), mean-centering broadcasts the 1-row mean the same
    way, so the whole loop is iterations × (scan + tree-aggregate):
    the textbook distributed power method, linear in rows at 100 TB.

    The fixed iteration count and deterministic start vector
    (1/√dim each) make the DuckDB twin an exact unrolled-CTE replay.
    Sign is fixed by making the largest-|loading| element (lowest
    index on ties) positive — stable under the cross-engine
    summation-order drift that the 6dp rounding absorbs.
    """
    xc, v = _power_direction(emb, dim, iterations)
    signed = v.select(
        "varr",
        F.array_max(F.transform("varr", F.abs)).alias("refabs"),
    ).select(
        "varr",
        F.when(
            F.get(
                F.filter("varr", lambda e: F.abs(e) == F.col("refabs")), 0
            )
            >= 0,
            F.lit(1.0),
        )
        .otherwise(F.lit(-1.0))
        .alias("sgn"),
    )
    return signed.select(
        F.posexplode(
            F.transform(
                "varr",
                lambda e: F.floor(e * F.col("sgn") * F.lit(1e6) + F.lit(0.5))
                / F.lit(1e6),
            )
        ).alias("idx", "loading")
    )


def _power_direction(emb, dim, iterations):
    """Shared power-iteration core → (centered frame with node_id,
    1-row direction frame). See pca_pc1 for the scale rationale."""
    spark = emb.sparkSession
    x = emb.filter(F.size("vector") == dim).select(
        "node_id", F.col("vector").cast("array<double>").alias("x")
    )
    mu = x.agg(
        F.array(*[F.avg(F.col("x")[i]) for i in range(dim)]).alias("mu")
    )
    # centered matrix is read once per iteration plus once for the
    # final pass — checkpoint it eagerly so the scan + mean
    # aggregate run exactly once, the same cache-the-training-set
    # move every iterative ML loop makes (at cluster scale this is
    # persist(DISK_ONLY) of a projected two-column frame, not the
    # source table)
    xc = (
        x.crossJoin(F.broadcast(mu))
        .select(
            "node_id", F.zip_with("x", "mu", lambda a, b: a - b).alias("xc")
        )
        .localCheckpoint(eager=True)
    )
    v = spark.range(1).select(
        F.array(*[F.lit(1.0 / dim**0.5) for _ in range(dim)]).alias("varr")
    )
    for _ in range(iterations):
        xs = xc.crossJoin(F.broadcast(v)).select(
            "xc",
            "node_id",
            F.aggregate(
                F.zip_with("xc", "varr", lambda a, b: a * b),
                F.lit(0.0),
                lambda acc, e: acc + e,
            ).alias("s"),
        )
        p = xs.agg(
            F.array(
                *[F.sum(F.col("xc")[i] * F.col("s")) for i in range(dim)]
            ).alias("p")
        )
        # v stays LAZY: each round's 1-row direction is a broadcast
        # subquery of the next round's pass, so the 5 rounds execute
        # as ONE chained job instead of 5 driver-serialized
        # checkpoint jobs (measured equal-or-faster, identical
        # doubles — optimization round 10, guide §2.6). The heavy
        # frame (xc) stays eagerly checkpointed above.
        v = (
            p.select(
                "p",
                F.sqrt(
                    F.aggregate(
                        "p", F.lit(0.0), lambda acc, e: acc + e * e
                    )
                ).alias("nrm"),
            )
            .select(
                F.transform("p", lambda e: e / F.col("nrm")).alias("varr")
            )
        )
    return xc, v


def pca_residual_norms(
    emb: DataFrame, dim: int = 64, iterations: int = 5
) -> DataFrame:
    """All-but-the-top embedding debiasing, summarized per vector
    → (id, proj, resid_norm): the projection of each centered
    embedding onto the corpus's first principal direction and the
    norm of what remains after removing it.

    Standard post-processing for anisotropic embedding spaces
    (Mu & Viswanath 2018-style: subtract the mean, remove the top
    component); ``resid_norm`` is the magnitude each vector keeps —
    the per-row health metric a debiasing pass reports. Reuses the
    ``_power_direction`` loop (same cost), then ONE more broadcast
    pass computes ``s = xc⊤v`` and ``‖xc − s·v‖`` map-only — no
    extra shuffle. The sign of ``proj`` follows the same
    largest-|element|-positive convention as ``pca_pc1`` so the
    DuckDB twin replays it exactly.
    """
    xc, v = _power_direction(emb, dim, iterations)
    signed = v.select(
        "varr",
        F.array_max(F.transform("varr", F.abs)).alias("refabs"),
    ).select(
        F.transform(
            "varr",
            lambda e: e
            * F.when(
                F.get(
                    F.filter(
                        "varr", lambda q: F.abs(q) == F.col("refabs")
                    ),
                    0,
                )
                >= 0,
                F.lit(1.0),
            ).otherwise(F.lit(-1.0)),
        ).alias("varr")
    )
    s_col = F.aggregate(
        F.zip_with("xc", "varr", lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, e: acc + e,
    )
    scored = xc.crossJoin(F.broadcast(signed)).select(
        F.col("node_id").alias("id"), "xc", "varr", s_col.alias("s")
    )
    rn = F.sqrt(
        F.aggregate(
            F.zip_with(
                "xc",
                "varr",
                lambda a, b: (a - F.col("s") * b) * (a - F.col("s") * b),
            ),
            F.lit(0.0),
            lambda acc, e: acc + e,
        )
    )
    r6 = lambda c: F.floor(c * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)  # noqa: E731
    return scored.select(
        "id", r6(F.col("s")).alias("proj"), r6(rn).alias("resid_norm")
    )
