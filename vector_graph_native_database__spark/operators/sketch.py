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
    kept = kmv_state(df, group_col, value_col, k=k, salt=salt)
    est = kept.groupBy(group_col).agg(
        F.count("*").alias("n_kept"), F.max("u").alias("u_k")
    )
    exact = (
        df.select(group_col, value_col)
        .distinct()
        .groupBy(group_col)
        .agg(F.count("*").alias("exact_distinct"))
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



def kmv_state(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: int = 64,
    salt: str = "kmv",
) -> DataFrame:
    """→ (group, u): the k smallest distinct value-hashes per group —
    the KMV sketch STATE. Min-k sets form a monoid under
    union-then-keep-k-smallest, so states from any data split merge
    to exactly the full-data state (bounded at k rows per group
    however large the input) — the third sketch-merge law next to
    CMS sum and HLL max. Distinctness is on the hash u: same value →
    same u on every engine/batch (60-bit md5 collisions between
    DIFFERENT values are assumed absent, the same contract every
    md5-hash operator here relies on)."""
    pairs = df.select(group_col, value_col).distinct()
    u = (
        stable_hash60(
            F.concat(F.lit(salt), F.col(value_col).cast("string"))
        )
        / F.lit(TWO_60)
    )
    w = Window.partitionBy(group_col).orderBy("u")
    return (
        pairs.withColumn("u", u)
        .select(group_col, "u")
        .distinct()
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(group_col, "u")
    )


def kmv_merge_states(
    a: DataFrame, b: DataFrame, group_col: str, k: int = 64
) -> DataFrame:
    """Union two KMV states and keep the k smallest distinct hashes
    per group — the monoid merge the streaming maintenance applies
    per batch."""
    w = Window.partitionBy(group_col).orderBy("u")
    return (
        a.unionByName(b)
        .distinct()
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(group_col, "u")
    )


def kmv_estimate_from_state(
    state: DataFrame,
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: int = 64,
) -> DataFrame:
    """KMV state (possibly streaming-maintained) + raw data (for the
    exact-count audit column) → the kmv_distinct output frame."""
    est = state.groupBy(group_col).agg(
        F.count("*").alias("n_kept"), F.max("u").alias("u_k")
    )
    exact = (
        df.select(group_col, value_col)
        .distinct()
        .groupBy(group_col)
        .agg(F.count("*").alias("exact_distinct"))
    )
    est_col = F.when(
        F.col("n_kept") < k, F.col("n_kept").cast("double")
    ).otherwise(F.lit(float(k - 1)) / F.col("u_k"))
    return est.join(exact, group_col).select(
        group_col,
        (F.floor(est_col * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)).alias(
            "est_distinct"
        ),
        "exact_distinct",
    )


def hll_distinct_union(
    df: DataFrame,
    group_col: str,
    value_col: str,
    m: int = 64,
    salt: str = "hll",
) -> DataFrame:
    """Deterministic HyperLogLog with cross-group register UNION
    → (group, est_distinct, exact_distinct), plus one 'ALL' row whose
    estimate comes from MERGING the per-group registers (element-wise
    max), not from recounting — the mergeability contract that makes
    HLL the 100 TB telemetry aggregate (per-day registers roll up to
    per-month by max, no rescan).

    Engine-native HLLs (Spark's approx_count_distinct, DuckDB's) use
    private hash families, so they can never be value-checked across
    engines. This one is built on the same md5-derived 60-bit hash as
    the dedup/LSH/KMV operators: register = h mod m, and the rank ρ =
    (leading-zero count + 1) of the next 50 hash bits, computed via
    binary-string length (no float log2 — Spark's log2 is
    log(x)/log(2) and can round down at exact powers of two, which
    would corrupt ρ on exactly the values where it matters).
    Flajolet's standard estimator with the small-range linear
    correction; the 2^-ρ summands are exact powers of two spanning
    < 53 bits, so the register sum is exact and order-independent —
    bit-identical on any engine with md5. exact_distinct rides along
    to expose the realized error (standard error ≈ 1.04/√m ≈ 13% at
    m=64).
    """
    regs = hll_registers(df, group_col, value_col, m=m, salt=salt)
    return hll_estimate_from_registers(
        regs, df, group_col, value_col, m=m
    )


def hll_registers(
    df: DataFrame,
    group_col: str,
    value_col: str,
    m: int = 64,
    salt: str = "hll",
) -> DataFrame:
    """→ (grp, reg, mrho): per-group HLL register vectors — the
    max-mergeable sketch state (registers from any data split merge
    to the full-data registers by element-wise max). Shared by the
    batch estimator and the streaming register maintenance so the
    hash family can never diverge."""
    w_rho = 51  # ranks drawn from 50 bits: rho ∈ [1, 51]
    base = df.select(
        F.col(group_col).alias("grp").cast("string"),
        F.col(value_col).alias("v"),
    ).filter(F.col(value_col).isNotNull())
    h = stable_hash60(F.concat(F.lit(salt), F.col("v").cast("string")))
    hashed = (
        base.withColumn("h", h)
        .withColumn("reg", F.pmod("h", F.lit(m)))
        .withColumn(
            "r", F.pmod(F.expr(f"h div {m}"), F.lit(1 << (w_rho - 1)))
        )
        .withColumn(
            "rho",
            F.when(F.col("r") == 0, F.lit(w_rho)).otherwise(
                F.lit(w_rho)
                - F.length(F.conv(F.col("r").cast("string"), 10, 2))
            ),
        )
    )
    return hashed.groupBy("grp", "reg").agg(F.max("rho").alias("mrho"))


def hll_estimate_from_registers(
    regs: DataFrame,
    df: DataFrame,
    group_col: str,
    value_col: str,
    m: int = 64,
) -> DataFrame:
    """Registers (possibly streaming-maintained) + the raw data (for
    the exact-count audit columns) → the hll_distinct_union output
    frame: per-group rows plus the register-max-merged 'ALL' row."""
    base = df.select(
        F.col(group_col).alias("grp").cast("string"),
        F.col(value_col).alias("v"),
    ).filter(F.col(value_col).isNotNull())
    merged = (
        regs.groupBy("reg")
        .agg(F.max("mrho").alias("mrho"))
        .select(F.lit("ALL").alias("grp"), "reg", "mrho")
    )
    # alpha_m written as the arithmetic expression (not a rounded
    # literal) so both engines compute the identical double
    alpha = F.lit(0.7213) / (F.lit(1.0) + F.lit(1.079) / F.lit(float(m)))

    def estimate(reg_frame: DataFrame) -> DataFrame:
        return (
            reg_frame.groupBy("grp")
            .agg(
                F.sum(F.pow(F.lit(2.0), -F.col("mrho"))).alias("s_occ"),
                F.count("*").alias("n_occ"),
            )
            .withColumn("zeros", F.lit(m) - F.col("n_occ"))
            .withColumn("s", F.col("s_occ") + F.col("zeros").cast("double"))
            .withColumn("raw", alpha * F.lit(float(m * m)) / F.col("s"))
            .withColumn(
                "est",
                F.when(
                    (F.col("raw") <= F.lit(2.5 * m)) & (F.col("zeros") > 0),
                    F.lit(float(m))
                    * F.log(F.lit(float(m)) / F.col("zeros")),
                ).otherwise(F.col("raw")),
            )
        )

    # The per-group rows and the union row are estimated and joined
    # to their exact counts in SEPARATE frames, unioned only at the
    # end: a real group that happens to be named 'ALL' then yields
    # two correctly-computed rows with the same label instead of
    # silently merging its registers into the union estimate (which
    # would double-count registers and mispair exact counts).
    exact = base.groupBy("grp").agg(
        F.countDistinct("v").alias("exact_distinct")
    )
    exact_all = base.agg(
        F.countDistinct("v").alias("exact_distinct")
    ).select(F.lit("ALL").alias("grp"), "exact_distinct")
    est6 = F.floor(F.col("est") * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)
    per_grp = estimate(regs).join(exact, "grp")
    union_row = estimate(merged).join(exact_all, "grp")
    return per_grp.unionByName(union_row).select(
        F.col("grp").alias(group_col),
        est6.alias("est_distinct"),
        "exact_distinct",
    )


def sampled_percentiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    sample_key: str,
    rate: float = 0.125,
    salt: str = "ps",
) -> DataFrame:
    """Mergeable approximate percentiles via deterministic bottom-hash
    sampling → (group, n_sample, p50_est, p90_est, p99_est,
    p50_exact, p90_exact, p99_exact).

    The sketch is the hash-sampled row subset: keep a row iff
    hash(sample_key)/2^60 < rate. That sample is trivially MERGEABLE
    (the union of two partitions' samples IS the sample of the union
    — same property KLL/t-digest buy with far more machinery) and
    deterministic, so unlike Spark's percentile_approx — whose
    Greenwald-Khanna merge depends on partition layout — the estimate
    is reproducible across engines and cluster sizes, and the DuckDB
    oracle value-checks it exactly. Estimates are exact linear-
    interpolated percentiles OF THE SAMPLE (percentile() here,
    quantile_cont in the oracle — the pair the exact-percentile entry
    already proves bit-compatible); exact percentiles of the full
    data ride along to expose the realized error (~1/√(rate·n)).
    """
    u = stable_hash60(
        F.concat(F.lit(salt), F.col(sample_key).cast("string"))
    ) / F.lit(TWO_60)
    r6 = lambda c: F.floor(c * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)  # noqa: E731
    pct = f"percentile({value_col}, array(0.5, 0.9, 0.99))"
    agg = (
        df.withColumn("__u", u)
        .groupBy(group_col)
        .agg(
            F.expr(
                f"percentile(CASE WHEN __u < {rate!r} THEN {value_col} END,"
                " array(0.5, 0.9, 0.99))"
            ).alias("ps"),
            F.sum((F.col("__u") < rate).cast("long")).alias("n_sample"),
            F.expr(pct).alias("pe"),
        )
    )
    return agg.select(
        group_col,
        "n_sample",
        r6(F.col("ps")[0]).alias("p50_est"),
        r6(F.col("ps")[1]).alias("p90_est"),
        r6(F.col("ps")[2]).alias("p99_est"),
        r6(F.col("pe")[0]).alias("p50_exact"),
        r6(F.col("pe")[1]).alias("p90_exact"),
        r6(F.col("pe")[2]).alias("p99_exact"),
    )


def cms_heavy_hitters(
    df: DataFrame,
    text_col: str = "text",
    depth: int = 4,
    width: int = 256,
    top_n: int = 20,
    salt: str = "cms",
) -> DataFrame:
    """Count-min-sketch heavy hitters → (tok, exact_cnt, est_cnt) for
    the ``top_n`` most frequent tokens (ties → token ascending).

    The sketch is ``depth`` hash rows × ``width`` counters; a token's
    estimate is the MIN over rows of its counter — the classic
    Cormode/Muthukrishnan one-sided estimator (est ≥ exact always;
    overestimate bounded by ε·N with ε = e/width at the usual
    analysis). Hashing is the same stable md5-derived family as the
    dedup/LSH/KMV/HLL operators, so the DuckDB twin computes
    bit-identical counters and the entry is fully value-checked —
    engine-native sketches never are.

    Scale shape: the token stream is first collapsed to the
    VOCABULARY frame by one map-side-combinable count (the 100 TB
    stream never hits the sketch directly); counters are a
    depth×width-row aggregate of that frame; the candidate probe is a
    ``top_n``-row broadcast join. exact_cnt rides along to expose the
    realized overestimate.
    """
    from ..functions.textfn import tokenize

    toks = df.select(F.explode(tokenize(text_col)).alias("tok"))
    exact = toks.groupBy("tok").agg(F.count("*").alias("exact_cnt"))
    rows_d = F.array(*[F.lit(i) for i in range(depth)])
    vb = exact.select(
        "tok",
        "exact_cnt",
        F.explode(rows_d).alias("d"),
    ).withColumn(
        "b",
        stable_hash60(
            F.concat(
                F.lit(salt),
                F.col("d").cast("string"),
                F.lit("|"),
                F.col("tok"),
            )
        )
        % F.lit(width),
    )
    counters = vb.groupBy("d", "b").agg(F.sum("exact_cnt").alias("cnt"))
    cand = exact.orderBy(
        F.col("exact_cnt").desc(), F.col("tok").asc()
    ).limit(top_n)
    cand_b = vb.join(F.broadcast(cand.select("tok")), "tok")
    return (
        cand_b.join(counters, ["d", "b"])
        .groupBy("tok", "exact_cnt")
        .agg(F.min("cnt").alias("est_cnt"))
        .select("tok", "exact_cnt", "est_cnt")
    )


def bloom_semi_join_stats(
    build: DataFrame,
    probe: DataFrame,
    build_key: str,
    probe_key: str,
    m_bits: int = 8192,
    k_hashes: int = 3,
    salt: str = "bloom",
) -> DataFrame:
    """Bloom-filter semi-join pruning, with its realized accuracy →
    one row (n_probe, n_pass_bloom, n_true_match, n_false_pos,
    fp_rate).

    The build side's distinct keys set ``k_hashes`` md5-derived bit
    positions each in an ``m_bits`` filter; a probe ROW passes when
    all of its key's positions are set. This is the pre-shuffle
    pruning pattern for big joins at 100 TB: the filter (here a
    distinct-positions frame, ≤ k·|build keys| rows ≪ m_bits ints,
    broadcastable by construction) travels to the probe scan and
    drops non-matching rows BEFORE the shuffle — Spark's own
    runtime-row-group bloom does this opaquely; this operator makes
    the mechanism explicit, deterministic, and value-checkable, and
    reports the false-positive cost of the chosen (m, k)
    (fp ≈ (1−e^{−kn/m})^k).

    Membership is decided once per DISTINCT probe key (the
    vocabulary-sized frame), then joined back to rows — the 100 TB
    probe stream pays one hash-partition pass, not k.
    """
    keys = (
        build.select(F.col(build_key).cast("string").alias("k"))
        .filter(F.col("k").isNotNull())
        .distinct()
    )
    hashes_j = F.array(*[F.lit(j) for j in range(k_hashes)])

    def positions(frame: DataFrame) -> DataFrame:
        return frame.select(
            "k", F.explode(hashes_j).alias("j")
        ).withColumn(
            "pos",
            stable_hash60(
                F.concat(
                    F.lit(salt),
                    F.col("j").cast("string"),
                    F.lit("|"),
                    F.col("k"),
                )
            )
            % F.lit(m_bits),
        )
    bloom_bits = positions(keys).select("pos").distinct()
    pk = probe.select(F.col(probe_key).cast("string").alias("k")).filter(
        F.col("k").isNotNull()
    )
    pkd = pk.distinct()
    passes = (
        positions(pkd)
        .join(F.broadcast(bloom_bits), "pos")
        .groupBy("k")
        .agg(F.countDistinct("j").alias("n_hit"))
        .filter(F.col("n_hit") == k_hashes)
        .select("k", F.lit(True).alias("pass_bloom"))
    )
    truth = keys.select("k", F.lit(True).alias("true_match"))
    flags = (
        pkd.join(passes, "k", "left_outer")
        .join(truth, "k", "left_outer")
        .select(
            "k",
            F.coalesce("pass_bloom", F.lit(False)).alias("pass_bloom"),
            F.coalesce("true_match", F.lit(False)).alias("true_match"),
        )
    )
    per_row = pk.join(flags, "k")
    return per_row.agg(
        F.count("*").alias("n_probe"),
        F.sum(F.col("pass_bloom").cast("long")).alias("n_pass_bloom"),
        F.sum(F.col("true_match").cast("long")).alias("n_true_match"),
        F.sum(
            (F.col("pass_bloom") & ~F.col("true_match")).cast("long")
        ).alias("n_false_pos"),
        (
            F.floor(
                F.sum((F.col("pass_bloom") & ~F.col("true_match")).cast("double"))
                / F.count("*")
                * F.lit(1e6)
                + F.lit(0.5)
            )
            / F.lit(1e6)
        ).alias("fp_rate"),
    )


def cms_token_buckets(
    counts: DataFrame, depth: int, width: int, salt: str = "cms"
) -> DataFrame:
    """(tok, cnt) vocabulary frame → (tok, cnt, d, b): each token
    replicated to its ``depth`` counter coordinates. Shared by the
    batch estimator and the streaming counter maintenance so the two
    can never disagree on the hash family."""
    rows_d = F.array(*[F.lit(i) for i in range(depth)])
    return counts.select(
        "tok", "cnt", F.explode(rows_d).alias("d")
    ).withColumn(
        "b",
        stable_hash60(
            F.concat(
                F.lit(salt),
                F.col("d").cast("string"),
                F.lit("|"),
                F.col("tok"),
            )
        )
        % F.lit(width),
    )


def cms_partial_counters(
    docs: DataFrame,
    text_col: str,
    depth: int,
    width: int,
    salt: str = "cms",
) -> DataFrame:
    """Documents → (d, b, cnt) PARTIAL count-min counters for just
    these documents. CMS counters are a commutative monoid under
    element-wise sum, so partials from any corpus split sum-merge to
    exactly the full-corpus sketch — the property the streaming
    maintenance entry proves end-to-end. (The same additivity is why
    a CMS cannot retract: incremental maintenance is append-only by
    contract, unlike the latest-wins BM25/embedding state.)"""
    from ..functions.textfn import tokenize

    toks = docs.select(F.explode(tokenize(text_col)).alias("tok"))
    counts = toks.groupBy("tok").agg(F.count("*").alias("cnt"))
    return (
        cms_token_buckets(counts, depth, width, salt)
        .groupBy("d", "b")
        .agg(F.sum("cnt").alias("cnt"))
    )


def cms_estimate_heavy_hitters(
    docs: DataFrame,
    counters: DataFrame,
    text_col: str = "text",
    depth: int = 4,
    width: int = 256,
    top_n: int = 20,
    salt: str = "cms",
) -> DataFrame:
    """Estimate the ``top_n`` heavy hitters from an EXTERNAL counter
    frame (e.g. streaming-maintained state) → (tok, exact_cnt,
    est_cnt). Identical estimator to ``cms_heavy_hitters``; exact
    counts come from ``docs`` so a corrupted counter state shows up
    as an estimate drift against the oracle."""
    from ..functions.textfn import tokenize

    toks = docs.select(F.explode(tokenize(text_col)).alias("tok"))
    exact = toks.groupBy("tok").agg(F.count("*").alias("cnt"))
    cand = exact.orderBy(F.col("cnt").desc(), F.col("tok").asc()).limit(
        top_n
    )
    cand_b = cms_token_buckets(cand, depth, width, salt)
    return (
        cand_b.withColumnRenamed("cnt", "exact_cnt")
        .join(counters, ["d", "b"])
        .groupBy("tok", "exact_cnt")
        .agg(F.min("cnt").alias("est_cnt"))
        .select("tok", "exact_cnt", "est_cnt")
    )


def histogram_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    bins: int = 128,
    probs: tuple[float, ...] = (0.5, 0.9, 0.99),
) -> DataFrame:
    """Mergeable fixed-bin histogram quantiles → (grp, n, plus one
    est_q_<p> and exact_q_<p> pair per prob): the STREAMABLE sibling
    of profiling.group_quantiles. Bin counts over global fixed edges
    are a pure sum sketch — per-partition (or per-micro-batch)
    histograms merge by addition, the property exact rank statistics
    can never have — at the cost of a ≤ bin-width answer.

    Determinism/parity: edges come from the global min/max (one
    broadcast bounds frame), bin assignment is the same least/floor
    arithmetic as drift_psi, and the estimate returns the LOWER EDGE
    of the bin where the ⌈p·n⌉-th row falls (edge = vmin + b·(vmax −
    vmin)/bins with integer b — no interpolation, so both engines
    compute the identical double). exact_q_* audit columns ride along
    from the exact path, exposing the realized sketch error the same
    way hll_distinct_union carries exact_distinct."""
    from fractions import Fraction

    from pyspark.sql import Window

    base = df.filter(F.col(value_col).isNotNull()).select(
        F.col(group_col).alias("grp").cast("string"),
        F.col(value_col).alias("v").cast("double"),
    )
    bounds = base.agg(
        F.min("v").alias("vmin"), F.max("v").alias("vmax")
    )
    w = F.col("vmax") - F.col("vmin")
    binned = base.crossJoin(F.broadcast(bounds)).select(
        "grp",
        "v",
        F.when(
            w > 0,
            F.least(
                F.lit(bins - 1),
                F.floor((F.col("v") - F.col("vmin")) / w * bins),
            ),
        )
        .otherwise(F.lit(0))
        .alias("b"),
    )
    h = binned.groupBy("grp", "b").agg(F.count("*").alias("c"))
    wcum = (
        Window.partitionBy("grp")
        .orderBy("b")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    h = h.withColumn("cum", F.sum("c").over(wcum))
    tot = h.groupBy("grp").agg(F.sum("c").alias("n"))
    j = h.join(tot, "grp").crossJoin(F.broadcast(bounds))
    exact = binned.groupBy("grp", "v").agg(F.count("*").alias("c"))
    wex = (
        Window.partitionBy("grp")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    exact = exact.withColumn("cum", F.sum("c").over(wex)).join(
        tot, "grp"
    )
    aggs = [F.max("n").alias("n")]
    eaggs = []
    for p in probs:
        fr = Fraction(p).limit_denominator(10_000)
        target = F.expr(
            f"(n * {fr.numerator} + {fr.denominator} - 1)"
            f" div {fr.denominator}"
        )
        tag = str(p).replace(".", "_")
        aggs.append(
            F.min(
                F.when(
                    F.col("cum") >= target,
                    F.col("vmin")
                    + F.col("b")
                    * (F.col("vmax") - F.col("vmin"))
                    / F.lit(float(bins)),
                )
            ).alias(f"est_q_{tag}")
        )
        eaggs.append(
            F.min(F.when(F.col("cum") >= target, F.col("v"))).alias(
                f"exact_q_{tag}"
            )
        )
    est = j.groupBy("grp").agg(*aggs)
    ex = exact.groupBy("grp").agg(*eaggs)
    return est.join(ex, "grp")


def kmv_intersection(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: int = 64,
    salt: str = "kmv",
) -> DataFrame:
    """Theta-sketch set intersection from KMV states → one row per
    unordered group pair (seg_a, seg_b, theta, est_intersection,
    exact_intersection).

    The KMV state doubles as a theta sketch: per group, theta is the
    k-th smallest hash when saturated (else 1.0, i.e. the state IS
    the set); for a pair the intersection estimate is |{u in A cap B
    : u < min(theta_a, theta_b)}| / min(theta_a, theta_b) — the
    standard theta-intersection rule, exact when both sides are
    unsaturated. Everything is md5-deterministic, so the DuckDB twin
    replays the sketch bit-for-bit (the same mergeability contract
    as kmv_state: audience-overlap between daily segments WITHOUT
    rescanning raw data — the sketch states are all you ship).

    Shape: one KMV state per group (k rows each), a hash-keyed
    equi-join between k-row states, and a G²-row grid — nothing here
    scales with the raw data after the state is built. The exact
    column (for the realized-error audit) is the only raw-data pair
    join, and it is keyed by value."""
    st = kmv_state(df, group_col, value_col, k=k, salt=salt)
    th = (
        st.groupBy(group_col)
        .agg(F.count("*").alias("nk"), F.max("u").alias("uk"))
        .select(
            group_col,
            F.when(F.col("nk") < k, F.lit(1.0))
            .otherwise(F.col("uk"))
            .alias("theta"),
        )
    )
    ta = th.select(
        F.col(group_col).alias("seg_a"), F.col("theta").alias("th_a")
    )
    tb = th.select(
        F.col(group_col).alias("seg_b"), F.col("theta").alias("th_b")
    )
    grid = (
        ta.crossJoin(F.broadcast(tb))
        .filter(F.col("seg_a") < F.col("seg_b"))
        .withColumn("theta", F.least("th_a", "th_b"))
        .select("seg_a", "seg_b", "theta")
    )
    sa = st.select(F.col(group_col).alias("seg_a"), "u")
    sb = st.select(F.col(group_col).alias("seg_b"), "u")
    common = (
        sa.join(sb, "u")
        .filter(F.col("seg_a") < F.col("seg_b"))
        .join(F.broadcast(grid), ["seg_a", "seg_b"])
        .filter(F.col("u") < F.col("theta"))
        .groupBy("seg_a", "seg_b")
        .agg(F.count("*").alias("c"))
    )
    pairs = df.select(group_col, value_col).distinct()
    pa = pairs.select(
        F.col(group_col).alias("seg_a"), F.col(value_col).alias("v")
    )
    pb = pairs.select(
        F.col(group_col).alias("seg_b"), F.col(value_col).alias("v")
    )
    exact = (
        pa.join(pb, "v")
        .filter(F.col("seg_a") < F.col("seg_b"))
        .groupBy("seg_a", "seg_b")
        .agg(F.count("*").cast("long").alias("x"))
    )
    return (
        grid.join(common, ["seg_a", "seg_b"], "left")
        .join(exact, ["seg_a", "seg_b"], "left")
        .select(
            "seg_a",
            "seg_b",
            (
                F.floor(F.col("theta") * F.lit(1e6) + F.lit(0.5))
                / F.lit(1e6)
            ).alias("theta"),
            (
                F.floor(
                    F.coalesce(F.col("c"), F.lit(0)).cast("double")
                    / F.col("theta")
                    * F.lit(1e6)
                    + F.lit(0.5)
                )
                / F.lit(1e6)
            ).alias("est_intersection"),
            F.coalesce(F.col("x"), F.lit(0)).alias("exact_intersection"),
        )
    )
