"""Data-profiling and constraint-validation operators.

The quality gate every large-scale training-data pipeline runs before
(and after) curation: per-column profiles (null fraction, distinct
cardinality, ranges) and a Deequ-style declarative constraint suite
(key uniqueness, referential integrity, value-range rules) evaluated
in a handful of scan passes. The reference engine has no profiling
surface; this family extends SURVEY §2.7's "absent; Spark has the
building blocks" list the same way the OLAP queries do.

Scale notes
-----------
- ``profile_columns`` is ONE aggregate pass over the table. Multiple
  exact ``count(distinct)`` aggregates compile to Spark's Expand
  operator (rows × #distinct-aggs before the partial aggregate) —
  the documented single-pass trade. At 100 TB swap the exact counts
  for ``approx_count_distinct`` (same plan minus Expand) when ±2%
  cardinality error is acceptable; the oracle-checked entry keeps
  exact counts so DuckDB can verify values.
- ``constraint_check`` unions independent small aggregates; each FK
  probe is a LEFT ANTI equi-join where the primary-key side is the
  smaller frame (broadcast-eligible, AQE decides). Nothing here
  materializes violation ROWS — only counts — so the output is O(1)
  regardless of how broken the input is; a `violations_sample`
  companion would be the debugging tool, the gate wants counts.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _num_profile(df: DataFrame, col: str, expr: Column) -> DataFrame:
    return df.agg(
        F.lit(col).alias("col_name"),
        F.count("*").alias("n_rows"),
        (F.count("*") - F.count(expr)).alias("n_null"),
        F.countDistinct(expr).alias("n_distinct"),
        F.round(F.min(expr), 6).cast("double").alias("min_num"),
        F.round(F.max(expr), 6).cast("double").alias("max_num"),
        F.lit(None).cast("string").alias("min_str"),
        F.lit(None).cast("string").alias("max_str"),
    )


def _str_profile(df: DataFrame, col: str) -> DataFrame:
    c = F.col(col)
    return df.agg(
        F.lit(col).alias("col_name"),
        F.count("*").alias("n_rows"),
        (F.count("*") - F.count(c)).alias("n_null"),
        F.countDistinct(c).alias("n_distinct"),
        F.lit(None).cast("double").alias("min_num"),
        F.lit(None).cast("double").alias("max_num"),
        F.min(c).alias("min_str"),
        F.max(c).alias("max_str"),
    )


def profile_columns(
    df: DataFrame,
    numeric_cols: list[str],
    string_cols: list[str],
    timestamp_cols: list[str],
) -> DataFrame:
    """Per-column profile → (col_name, n_rows, n_null, n_distinct,
    min_num, max_num, min_str, max_str), one row per profiled column.

    Numeric mins/maxes are rounded to 6dp (engine-parity); timestamp
    columns profile as epoch seconds (double) so the numeric channel
    carries them without a string-formatting parity risk. Each column
    is an independent aggregate over the same scan; Spark schedules
    them as one job and the parquet reader prunes to exactly the
    profiled columns.
    """
    parts = [_num_profile(df, c, F.col(c)) for c in numeric_cols]
    parts += [
        _num_profile(df, c, F.col(c).cast("double"))
        for c in timestamp_cols
    ]
    parts += [_str_profile(df, c) for c in string_cols]
    return reduce(lambda a, b: a.unionByName(b), parts)


def constraint_check(
    constraints: list[tuple[str, DataFrame]]
) -> DataFrame:
    """Deequ-style constraint suite → (constraint, n_violations).

    Each entry is (name, single-row DataFrame with a ``n_violations``
    long column) — built by the helpers below so the suite stays
    declarative at the call site. Passing gate ⇒ every count is 0.
    """
    parts = [
        df.select(
            F.lit(name).alias("constraint"),
            F.col("n_violations").cast("long").alias("n_violations"),
        )
        for name, df in constraints
    ]
    return reduce(lambda a, b: a.unionByName(b), parts)


def fk_violations(child: DataFrame, child_key: str,
                  parent: DataFrame, parent_key: str) -> DataFrame:
    """Rows of ``child`` whose key has no match in ``parent`` —
    referential integrity as a LEFT ANTI count (never materializes
    the join multiplicity; the parent side ships as a broadcast when
    it fits, a shuffle hash join otherwise)."""
    orphans = child.select(F.col(child_key)).join(
        parent.select(F.col(parent_key).alias(child_key)),
        child_key,
        "left_anti",
    )
    return orphans.agg(F.count("*").alias("n_violations"))


def unique_violations(df: DataFrame, *keys: str) -> DataFrame:
    """count(*) − count(distinct keys): 0 iff the key is unique.
    One map-side-combinable aggregate; no self-join."""
    return df.agg(
        (F.count("*") - F.countDistinct(*keys)).alias("n_violations")
    )


def predicate_violations(df: DataFrame, pred: Column) -> DataFrame:
    """Rows where ``pred`` does NOT hold (nulls count as violations
    — a constraint must evaluate TRUE to pass, the Deequ rule)."""
    return df.agg(
        F.sum(
            F.when(pred.isNull() | ~pred, F.lit(1)).otherwise(F.lit(0))
        ).alias("n_violations")
    )

def drift_psi(
    df: DataFrame,
    group_col: str = "event_type",
    value_col: str = "value",
    ts_col: str = "ts",
    n_bins: int = 10,
) -> DataFrame:
    """Population Stability Index between the first and second half
    of the time range, per group → (grp, n_ref, n_cur, psi).

    The train/serve drift gate every deployed scorer runs: the time
    range splits at its midpoint into reference vs current windows,
    ``value_col`` is histogrammed into ``n_bins`` fixed-width bins
    over the GLOBAL min/max (both sides share bin edges — the PSI
    contract), and

        psi(grp) = Σ_b (p_cur(b) − p_ref(b)) · ln(p_cur(b)/p_ref(b))

    with add-one smoothing on bin counts so one-sided bins stay
    finite. psi < 0.1 stable, 0.1–0.25 drifting, > 0.25 shifted (the
    conventional bands).

    Scale design: one broadcast 1-row bounds frame (time midpoint +
    value min/max), then ONE aggregate keyed by (grp, bin) with
    conditional ref/cur sums — map-side combinable, the only shuffle
    the bin histogram itself. Per-group totals and the PSI fold
    happen on the |groups|·n_bins frame, which is tiny at any corpus
    size. Integer-microsecond midpoint arithmetic keeps the split
    engine-exact.
    """
    bounds = df.agg(
        F.expr(
            f"(unix_micros(min({ts_col})) + unix_micros(max({ts_col})))"
            " div 2"
        ).alias("mid_us"),
        F.min(value_col).alias("vmin"),
        F.max(value_col).alias("vmax"),
    )
    w = F.col("vmax") - F.col("vmin")
    binned = (
        df.crossJoin(F.broadcast(bounds))
        .select(
            F.col(group_col).alias("grp"),
            F.when(
                w > 0,
                F.least(
                    F.lit(n_bins - 1),
                    F.floor(
                        (F.col(value_col) - F.col("vmin")) / w * n_bins
                    ),
                ),
            )
            .otherwise(F.lit(0))
            .alias("bin"),
            F.when(
                F.unix_micros(ts_col) < F.col("mid_us"), F.lit(1)
            )
            .otherwise(F.lit(0))
            .alias("is_ref"),
        )
    )
    g = binned.groupBy("grp", "bin").agg(
        F.sum("is_ref").alias("cr"),
        F.sum(1 - F.col("is_ref")).alias("cc"),
    )
    tot = g.groupBy("grp").agg(
        F.sum("cr").alias("tr"), F.sum("cc").alias("tc")
    )
    pr = (F.col("cr") + 1) / (F.col("tr") + n_bins)
    pc = (F.col("cc") + 1) / (F.col("tc") + n_bins)
    return (
        g.join(tot, "grp")
        .groupBy("grp")
        .agg(
            F.first("tr").alias("n_ref"),
            F.first("tc").alias("n_cur"),
            (
                F.floor(
                    F.sum((pc - pr) * F.log(pc / pr)) * F.lit(1e6)
                    + F.lit(0.5)
                )
                / F.lit(1e6)
            ).alias("psi"),
        )
    )


def rank_auc(
    df: DataFrame,
    score_col: str,
    label_col: Column,
    parts: int = 32,
) -> DataFrame:
    """Exact Mann-Whitney AUC of ``score_col`` ranking the binary
    ``label_col`` → one row (n_pos, n_neg, auc) — the model-free
    discrimination readout every scored-corpus gate wants (does the
    quality score actually separate keep from drop?).

    AUC needs global average ranks, but a single unpartitioned window
    over the raw rows is the one shape that cannot scale. Instead:
    (1) aggregate to the per-distinct-score grain (n, n_pos) — ties
    collapse here, and the frame is at most |distinct scores|;
    (2) compute the global count-below for every score with the
    RANGE-BUCKETED PREFIX SUM idiom: DETERMINISTIC range buckets from
    broadcast percentile_approx boundaries (a data COLUMN, ordered by
    score and balanced by the quantile sketch — NOT
    spark_partition_id over repartitionByRange, whose sampled
    boundaries re-draw per DAG branch and silently desynchronize the
    offsets join), an in-bucket running sum (window PARTITIONED by
    bucket, never global), plus per-bucket totals offset-summed on a
    ≤``parts``-row frame and broadcast back. Equal scores share a
    bucket (bucket = #boundaries ≤ score is a pure function of the
    score), so count-below is exact regardless of boundaries;
    (3) tied ranks enter as the closed form cl + (n+1)/2, so no
    per-row rank is ever materialized. All rank sums are exact in
    doubles (integers and halves < 2^52); the only division is the
    final AUC. At 100 TB the plan is two shuffles (grain agg + bucket
    window) and two broadcasts — no global sort, no global window.
    """
    g = (
        df.filter(F.col(score_col).isNotNull())
        .select(
            F.col(score_col).alias("v"),
            F.when(label_col, F.lit(1)).otherwise(F.lit(0)).alias("p"),
        )
        .groupBy("v")
        .agg(F.count("*").alias("n"), F.sum("p").alias("np"))
    )
    g = attach_count_below(g, parts=parts)
    agg = g.agg(
        F.sum(
            F.col("np")
            * (F.col("cl") + (F.col("n") + F.lit(1)) / F.lit(2.0))
        ).alias("rpos"),
        F.sum("np").alias("n_pos"),
        (F.sum("n") - F.sum("np")).alias("n_neg"),
    )
    return agg.select(
        "n_pos",
        "n_neg",
        (
            F.floor(
                (
                    (
                        F.col("rpos")
                        - F.col("n_pos")
                        * (F.col("n_pos") + F.lit(1))
                        / F.lit(2.0)
                    )
                    / (F.col("n_pos") * F.col("n_neg"))
                )
                * F.lit(1e6)
                + F.lit(0.5)
            )
            / F.lit(1e6)
        ).alias("auc"),
    )


def attach_count_below(
    g: DataFrame, parts: int = 32, v_col: str = "v", n_col: str = "n"
) -> DataFrame:
    """Attach the GLOBAL count of rows strictly below each value to a
    value-grain frame (``v_col`` distinct, ``n_col`` = multiplicity)
    as column ``cl`` — the distributed prefix-sum primitive behind
    rank_auc and exact_ntile_bins.

    Buckets are DETERMINISTIC: percentile_approx boundaries broadcast
    back and counted per value (a pure function of the value — never
    spark_partition_id over repartitionByRange, whose sampled
    boundaries re-draw per DAG branch and desynchronize self-joins).
    In-bucket running sums use a window PARTITIONED by bucket; bucket
    offsets come from a ≤``parts``-row totals frame, offset-summed
    and broadcast back. Two shuffles + two broadcasts, no global
    sort, no global window.
    """
    from pyspark.sql import Window

    bnd = g.agg(
        F.percentile_approx(
            v_col,
            [i / parts for i in range(1, parts)],
            10_000,
        ).alias("__bs")
    )
    g = (
        g.join(F.broadcast(bnd))
        .withColumn(
            "__pid",
            F.size(
                F.filter(F.col("__bs"), lambda b: b <= F.col(v_col))
            ),
        )
        .drop("__bs")
    )
    w_in = (
        Window.partitionBy("__pid")
        .orderBy(v_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    g = g.withColumn(
        "__cum", F.coalesce(F.sum(n_col).over(w_in), F.lit(0))
    )
    totals = g.groupBy("__pid").agg(F.sum(n_col).alias("__pt"))
    w_off = (
        Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = totals.withColumn(
        "__off", F.coalesce(F.sum("__pt").over(w_off), F.lit(0))
    ).select("__pid", "__off")
    return (
        g.join(F.broadcast(offs), "__pid")
        .withColumn("cl", F.col("__off") + F.col("__cum"))
        .drop("__pid", "__cum", "__off")
    )


def exact_ntile_bins(
    df: DataFrame,
    value_col: str,
    key_col: str,
    k: int = 10,
    parts: int = 32,
) -> DataFrame:
    """EXACT SQL ntile(k) binning without a global window →
    (bin, n_rows, lo, hi): the quantile-discretizer every feature
    pipeline runs, with ntile's precise remainder semantics (the
    first n mod k buckets take the extra row) so a SQL oracle's
    native ntile() is an independent witness.

    Global rank of a row = count-below its value (the
    attach_count_below prefix sum at the value grain) + its
    row_number among ties (a window PARTITIONED by value ordered by
    ``key_col`` — the deterministic tie-break ntile needs; frame =
    one tie group, never global). The rank→bucket map is the closed
    form with q = n div k, r = n mod k:
      rank ≤ (q+1)·r        → bucket = (rank−1) div (q+1) + 1
      otherwise             → bucket = r + (rank−1 − r·(q+1)) div q + 1
    — all BIGINT div arithmetic, no float ever picks a bucket edge.
    """
    rows = df.select(
        F.col(value_col).alias("v"), F.col(key_col).alias("kk")
    )
    ranked = attach_exact_ntile(rows, "v", "kk", k=k, parts=parts)
    return (
        ranked.groupBy("bin")
        .agg(
            F.count("*").alias("n_rows"),
            F.min("v").alias("lo"),
            F.max("v").alias("hi"),
        )
    )


def attach_exact_ntile(
    df: DataFrame,
    value_col: str,
    key_col: str,
    k: int = 10,
    out_col: str = "bin",
    parts: int = 32,
) -> DataFrame:
    """Attach SQL-exact ``ntile(k) OVER (ORDER BY value_col, key_col)``
    as per-row column ``out_col`` WITHOUT a global window — the
    scale-safe scorer behind exact_ntile_bins, exposed so callers
    that need the per-row quantile label (RFM scoring, decile flags)
    never rank the whole frame through one partition. For a
    DESCENDING ntile, pass a negated value column.

    Rank = count-below the value (attach_count_below's two-shuffle
    prefix sum at the value grain) + row_number among exact ties
    (window PARTITIONED by value — frame is one tie group, never
    global); rank→bucket is ntile's closed remainder form in BIGINT
    div arithmetic (see exact_ntile_bins docstring). ``key_col`` must
    be unique per row for a deterministic result.

    PRECONDITION: ``value_col`` must be non-null — the join-back on
    the value key drops NULL rows, whereas SQL ntile() sorts NULLs
    into buckets (engine-dependent NULLS FIRST/LAST). Callers with
    nullable values coalesce first, on BOTH engine and oracle sides.
    """
    from pyspark.sql import Window

    g = attach_count_below(
        df.groupBy(F.col(value_col).alias("__v")).agg(
            F.count("*").alias("__n")
        ),
        parts=parts,
        v_col="__v",
        n_col="__n",
    )
    tot = g.agg(F.sum("__n").alias("__ntot"))
    ranked = (
        df.join(
            g.select(F.col("__v").alias(value_col), "cl"), value_col
        )
        .withColumn(
            "__rank",
            F.col("cl")
            + F.row_number().over(
                Window.partitionBy(value_col).orderBy(key_col)
            ),
        )
        .drop("cl")
        .crossJoin(F.broadcast(tot))
        # `div` is true BIGINT division (exact at any count), not
        # double division truncated to long (exact only below 2^53)
        .withColumn("__q", F.expr(f"__ntot div {int(k)}"))
        .withColumn("__r", F.col("__ntot") % k)
    )
    return ranked.withColumn(
        out_col,
        F.when(
            F.col("__rank") <= (F.col("__q") + 1) * F.col("__r"),
            F.expr("((__rank - 1) div (__q + 1)) + 1"),
        ).otherwise(
            F.expr(
                "__r + ((__rank - 1 - __r * (__q + 1)) div __q) + 1"
            )
        ),
    ).drop("__rank", "__ntot", "__q", "__r")


def table_diff(
    base: DataFrame,
    cur: DataFrame,
    keys: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """Snapshot diff between two versions of a keyed table → ONE row:
    (n_added, n_removed, n_changed, n_unchanged,
    n_changed_<col> per compared column) — the reconciliation gate
    run after every migration/backfill/CDC apply ("did the copy
    change exactly what it should have?").

    One FULL OUTER equi-join on the key (the join co-partitions both
    scans on the same key — ONE shuffle each side, broadcast if one
    snapshot is small) with presence flags on each side; row classes
    and per-column change counts are conditional sums in a single
    map-side-combinable aggregate over the joined frame. Column
    comparison is null-safe (a NULL→value transition counts as a
    change, NULL→NULL does not). Only counts come out — O(1) output
    however wide the drift — mirroring the constraint_check
    philosophy: gates want counts, debuggers want row samples."""
    b = base.select(
        *keys,
        F.lit(1).alias("__b"),
        *[F.col(c).alias(f"__b_{c}") for c in compare_cols],
    )
    c = cur.select(
        *keys,
        F.lit(1).alias("__c"),
        *[F.col(c).alias(f"__c_{c}") for c in compare_cols],
    )
    j = b.join(c, keys, "full_outer")
    both = F.col("__b").isNotNull() & F.col("__c").isNotNull()
    col_diff = {
        cc: ~F.col(f"__b_{cc}").eqNullSafe(F.col(f"__c_{cc}"))
        for cc in compare_cols
    }
    any_diff = None
    for d in col_diff.values():
        any_diff = d if any_diff is None else (any_diff | d)
    aggs = [
        F.sum(
            F.when(F.col("__b").isNull(), 1).otherwise(0)
        ).alias("n_added"),
        F.sum(
            F.when(F.col("__c").isNull(), 1).otherwise(0)
        ).alias("n_removed"),
        F.sum(F.when(both & any_diff, 1).otherwise(0)).alias("n_changed"),
        F.sum(F.when(both & ~any_diff, 1).otherwise(0)).alias(
            "n_unchanged"
        ),
    ]
    aggs += [
        F.sum(F.when(both & col_diff[cc], 1).otherwise(0)).alias(
            f"n_changed_{cc}"
        )
        for cc in compare_cols
    ]
    return j.agg(*aggs)


def group_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    probs: tuple[float, ...] = (0.25, 0.5, 0.75),
) -> DataFrame:
    """EXACT per-group quantiles (type-1 / lower-step definition:
    q_p = smallest value whose cumulative count ≥ ⌈p·n⌉) →
    (grp, n, q_<p> per prob) — the boxplot/robust-stats profile
    computed WITHOUT collecting, sampling, or sketching.

    Shape: one aggregate to the (group, distinct-value) grain, a
    running count over that grain (window PARTITIONED by group — the
    frame is |distinct values in the group|, already collapsed from
    raw rows), then ONE conditional min per probability: the ⌈p·n⌉
    targets are pure-INTEGER ((p_num·n + p_den − 1) div p_den), so no
    float ever selects a quantile and both engines pick the identical
    element. approx_percentile is the 100 TB default; this is the
    exact witness you run on the slice that matters (and the oracle
    for the sketch)."""
    g = (
        df.filter(F.col(value_col).isNotNull())
        .select(F.col(group_col).alias("grp"), F.col(value_col).alias("v"))
        .groupBy("grp", "v")
        .agg(F.count("*").alias("c"))
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy("grp")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    g = g.withColumn("cum", F.sum("c").over(w))
    tot = g.groupBy("grp").agg(F.sum("c").alias("n"))
    j = g.join(tot, "grp")
    from fractions import Fraction

    aggs = [F.max("n").alias("n")]
    for p in probs:
        fr = Fraction(p).limit_denominator(10_000)
        num, den = fr.numerator, fr.denominator
        target = F.expr(f"(n * {num} + {den} - 1) div {den}")
        aggs.append(
            F.min(F.when(F.col("cum") >= target, F.col("v"))).alias(
                f"q_{str(p).replace('.', '_')}"
            )
        )
    return j.groupBy("grp").agg(*aggs)
