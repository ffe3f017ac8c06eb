"""Skew-tolerant aggregation/join helpers.

AQE's skew-join splitting covers sort-merge joins at runtime, but a
groupBy on a power-law key (one celebrity node collecting 10% of all
edges; one near-empty `lang` bucket holding half the corpus) still
funnels the hot key through one reducer. The classic fix is salting:
spray each key across S sub-keys, aggregate twice. Two shuffles, both
balanced — strictly better than one shuffle with a straggler once the
hot key dominates a partition.

These helpers exist so operators (and users) reach for a tested
primitive instead of hand-rolling the two-phase pattern. Results are
identical to the direct aggregate for the supported (decomposable)
aggregates: sum / count / min / max.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_MERGE = {
    "sum": F.sum,
    "count": F.sum,  # counts combine by summing partial counts
    "min": F.min,
    "max": F.max,
}
_PARTIAL = {
    "sum": F.sum,
    "count": F.count,
    "min": F.min,
    "max": F.max,
}


def salted_agg(
    df: DataFrame,
    key: str | list[str],
    aggs: dict[str, tuple[str, str]],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase (salted) aggregation → one row per key.

    ``aggs`` maps output column → (agg_name, input column) with
    agg_name in {sum, count, min, max} — the decomposable aggregates
    where partial-then-merge is exact. Phase 1 aggregates on
    (key, random salt) so a hot key spreads over ``salt_buckets``
    reducers; phase 2 merges the ≤``salt_buckets`` partials per key.
    """
    keys = [key] if isinstance(key, str) else list(key)
    unsupported = [a for a, _ in aggs.values() if a not in _PARTIAL]
    if unsupported:
        raise ValueError(f"non-decomposable aggregates: {unsupported}")

    salted = df.withColumn(
        "__salt", (F.rand(seed=42) * salt_buckets).cast("int")
    )
    partial = salted.groupBy(*keys, "__salt").agg(
        *[
            _PARTIAL[a](c).alias(out)
            for out, (a, c) in aggs.items()
        ]
    )
    return partial.groupBy(*keys).agg(
        *[
            _MERGE[a](out).alias(out)
            for out, (a, _) in aggs.items()
        ]
    )


def salted_join_hot_keys(
    facts: DataFrame,
    dim: DataFrame,
    key: str,
    salt_buckets: int = 16,
    hot_row_threshold: int = 100_000,
    how: str = "inner",
    keep_salt: bool = False,
) -> DataFrame:
    """Skewed big-big equi-join via hot-key salting — row-identical to
    ``facts.join(dim, key, how)``.

    Escalation order for skewed joins remains: (a) ``F.broadcast``
    when the dim side fits, (b) AQE's skew-join splitting (enabled in
    session.py) for sort-merge joins. This primitive is the third
    rung — the case AQE can't fix (e.g. a shuffled-hash join, or a
    hot key so large a single split still straggles) on a dim side
    too big to broadcast:

    1. **Hot-key detection**: one map-side-combinable count on the
       fact side; keys with ≥ ``hot_row_threshold`` rows are hot. The
       hot set is tiny by definition (it's the head of a power law)
       and is broadcast to both inputs.
    2. **Fact-side salting**: rows of hot keys get a deterministic
       salt in [0, S) — hash of the full row PLUS the row's position
       (``monotonically_increasing_id``), so even a hot key whose
       rows are byte-identical (repeated telemetry rows, the classic
       degenerate skew) spreads across all S sub-keys instead of
       hashing to one. No RNG: positions are a pure function of the
       partition layout, so a task retry over the same input salts
       identically; and since the dim side is replicated into EVERY
       salt, the join result is independent of which salt a row gets
       — a repartitioned rerun changes salts, never rows. Cold rows
       get salt 0.
    3. **Dim-side replication**: dim rows of hot keys are exploded
       into all S salts (S small copies of FEW rows — the whole
       point); cold dim rows carry salt 0 only.
    4. Equi-join on (key, salt): every hot key now spreads over
       ``salt_buckets`` reducers instead of one straggler.

    Every fact row meets exactly the dim rows of its key (hot rows
    via its one salt, against the replica with that salt), so the
    result multiset equals the plain join for ``how`` ∈ {inner,
    left} — and ONLY those: a right/full/semi join would see the
    unmatched dim replicas as extra null-extended rows, so any other
    ``how`` raises instead of silently corrupting the result.
    ``keep_salt=True`` retains ``__salt`` for tests/diagnostics.
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join_hot_keys supports how='inner'/'left' only, "
            f"got {how!r}: dim-side replicas would null-extend under "
            "right/full/semi semantics"
        )
    hot = (
        facts.groupBy(key)
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") >= hot_row_threshold)
        .select(key, F.lit(True).alias("__hot"))
    )
    fact_salt = (
        F.when(
            F.col("__hot").isNotNull(),
            F.pmod(
                F.hash(
                    *[F.col(c) for c in facts.columns],
                    F.monotonically_increasing_id(),
                ),
                F.lit(salt_buckets),
            ),
        )
        .otherwise(F.lit(0))
        .cast("int")
    )
    f = (
        facts.join(F.broadcast(hot), key, "left")
        .withColumn("__salt", fact_salt)
        .drop("__hot")
    )
    dim_salts = F.when(
        F.col("__hot").isNotNull(),
        F.sequence(F.lit(0), F.lit(salt_buckets - 1)),
    ).otherwise(F.array(F.lit(0)))
    d = (
        dim.join(F.broadcast(hot), key, "left")
        .withColumn("__salt", F.explode(dim_salts.cast("array<int>")))
        .drop("__hot")
    )
    joined = f.join(d, [key, "__salt"], how)
    return joined if keep_salt else joined.drop("__salt")
