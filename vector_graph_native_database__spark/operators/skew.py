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

from pyspark.sql import Column, DataFrame
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
    hot_keys: DataFrame,
    salt_buckets: int = 16,
) -> Column:
    """Not a helper you call — see salted_agg. Kept as documentation:
    for skewed JOINS prefer (a) ``F.broadcast`` when the dim side
    fits, (b) AQE's ``skewJoin`` (enabled in session.py) otherwise;
    manual join salting (replicate dim rows per salt) is the last
    resort and intentionally not shipped until an operator needs it.
    """
    raise NotImplementedError(
        "use F.broadcast or AQE skew-join; see docstring"
    )
