"""As-of and range joins — temporal operators Spark lacks natively.

Both are built from shuffle-friendly primitives (no cross join, no
per-row Python):

- ``asof_join``: for each left row, the latest right row with
  ``right.ts <= left.ts`` within the same ``by`` key. Implemented as
  the classic union + ordered window: tag both sides, sort within
  the ``by`` partition by (ts, side), carry the last right value
  forward with ``last(ignorenulls=True)``. ONE shuffle on the by-key
  — the same cost as a co-partitioned equi-join, regardless of how
  many left rows each right row serves.
- ``range_join_binned``: left.ts ∈ [right.start, right.end) joins.
  A naive theta-join degenerates to nested loops; binning quantizes
  time into fixed buckets, explodes each right interval to the
  buckets it overlaps (bounded fan-out), equi-joins on the bucket,
  then applies the exact predicate. At 100 TB the bucket width is
  tuned so fan-out × right ≪ left, and the equi-join
  shuffles/broadcasts like any other.

The DuckDB oracle uses the native ``ASOF JOIN`` / ``BETWEEN`` join,
so these compositions are value-checked against a first-class
implementation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    ts: str = "ts",
    by: str = "user_id",
    value_cols: list[str] | None = None,
    strict: bool = False,
) -> DataFrame:
    """Left rows + the latest right row at-or-before their timestamp.

    ``strict=True`` uses ``right.ts < left.ts`` instead of ``<=``
    (ties then do NOT match). Right-side columns come back prefixed
    ``asof_`` (plus ``asof_ts``); unmatched left rows keep nulls.
    """
    vals = value_cols if value_cols is not None else [
        c for c in right.columns if c not in (ts, by)
    ]
    lhs = left.select(
        F.col(by),
        F.col(ts),
        F.lit(1).alias("__side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}")
          for c in vals],
        F.lit(None).cast(right.schema[ts].dataType).alias("__r_ts"),
        F.lit(None).cast("long").alias("__tie"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__l"),
    )
    rhs = right.select(
        F.col(by),
        F.col(ts),
        F.lit(0).alias("__side"),
        *[F.col(c).alias(f"__r_{c}") for c in vals],
        F.col(ts).alias("__r_ts"),
        # deterministic tiebreak among right rows sharing (by, ts):
        # without it, last(ignorenulls) picks whichever duplicate the
        # partitioning happened to order last — nondeterministic
        # across runs. Hash of the value columns is arbitrary but
        # stable, which is all a tiebreak needs.
        F.xxhash64(*([F.col(c) for c in vals] or [F.col(ts)])).alias(
            "__tie"
        ),
        F.lit(None).cast(lhs.schema["__l"].dataType).alias("__l"),
    )
    # ties: side 0 (right) sorts before side 1 (left) for `<=`
    # semantics; strict mode flips the order so a tied right row is
    # not yet visible to the left row. __tie only discriminates
    # same-(by, ts) right rows (left rows carry NULL).
    order = [F.col(ts).asc(), F.col("__side").asc() if not strict
             else F.col("__side").desc(),
             F.col("__tie").asc_nulls_first()]
    w = (
        Window.partitionBy(by)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = (
        lhs.unionByName(rhs)
        .select(
            "*",
            *[
                F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"asof_{c}")
                for c in vals
            ],
            F.last("__r_ts", ignorenulls=True).over(w).alias("asof_ts"),
        )
        .filter(F.col("__side") == 1)
    )
    out_cols = [F.col("__l")[c].alias(c) for c in left.columns]
    return carried.select(
        *out_cols, *[F.col(f"asof_{c}") for c in vals], "asof_ts"
    )


def range_join_binned(
    points: DataFrame,
    intervals: DataFrame,
    ts: str = "ts",
    start: str = "start",
    end: str = "end",
    bin_seconds: int = 3600,
) -> DataFrame:
    """points ⨝ intervals on ``start <= ts < end`` via bucket
    equi-join. Every interval explodes to its overlapped buckets
    (fan-out = ⌈duration/bin⌉), points map to one bucket each; the
    exact predicate filters after the equi-join.
    """
    p = points.withColumn(
        "__bin", F.floor(F.col(ts).cast("double") / bin_seconds)
    )
    i = intervals.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.floor(F.col(start).cast("double") / bin_seconds),
                F.floor(F.col(end).cast("double") / bin_seconds),
            )
        ),
    )
    return (
        p.join(i, "__bin")
        .filter((F.col(start) <= F.col(ts)) & (F.col(ts) < F.col(end)))
        .drop("__bin")
    )
