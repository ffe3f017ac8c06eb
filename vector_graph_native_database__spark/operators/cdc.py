"""Change-data-capture / slowly-changing-dimension operators
(SURVEY §7.4 extension).

The reference's mutation surface is upsert/partial-update routes
that overwrite in place (``/root/reference/app.py:244-320``); a
warehouse keeping history needs the MERGE-with-versioning shape
instead. ``scd2_merge`` folds an updates batch into a base table as
SCD type-2 version chains — the standard dimension-history pattern —
as one union + one per-key window, i.e. a single shuffle keyed by
the business key. At 100 TB the updates side is the small delta;
the union's window partitions by key so AQE handles the skewed-key
case, and no state beyond the frame itself is required (contrast
MERGE INTO engines that need a transaction log — the output IS the
new table, writable atomically via the versioned-snapshot commit in
``streaming/state.py``).
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_merge(
    base: DataFrame,
    updates: DataFrame,
    key_cols: Sequence[str],
    tracked_cols: Sequence[str],
) -> DataFrame:
    """SCD type-2 merge → one row per (key, version) with
    ``valid_from`` / ``valid_to`` / ``is_current``.

    ``base`` rows are version 1, ``updates`` rows version 2; rows of
    ``updates`` whose tracked columns equal the base row are dropped
    (no-op updates produce no new version — the standard MERGE
    semantics). ``valid_to`` is the next version's ``valid_from``
    (open chain → NULL, surfaced as ``is_current``). Exactly one
    shuffle: the anti-equality filter joins updates to base on the
    key (updates side broadcastable when it is a small delta), and
    the chain fold is one ``lead`` window over the same key.
    """
    keys = list(key_cols)
    tracked = list(tracked_cols)
    base_v = base.select(*keys, *tracked, F.lit(1).alias("valid_from"))
    all_equal = reduce(
        lambda a, b: a & b,
        [F.expr(f"u.{c} <=> b.{c}") for c in tracked],
    )
    changed = (
        updates.alias("u")
        .join(base.alias("b"), keys, "left")
        .filter(~all_equal)
        .select(*[F.col(f"u.{c}") for c in keys + tracked])
        .withColumn("valid_from", F.lit(2))
    )
    w = Window.partitionBy(*keys).orderBy("valid_from")
    return (
        base_v.unionByName(changed)
        .withColumn("valid_to", F.lead("valid_from").over(w))
        .withColumn("is_current", F.col("valid_to").isNull())
    )


def changelog_apply(
    base: DataFrame,
    changelog: DataFrame,
    key_cols: Sequence[str],
    seq_col: str = "seq",
    op_col: str = "op",
) -> DataFrame:
    """Apply an ordered insert/update/delete changelog to a snapshot
    → the new snapshot (log compaction, the Debezium/Kafka-connect
    apply step every lakehouse ingestion runs).

    ``changelog`` rows carry the full payload plus ``op`` ∈
    {'I','U','D'} and a monotonically increasing ``seq``; the base
    snapshot acts as seq 0. Per key, the highest-seq row wins, with
    changelog rows beating the synthetic base row on an equal seq
    (so a log entry carrying seq 0 still deterministically overrides
    the snapshot); a winning 'D' removes the key. Duplicate seqs
    WITHIN the changelog for one key are a producer contract
    violation (Debezium/Kafka offsets are unique per key) — the
    source tiebreak makes base-vs-log ties deterministic but
    log-vs-log ties are undefined. One union + ONE per-key window
    shuffle — never a join per operation type, never a driver loop
    over the log. At 100 TB the changelog is the small delta and the
    per-key window is the same single-shuffle shape as scd2_merge;
    compaction output is written via the atomic versioned-snapshot
    commit (streaming/state.py) exactly like streaming state.
    """
    keys = list(key_cols)
    payload = [
        c for c in base.columns if c not in keys
    ]
    base_v = base.select(
        *keys, *payload,
        F.lit(0).cast("long").alias(seq_col),
        F.lit("I").alias(op_col),
        F.lit(0).alias("__src"),
    )
    log_v = changelog.select(
        *keys, *payload, seq_col, op_col, F.lit(1).alias("__src")
    )
    w = Window.partitionBy(*keys).orderBy(
        F.desc(seq_col), F.desc("__src")
    )
    return (
        base_v.unionByName(log_v)
        .withColumn("__rn", F.row_number().over(w))
        .filter((F.col("__rn") == 1) & (F.col(op_col) != "D"))
        .drop("__rn", "__src", seq_col, op_col)
    )


def ivm_aggregate_delta(
    base: DataFrame,
    compacted_log: DataFrame,
    key_cols: Sequence[str],
    group_col: str,
    value_col: str,
    op_col: str = "op",
) -> DataFrame:
    """Incremental view maintenance of the aggregate view
    ``group → (n_rows, total)`` under an I/U/D changelog →
    the maintained view, WITHOUT re-aggregating the base table's
    unaffected rows: the delta frame is −(old contribution of
    affected keys) ∪ +(new contribution of surviving log rows),
    group-summed and added onto the stored view; groups whose count
    reaches zero drop out (exactly what a recompute would produce —
    the classic count+sum self-maintainable view).

    ``compacted_log`` carries one winner row per key (run
    ``changelog_apply``-style compaction first if the raw log has
    seq chains); 'D' rows mark deletes. At 100 TB this is the whole
    point of IVM: the delta side is changelog-sized, the view side
    is group-cardinality-sized, and the base table is touched ONLY
    for the affected keys (a key-list semi-join that prunes on the
    join key) — never rescanned. Sums run in DECIMAL so increments
    commute exactly.
    """
    keys = list(key_cols)
    dec = "decimal(30,10)"
    v = F.col(value_col).cast(dec)
    affected = compacted_log.select(*keys).distinct()
    old_neg = (
        base.join(affected, keys, "left_semi")
        .groupBy(group_col)
        .agg(
            (-F.count("*")).alias("dn"),
            (-F.sum(v)).alias("dv"),
        )
    )
    new_pos = (
        compacted_log.filter(F.col(op_col) != "D")
        .groupBy(group_col)
        .agg(F.count("*").alias("dn"), F.sum(v).alias("dv"))
    )
    delta = (
        old_neg.unionByName(new_pos)
        .groupBy(group_col)
        .agg(F.sum("dn").alias("dn"), F.sum("dv").alias("dv"))
    )
    view = base.groupBy(group_col).agg(
        F.count("*").alias("n"), F.sum(v).alias("tv")
    )
    merged = view.join(delta, group_col, "full_outer").select(
        group_col,
        (F.coalesce("n", F.lit(0)) + F.coalesce("dn", F.lit(0))).alias("n"),
        (
            F.coalesce(F.col("tv"), F.lit(0).cast(dec))
            + F.coalesce(F.col("dv"), F.lit(0).cast(dec))
        ).alias("tv"),
    )
    return merged.filter(F.col("n") > 0)


def ivm_join_delta(
    view: DataFrame,
    compacted_log: DataFrame,
    dim: DataFrame,
    key_cols: Sequence[str],
    dim_key_cols: Sequence[str],
    op_col: str = "op",
) -> DataFrame:
    """Incremental view maintenance of the JOIN view ``A ⋈ dim``
    under a compacted I/U/D changelog of the fact side A → the
    maintained view, WITHOUT re-joining A's unaffected rows — the
    delta-join rule ΔV = −V[affected keys] ∪ (ΔA⁺ ⋈ dim) for a
    static dimension, i.e. the other half of the IVM story next to
    ``ivm_aggregate_delta`` (aggregates there, join fan-in here).

    ``view`` is the stored materialization keyed by A's key
    (``key_cols``), carrying dim attributes already joined in;
    ``compacted_log`` has one winner row per key with ``op`` ∈
    {'I','U','D'} and A's full payload; ``dim`` must expose
    ``dim_key_cols`` under the SAME column names the log uses (the
    caller renames, e.g. c_custkey → o_custkey).

    Cost shape — the whole point at 100 TB: the stored view is
    touched only by a BROADCAST anti-join on the affected-key list
    (changelog-sized by the delta contract, same as
    ``ivm_aggregate_delta``), and the only join executed is
    delta ⋈ dim — changelog × dimension, never fact × dimension.
    A recompute engine pays the full fact-dim shuffle on every
    batch; this pays O(|Δ|).
    """
    keys = list(key_cols)
    affected = compacted_log.select(*keys).distinct()
    kept = view.join(F.broadcast(affected), keys, "left_anti")
    fresh = (
        compacted_log.filter(F.col(op_col) != "D")
        .drop(op_col)
        .join(dim, list(dim_key_cols), "inner")
        .select(*view.columns)
    )
    return kept.unionByName(fresh)
