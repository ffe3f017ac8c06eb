"""Physical-plan introspection for scale auditing.

Correctness says what a query returns; the plan says whether it will
survive a 100× scale-up. ``plan_summary`` extracts the facts that
matter — join strategies, exchange count, scan pushdown/pruning,
Python-evaluation nodes, top-k operators — so tests (and humans) can
assert on them instead of eyeballing ``explain()`` output.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def plan_string(df: DataFrame) -> str:
    """The physical plan as text (pre-execution; AQE may refine it)."""
    return df._jdf.queryExecution().executedPlan().toString()


def plan_summary(df: DataFrame) -> dict:
    """Scale-relevant plan facts for assertions and reports."""
    p = plan_string(df)
    return {
        "broadcast_hash_joins": p.count("BroadcastHashJoin"),
        "broadcast_nl_joins": p.count("BroadcastNestedLoopJoin"),
        "sort_merge_joins": p.count("SortMergeJoin"),
        "shuffled_hash_joins": p.count("ShuffledHashJoin"),
        "exchanges": len(re.findall(r"\bExchange\b", p)),
        "parquet_scans": p.count("Scan parquet"),
        "take_ordered": p.count("TakeOrderedAndProject"),
        "global_sorts": len(re.findall(r"\bSort\b(?!Merge)", p)),
        "python_row_udfs": p.count("BatchEvalPython"),
        "python_arrow_udfs": p.count("ArrowEvalPython")
        + p.count("MapInPandas")
        + p.count("FlatMapGroupsInPandas"),
        "pushed_filters": re.findall(r"PushedFilters: \[([^\]]*)\]", p),
        "read_schemas": re.findall(r"ReadSchema: struct<([^>]*)>", p),
    }
