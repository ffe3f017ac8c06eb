"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Engine: ``vector_graph_native_database__spark``. The registry
(``vector_graph_native_database__spark/registry/``) maps every
SURVEY.md §2 operator to a named query + DuckDB oracle; float
outputs are rounded to 6 decimals on BOTH sides (the reference
tests' epsilon) and ranked outputs are totally ordered by
(score DESC, id ASC) per SURVEY §4.8.5.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from vector_graph_native_database__spark import registry

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: hybrid vector+graph search over sf0.001."""
    return registry.all_queries()["hybrid_search"](spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return registry.all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent for each queries() key."""
    return registry.all_oracles()
