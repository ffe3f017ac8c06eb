"""Aggregated query/oracle registry — the driver contract's backing.

Each submodule contributes ``QUERIES`` (name → (spark, sf_dir) →
DataFrame) and ``ORACLES`` (name → DuckDB SQL). Keys without an
oracle get the driver's weaker rows-only check (documented per
entry).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from . import (
    analyticsq,
    enrichq,
    olapq,
    coreq,
    crudq,
    curationq,
    eventsq,
    functionsq,
    graphq,
    mmq,
    pipelineq,
    qualityq,
    samplingq,
    searchq,
    temporalq,
)

_MODULES = [
    analyticsq,
    enrichq,
    olapq,
    coreq,
    crudq,
    curationq,
    eventsq,
    functionsq,
    graphq,
    mmq,
    pipelineq,
    qualityq,
    samplingq,
    searchq,
    temporalq,
]


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for m in _MODULES:
        overlap = out.keys() & m.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query keys: {sorted(overlap)}")
        out.update(m.QUERIES)
    return out


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for m in _MODULES:
        out.update(m.ORACLES)
    return out
