"""Query registry: every operator from SURVEY.md §2 as a (Spark, oracle-SQL) pair.

Each module exposes:
    QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]]
    ORACLES: dict[str, str]   # ANSI SQL for DuckDB; omit for non-SQL ops

``registry()`` merges them. Names are stable; the driver hash-compares
Spark output vs DuckDB output per name at sf0.01.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from .util import load  # noqa: F401  (re-export)


def _modules():
    from . import (
        analytics_ops,
        binance_ops,
        cdc_ops,
        cleaning_ops,
        graph_ops,
        ml_ops,
        multimodal_ops,
        profiling_ops,
        quality_ops,
        relational,
        similarity_ops,
        streaming_like,
        text_ops,
        timeseries_ops,
    )

    return [
        relational,
        streaming_like,
        binance_ops,
        text_ops,
        similarity_ops,
        multimodal_ops,
        cdc_ops,
        analytics_ops,
        cleaning_ops,
        graph_ops,
        timeseries_ops,
        profiling_ops,
        ml_ops,
        quality_ops,
    ]


def registry() -> tuple[dict[str, Callable[[SparkSession, str], DataFrame]], dict[str, str]]:
    queries: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    oracles: dict[str, str] = {}
    for mod in _modules():
        for name, fn in mod.QUERIES.items():
            if name in queries:
                raise ValueError(f"duplicate query name: {name}")
            queries[name] = fn
        oracles.update(mod.ORACLES)
    return queries, oracles
