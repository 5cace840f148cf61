"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship query (TPC-H-Q1-shaped pricing summary) at sf0.001.
queries()     — every implemented operator from SURVEY.md §2 + the
                LLM-pipeline north-star set, keyed by stable names.
oracle_sql()  — matching DuckDB SQL for the sf0.01 hash-compare gate.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from binance_data_ingestor_spark.queries import registry  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    qs, _ = registry()
    return qs["q01_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    qs, _ = registry()
    return qs


def oracle_sql() -> dict[str, str]:
    _, sql = registry()
    return sql
