"""Partitioning helpers.

The test fixtures are single-row-group parquet files, so a bare scan is
ONE task no matter how many cores exist; on a real cluster the same
happens whenever upstream produced few large files. Operators whose
per-row cost dominates the scan (JSON decode, shingling, hashing,
vector math) should decouple their parallelism from the file layout
with an explicit round-robin repartition — the shuffle moves each row
once and buys full-cluster fan-out for everything downstream.

Cheap scan→aggregate queries should NOT do this: the exchange their
groupBy already performs is enough, and an extra shuffle would just
double network traffic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fanout(df: DataFrame, partitions: int | None = None) -> DataFrame:
    """Repartition to the session's default parallelism (or an explicit
    count) ahead of CPU-heavy per-row work."""
    n = partitions or df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(n)
