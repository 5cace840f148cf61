"""Shared helpers for query modules."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    """Parquet scan — Catalyst pushes filters/projections into this.

    `events.parquet` stores TIMESTAMP(NANOS), which Spark's vectorized
    parquet reader rejects; ``nanosAsLong`` reads them as raw nanos and
    we rebuild a microsecond TimestampType (the data is µs-clean, so
    this is lossless and oracle-identical)."""
    path = f"{sf_dir}/{table}.parquet"
    if table != "events":
        return spark.read.parquet(path)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    for field in df.schema.fields:
        # nanos columns surface as LongType where duckdb sees TIMESTAMP
        if field.name == "ts" and isinstance(field.dataType, T.LongType):
            # integer div — double division would round the last µs digit
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df
