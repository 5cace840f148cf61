"""Shared helpers for query modules."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    """Parquet scan — Catalyst pushes filters/projections into this.

    `events.parquet` stores TIMESTAMP(NANOS). Depending on the Spark
    build this surfaces either as raw nanos LongType (via the
    ``nanosAsLong`` legacy conf) or natively as TIMESTAMP_NTZ; both are
    normalized to a microsecond TimestampType here (session timezone is
    pinned to UTC, so the NTZ→LTZ cast is value-identical and the data
    is µs-clean — lossless and oracle-identical either way)."""
    path = f"{sf_dir}/{table}.parquet"
    if table != "events":
        return spark.read.parquet(path)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    for field in df.schema.fields:
        if field.name != "ts":
            continue
        if isinstance(field.dataType, T.LongType):
            # nanos as raw long — integer div; double division would
            # round the last µs digit
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif isinstance(field.dataType, T.TimestampNTZType):
            df = df.withColumn("ts", F.col("ts").cast(T.TimestampType()))
    return df
