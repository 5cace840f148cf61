"""Alternating A/B: q22 current form (sliding RANGE-frame max) vs exact
two-level bucket decomposition of the max (prefix-max within bucket +
probe-row suffix-max within previous bucket + join-back), guide §2.4.

Window width = 86401 s inclusive ([t-86400, t]); bucket width B = 86401
=> every window spans at most two buckets and the decomposition
  max = greatest(prefix_max(own bucket up to t),
                 suffix_max(bucket(t-86400) from t-86400))
is exact (when both endpoints share a bucket, bucket_end == t and both
terms equal the window max).
"""
import gc
import os
import sys
import time

sys.path.insert(0, "/root/repo")
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from binance_data_ingestor_spark.session import get_spark
from binance_data_ingestor_spark.queries.util import load
from binance_data_ingestor_spark.queries.streaming_like import (
    Q22_CHUNK_SEC,
    q22_rolling_24h,
)

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
B = 86401


def q22_bucketed(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    base = ev.select(
        "event_id",
        "event_type",
        "value",
        F.col("ts").cast("long").alias("sec"),
    )
    chunk = F.expr(f"sec div {Q22_CHUNK_SEC}")
    own = base.select("*", chunk.alias("chunk"), F.lit(0).alias("is_ctx"))
    ctx = base.filter(
        F.col("sec") >= (chunk + 1) * Q22_CHUNK_SEC - 86400
    ).select("*", (chunk + 1).alias("chunk"), F.lit(1).alias("is_ctx"))
    rows = own.unionByName(ctx)

    data = rows.select(
        "event_id",
        "event_type",
        "chunk",
        "is_ctx",
        "sec",
        "value",
        F.lit(0).alias("kind"),
        F.lit(None).cast("long").alias("origin_id"),
    )
    probes = rows.filter(F.col("is_ctx") == 0).select(
        F.lit(None).cast("long").alias("event_id"),
        "event_type",
        "chunk",
        F.lit(1).alias("is_ctx"),
        (F.col("sec") - 86400).alias("sec"),
        F.lit(None).cast(data.schema["value"].dataType).alias("value"),
        F.lit(1).alias("kind"),
        F.col("event_id").alias("origin_id"),
    )
    u = data.unionByName(probes).withColumn("bkt", F.expr(f"sec div {B}"))

    wpre = (
        W.partitionBy("event_type", "chunk", "bkt")
        .orderBy("sec")
        .rangeBetween(W.unboundedPreceding, 0)
    )
    wsuf = (
        W.partitionBy("event_type", "chunk", "bkt")
        .orderBy(F.desc("sec"), F.asc("kind"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    u = u.select(
        "*",
        F.max("value").over(wpre).alias("__pmax"),
        F.max("value").over(wsuf).alias("__smax"),
    )
    smax_tbl = u.filter(F.col("kind") == 1).select(
        F.col("origin_id").alias("event_id"), F.col("__smax").alias("__psmax")
    )
    datw = u.filter(F.col("kind") == 0).drop("kind", "origin_id", "__smax", "bkt")

    wcur = (
        W.partitionBy("event_type", "chunk")
        .orderBy("sec")
        .rangeBetween(W.unboundedPreceding, 0)
    )
    wold = (
        W.partitionBy("event_type", "chunk")
        .orderBy("sec")
        .rangeBetween(W.unboundedPreceding, -86401)
    )
    out = (
        datw.select(
            "event_id",
            "event_type",
            "is_ctx",
            "__pmax",
            F.round(
                F.sum("value").over(wcur)
                - F.coalesce(F.sum("value").over(wold), F.lit(0.0)),
                2,
            ).alias("rolling_sum_24h"),
            (F.count("*").over(wcur) - F.count("*").over(wold)).alias(
                "rolling_n_24h"
            ),
        )
        .filter(F.col("is_ctx") == 0)
        .drop("is_ctx")
    )
    return (
        out.join(smax_tbl.hint("shuffle_hash"), "event_id")
        .select(
            "event_id",
            "event_type",
            "rolling_sum_24h",
            "rolling_n_24h",
            F.round(F.greatest("__pmax", "__psmax"), 2).alias("rolling_max_24h"),
        )
    )


def main():
    spark = get_spark("ab_q22", extra_conf={"spark.ui.showConsoleProgress": "false"})
    old_df = q22_rolling_24h(spark, SF)
    new_df = q22_bucketed(spark, SF)
    new_df = new_df.select(*old_df.columns)
    d1 = new_df.exceptAll(old_df).count()
    d2 = old_df.exceptAll(new_df).count()
    assert d1 == 0 and d2 == 0, f"mismatch: {d1} / {d2}"
    print("identity check: bucketed == current (exceptAll both ways = 0)", flush=True)
    times = {"old": [], "new": []}
    for rep in range(int(os.environ.get("AB_REPEAT", "4"))):
        for name, fn in [("old", q22_rolling_24h), ("new", q22_bucketed)]:
            gc.collect()
            t0 = time.perf_counter()
            fn(spark, SF).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            times[name].append(dt)
            print(f"rep{rep} {name}: {dt:.3f}s", flush=True)
    for name, ts in times.items():
        print(f"{name}: min={min(ts):.3f} all={[round(t,2) for t in ts]}")


if __name__ == "__main__":
    main()
