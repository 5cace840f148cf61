"""Alternating A/B: q238_spearman current form (two independent
double_rank passes) vs fused form (one stacked summary + one
range-bucket + one cumsum over (g, var) + two slice joins).
Also checks output identity.
"""
import os
import sys
import time
import gc

sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F

from binance_data_ingestor_spark.session import get_spark
from binance_data_ingestor_spark.queries.util import load
from binance_data_ingestor_spark.queries.quality_ops import q238_spearman
from binance_data_ingestor_spark.operators.partitioning import (
    with_global_cumsum,
    with_range_bucket,
)

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def q238_fused(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("g"),
        F.col("l_quantity").cast("long").alias("x"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("y"),
    )
    # ONE stacked summary over (g, var, val): one scan+explode+groupBy
    # instead of two groupBys; one bucket+cumsum chain partitioned by
    # (g, var) instead of two.
    stacked = (
        li.select(
            "g",
            F.explode(
                F.array(
                    F.struct(F.lit("x").alias("var"), F.col("x").alias("val")),
                    F.struct(F.lit("y").alias("var"), F.col("y").alias("val")),
                )
            ).alias("p"),
        )
        .select("g", "p.var", "p.val")
        .groupBy("g", "var", "val")
        .agg(F.count("*").alias("cnt"))
    )
    b = with_range_bucket(stacked, F.col("val"), bucket_col="__rb")
    cum = with_global_cumsum(
        b,
        ["g", "var"],
        [F.asc("val")],
        "cnt",
        bucket=F.col("__rb"),
        out_col="cum",
    ).drop("__rb")
    dr = cum.select(
        "g", "var", "val", (2 * F.col("cum") - F.col("cnt") + 1).alias("dr")
    ).localCheckpoint(eager=False)
    rx = dr.filter(F.col("var") == "x").select(
        "g", F.col("val").alias("x"), F.col("dr").alias("dr_x")
    )
    ry = dr.filter(F.col("var") == "y").select(
        "g", F.col("val").alias("y"), F.col("dr").alias("dr_y")
    )
    dec = "decimal(38,0)"
    j = li.join(rx, ["g", "x"]).join(ry, ["g", "y"])
    agg = j.groupBy("g").agg(
        F.count("*").alias("n"),
        F.sum("dr_x").alias("sx"),
        F.sum("dr_y").alias("sy"),
        F.sum(F.col("dr_x").cast(dec) * F.col("dr_y")).alias("sxy"),
        F.sum(F.col("dr_x").cast(dec) * F.col("dr_x")).alias("sxx"),
        F.sum(F.col("dr_y").cast(dec) * F.col("dr_y")).alias("syy"),
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    den = F.sqrt(
        F.greatest(F.lit(0.0), n * F.col("sxx").cast("double") - sx * sx)
    ) * F.sqrt(
        F.greatest(F.lit(0.0), n * F.col("syy").cast("double") - sy * sy)
    )
    return agg.select(
        "g",
        "n",
        "sx",
        "sy",
        F.col("sxy").cast("double").alias("sxy_d"),
        F.col("sxx").cast("double").alias("sxx_d"),
        F.col("syy").cast("double").alias("syy_d"),
        (
            (n * F.col("sxy").cast("double") - sx * sy)
            / F.nullif(den, F.lit(0.0))
        ).alias("spearman_r"),
    )


def main():
    spark = get_spark("ab_q238", extra_conf={"spark.ui.showConsoleProgress": "false"})
    old = sorted(map(tuple, q238_spearman(spark, SF).collect()))
    new = sorted(map(tuple, q238_fused(spark, SF).collect()))
    assert old == new, f"output mismatch:\n{old}\n{new}"
    print("identity check: fused == current", flush=True)
    times = {"old": [], "new": []}
    for rep in range(int(os.environ.get("AB_REPEAT", "4"))):
        for name, fn in [("old", q238_spearman), ("new", q238_fused)]:
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
