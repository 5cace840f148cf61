"""Exact distributed quantiles via two-pass histogram refinement.

`approx_percentile` (q12) is the sketch path; this module is the EXACT
path that still scales: a classic two-pass scheme in pure DataFrame ops.

Pass 1 histograms values into fixed-width buckets — a groupBy whose
result is (groups × occupied buckets), tiny no matter the fact size.
A cumulative window over that histogram locates, per group, the bucket
holding each target rank and the in-bucket offset. Pass 2 re-scans the
fact FILTERED to those target buckets (predicate pushes into the scan)
and sorts ONLY inside them — a (group, bucket)-partitioned window over
~1/|buckets| of one group's rows, never a global sort.

Driver state: zero. The "which bucket holds rank r" decision is a join
against the histogram, not a collect; the target-bucket table
(≤ 2 rows/group) broadcasts into the probe.

At 100 TB: pass 1 is one map-side-combinable aggregation; pass 2 sorts
only the straddling buckets, so per-task memory is bounded by bucket
width (tunable), not group size. The same shape extends to any exact
quantile set by changing the rank list.

Everything is integer arithmetic (cents in, cents out) — the only
float is one final IEEE division of exact integers, so Spark and the
DuckDB oracle agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def exact_grouped_median(
    df: DataFrame,
    key_col: str,
    cents_col: str,
    *,
    bucket_width: int = 100_000,
) -> DataFrame:
    """Exact per-group median of an integer (cents) column.

    Returns one row per group: ``n_rows`` (bigint), ``median_x2_cents``
    (bigint — lower middle + upper middle, exact for both parities),
    and ``median_r`` (double — one IEEE division of the exact sum).
    """
    b = df.select(F.col(key_col).alias("g"), F.col(cents_col).alias("v")).withColumn(
        "bucket", F.expr(f"v div {int(bucket_width)}")
    )

    # Pass 1: (group, bucket) histogram + cumulative counts below each bucket.
    hist = (
        b.groupBy("g", "bucket")
        .agg(F.count("*").alias("cnt"))
        .withColumn(
            "cum_before",
            F.coalesce(
                F.sum("cnt").over(
                    W.partitionBy("g")
                    .orderBy("bucket")
                    .rowsBetween(W.unboundedPreceding, -1)
                ),
                F.lit(0).cast("long"),
            ),
        )
    )
    totals = hist.groupBy("g").agg(F.sum("cnt").cast("long").alias("n_rows"))

    # Both middle ranks (equal when n is odd); duplicate rank → weight 2.
    ranks = totals.select(
        "g",
        "n_rows",
        F.explode(
            F.array(F.expr("(n_rows + 1) div 2"), F.expr("(n_rows + 2) div 2"))
        ).alias("rank"),
    )
    targets = (
        ranks.join(hist, "g")
        .filter(
            (F.col("cum_before") < F.col("rank"))
            & (F.col("rank") <= F.col("cum_before") + F.col("cnt"))
        )
        .select(
            "g",
            "n_rows",
            "bucket",
            (F.col("rank") - F.col("cum_before")).alias("offset"),
        )
        .groupBy("g", "n_rows", "bucket", "offset")
        .agg(F.count("*").cast("long").alias("weight"))
    )

    # Pass 2: probe only the straddling buckets; sort inside them only.
    probe = b.join(
        F.broadcast(targets.select("g", "bucket").distinct()), ["g", "bucket"]
    ).withColumn(
        "rn", F.row_number().over(W.partitionBy("g", "bucket").orderBy("v"))
    )
    # bracket/F.col refs only: "offset" collides with DataFrame.offset()
    pa, ta = probe.alias("p"), targets.alias("t")
    picked = pa.join(
        F.broadcast(ta),
        on=(
            (F.col("p.g") == F.col("t.g"))
            & (F.col("p.bucket") == F.col("t.bucket"))
            & (F.col("p.rn") == F.col("t.offset"))
        ),
    ).select(
        F.col("t.g").alias("g"),
        F.col("t.n_rows").alias("n_rows"),
        (F.col("p.v") * F.col("t.weight")).alias("wv"),
    )

    out = picked.groupBy("g", "n_rows").agg(
        F.sum("wv").cast("long").alias("median_x2_cents")
    )
    return out.select(
        F.col("g").alias(key_col),
        "n_rows",
        "median_x2_cents",
        (F.col("median_x2_cents").cast("double") / F.lit(200.0)).alias("median_r"),
    )
