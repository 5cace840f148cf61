"""Distribution statistics that need a cumulative pass: two-sample
Kolmogorov-Smirnov and Kaplan-Meier survival.

Both are "cumulate over a sorted axis" shapes. The scale rule applied
here (same as ``partitioning.with_global_rank``): cumulate over an
AGGREGATED axis whenever possible, and when the raw axis is large,
bucket it — per-bucket partial sums first (parallel), an exclusive
prefix over the bucket SUMMARY second (the only serialized step,
|buckets| rows), within-bucket cumulation + offset third (parallel).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def ks_2sample(
    df: DataFrame,
    value_col: str,
    group_col: str,
    *,
    bucket_width: int = 1_000_000,
) -> DataFrame:
    """Exact two-sample KS statistic over an integer value column.

    ``group_col`` must be 0/1. Returns ONE row: n1, n2, d_stat (the
    sup-distance between the two empirical CDFs) and the asymptotic
    two-sided p-value approximation (rounded 6 dp — its exp() is the
    only transcendental).

    The CDF difference is evaluated at every distinct value — exact,
    not binned. Distinct values aggregate first (one shuffle); their
    cumulative counts run bucketed: per-bucket sums, exclusive prefix
    over the bucket summary (|buckets| rows — the only single-task
    step), within-bucket running sums + offset. Every division is a
    single IEEE op on exact integers, and the final max is order-free,
    so the statistic is bit-identical across engines and partitionings.
    """
    v, g = F.col(value_col), F.col(group_col)
    per_v = df.groupBy(v.alias("v")).agg(
        F.count(F.when(g == 0, 1)).alias("c1"),
        F.count(F.when(g == 1, 1)).alias("c2"),
    )
    b = per_v.withColumn("bkt", F.expr(f"v div {int(bucket_width)}"))
    sums = b.groupBy("bkt").agg(
        F.sum("c1").alias("s1"), F.sum("c2").alias("s2")
    )
    wo = W.orderBy("bkt")
    offsets = sums.select(
        "bkt",
        (F.sum("s1").over(wo) - F.col("s1")).alias("o1"),
        (F.sum("s2").over(wo) - F.col("s2")).alias("o2"),
    )
    wb = W.partitionBy("bkt").orderBy("v")
    cum = (
        b.join(offsets, "bkt")
        .select(
            "v",
            (F.sum("c1").over(wb) + F.col("o1")).alias("f1"),
            (F.sum("c2").over(wb) + F.col("o2")).alias("f2"),
        )
    )
    totals = df.agg(
        F.count(F.when(g == 0, 1)).alias("n1"),
        F.count(F.when(g == 1, 1)).alias("n2"),
    )
    diff = F.abs(
        F.col("f1").cast("double") / F.col("n1").cast("double")
        - F.col("f2").cast("double") / F.col("n2").cast("double")
    )
    out = (
        cum.crossJoin(F.broadcast(totals))
        .select("n1", "n2", diff.alias("d"))
        .groupBy("n1", "n2")
        .agg(F.max("d").alias("d_stat"))
    )
    ne = (
        F.col("n1").cast("double")
        * F.col("n2").cast("double")
        / (F.col("n1") + F.col("n2")).cast("double")
    )
    return out.select(
        "n1",
        "n2",
        "d_stat",
        F.round(
            F.least(
                F.lit(1.0),
                F.lit(2.0) * F.exp(F.lit(-2.0) * F.col("d_stat") * F.col("d_stat") * ne),
            ),
            6,
        ).alias("p_approx_r"),
    )


def kaplan_meier(subjects: DataFrame, *, t_col: str = "t", event_col: str = "died") -> DataFrame:
    """Kaplan-Meier survival curve from (duration, event) subjects.

    One subjects-sized shuffle (groupBy duration); the cumulative pass
    runs on the KM TABLE — one row per distinct duration (days-sized,
    bounded by calendar span, never subjects-sized), so the global
    window over it is a deliberate summary-only serialization.

    survival(t) = Π_{t'≤t} (1 - d/n). Emitted as
    round(exp(Σ ln(1-d/n)), 6): the ln terms are the only
    transcendentals, the running sum's order is the duration order on
    both engines, and 6 dp has ~8 orders of headroom over the
    accumulated cross-engine ulp noise. A timepoint where everyone at
    risk dies (d = n) zeroes the curve from there on via an explicit
    flag — never ln(0).
    """
    t, e = F.col(t_col), F.col(event_col)
    km = subjects.groupBy(t.alias("t")).agg(
        F.sum(e).cast("long").alias("d"), F.count("*").alias("c")
    )
    total = subjects.agg(F.count("*").alias("n_total"))
    wo = W.orderBy("t")
    km = (
        km.crossJoin(F.broadcast(total))
        .withColumn(
            "n_at_risk",
            (F.col("n_total") - (F.sum("c").over(wo) - F.col("c"))).cast("long"),
        )
        .withColumn(
            "lnterm",
            F.when(
                F.col("d") < F.col("n_at_risk"),
                F.log(
                    F.lit(1.0)
                    - F.col("d").cast("double") / F.col("n_at_risk").cast("double")
                ),
            ).otherwise(F.lit(0.0)),
        )
        .withColumn(
            "survival_r",
            F.when(
                F.max((F.col("d") == F.col("n_at_risk")).cast("int")).over(wo) == 1,
                F.lit(0.0),
            ).otherwise(F.round(F.exp(F.sum("lnterm").over(wo)), 6)),
        )
    )
    return km.filter(F.col("d") > 0).select("t", "d", "n_at_risk", "survival_r")
