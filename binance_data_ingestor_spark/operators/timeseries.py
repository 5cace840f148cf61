"""Time-series regularization operators: gap-filled grids with
last-observation-carried-forward (LOCF) interpolation.

The reference consumes exchange-regularized series (klines arrive on a
fixed interval grid, `/root/reference/binance-di.py:56-67`); this is the
engine-side generalization that turns ANY irregular event stream into a
regular grid — the `time_bucket_gapfill + locf` feature of time-series
stores, expressed as one union + one keyed window (a single shuffle).

Scale notes: the grid is (keys × buckets), generated from a 1-row
min/max aggregate broadcast — never collected to the driver. The LOCF
window partitions by key, so parallelism = key cardinality; for
low-key/high-volume streams, pre-aggregate per (key, bucket) first
(the helper does: one map-side-combinable groupBy) so the window sorts
buckets, not raw events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def gap_fill_locf(
    events: DataFrame,
    key: str,
    ts: str,
    value: str,
    step: str = "1 hour",
    tie_break: str | None = None,
) -> DataFrame:
    """Regular ``step`` grid per ``key`` spanning the observed time range,
    with ``value`` carried forward from the latest observation at or
    before each grid point (null before a key's first observation).

    Returns columns ``(key, grid_ts, locf_value)``.

    ``tie_break``: column deciding the winner among observations sharing
    an exact (key, ts) — highest wins (defaults to last-in-scan, which
    is nondeterministic; pass an id column for reproducible output).
    """
    obs = events.select(key, ts, value, *( [tie_break] if tie_break else [] ))
    if tie_break:
        # dedup exact-timestamp collisions deterministically; also the
        # pre-aggregation that keeps the window over buckets, not rows
        obs = obs.groupBy(key, ts).agg(F.max_by(value, tie_break).alias(value))

    span = events.agg(
        F.date_trunc("hour", F.min(ts)).alias("lo"),
        F.date_trunc("hour", F.max(ts)).alias("hi"),
    )
    grid = (
        events.select(key).distinct()
        .join(F.broadcast(span))
        .select(
            key,
            F.explode(
                F.sequence("lo", "hi", F.expr(f"interval {step}"))
            ).alias(ts),
        )
    )

    # union marker orders real observations before grid points at equal
    # ts, so a grid point lands ON an observation inclusively (>= asof)
    unioned = obs.withColumn("_grid", F.lit(0)).unionByName(
        grid.withColumn(value, F.lit(None).cast(obs.schema[value].dataType))
        .withColumn("_grid", F.lit(1))
    )
    w = (
        W.partitionBy(key)
        .orderBy(ts, "_grid")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        unioned.withColumn("locf_value", F.last(value, ignorenulls=True).over(w))
        .filter(F.col("_grid") == 1)
        .select(key, F.col(ts).alias("grid_ts"), "locf_value")
    )
