"""Time-series regularization + anomaly queries over the `events` log.

The reference's kline stream is an exchange-regularized series
(`/root/reference/binance-di.py:56-67`); q82 produces the same regular-
grid shape from an irregular stream inside the engine, and q83 is the
monitoring query its consumers approximate by eyeballing printed
metrics (`/root/reference/tests/test_redis-data-full.py:47-59`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..operators.timeseries import gap_fill_locf
from .util import load


# --------------------------------------------------------------------------
# q82 — hourly gap-filled grid per event_type with LOCF interpolation
# (time_bucket_gapfill + locf). One shuffle: the union'd window on
# event_type; the grid derives from a broadcast 1-row span aggregate
# and the per-(key,ts) pre-aggregation is map-side combinable.
# Parallelism = key cardinality (5 here) — at real scale keys are
# symbols/series ids (thousands), and the window sorts buckets, not
# raw events.
# --------------------------------------------------------------------------
def q82_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    out = gap_fill_locf(
        ev, key="event_type", ts="ts", value="value",
        step="1 hour", tie_break="event_id",
    )
    return out.select(
        "event_type",
        "grid_ts",
        F.round("locf_value", 6).alias("locf_r"),
    )


Q82_SQL = """
WITH obs AS (
  SELECT event_type, ts, arg_max(value, event_id) AS value
  FROM events GROUP BY event_type, ts),
span AS (
  SELECT date_trunc('hour', min(ts)) AS lo, date_trunc('hour', max(ts)) AS hi
  FROM events),
grid AS (
  SELECT k.event_type, g.ts
  FROM (SELECT DISTINCT event_type FROM events) k,
       (SELECT unnest(generate_series((SELECT lo FROM span),
                                      (SELECT hi FROM span),
                                      INTERVAL '1 hour')) AS ts) g)
SELECT g.event_type, g.ts AS grid_ts, round(o.value, 6) AS locf_r
FROM grid g
ASOF LEFT JOIN obs o
  ON g.event_type = o.event_type AND g.ts >= o.ts
"""


# --------------------------------------------------------------------------
# q83 — rolling z-score anomaly detection: each event scored against
# the trailing 100 same-type events (mean/stddev window, ≥20 samples).
# One shuffle (window on event_type); the frame is rows-bounded so
# state per partition is O(100). Both engines compute stddev_samp over
# identical deterministic frames (ts, event_id order); z is rounded to
# 4 dp on both sides before the threshold filter.
# --------------------------------------------------------------------------
ZSCORE_FRAME = 100
ZSCORE_MIN_N = 20
ZSCORE_CUT = 2.5


def q83_rolling_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select("event_id", "event_type", "ts", "value")
    w = (
        W.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(-ZSCORE_FRAME, -1)
    )
    scored = ev.select(
        "event_id",
        "event_type",
        "value",
        F.count("value").over(w).alias("n_prev"),
        F.avg("value").over(w).alias("mu"),
        F.stddev_samp("value").over(w).alias("sd"),
    )
    return (
        scored.filter(
            (F.col("n_prev") >= ZSCORE_MIN_N) & (F.col("sd") > 0)
        )
        .select(
            "event_id",
            "event_type",
            "value",
            F.round((F.col("value") - F.col("mu")) / F.col("sd"), 4).alias("z_r"),
        )
        .filter(F.abs("z_r") > ZSCORE_CUT)
    )


Q83_SQL = f"""
WITH scored AS (
  SELECT event_id, event_type, value,
         count(value) OVER w AS n_prev,
         avg(value) OVER w AS mu,
         stddev_samp(value) OVER w AS sd
  FROM events
  WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
               ROWS BETWEEN {ZSCORE_FRAME} PRECEDING AND 1 PRECEDING))
SELECT event_id, event_type, value, round((value - mu) / sd, 4) AS z_r
FROM scored
WHERE n_prev >= {ZSCORE_MIN_N} AND sd > 0
  AND abs(round((value - mu) / sd, 4)) > {ZSCORE_CUT}
"""


# --------------------------------------------------------------------------
# q104 — rolling cross-series correlation: per-minute mean `value` of
# the click and purchase streams, inner-joined on minute, then Pearson
# correlation over a trailing 60-observation frame computed from the
# five sufficient-statistic window sums (n, Σx, Σy, Σxy, Σx², Σy²) —
# portable across engines where a native corr() window is not. The
# joint minute series is grid-sized (bounded like q76's day table), so
# the single-partition window is deliberate; the per-minute aggregate
# upstream is the real data-sized stage and partial-aggregates before
# its one shuffle. Guards: frames with < 10 joint minutes or zero
# variance yield NULL.
# --------------------------------------------------------------------------
def q104_rolling_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    per_min = ev.groupBy(
        F.expr("unix_millis(ts) div 60000").alias("minute"), "event_type"
    ).agg(F.avg("value").alias("v"))
    x = per_min.filter(F.col("event_type") == "click").select(
        "minute", F.col("v").alias("x")
    )
    y = per_min.filter(F.col("event_type") == "purchase").select(
        "minute", F.col("v").alias("y")
    )
    j = x.join(y, "minute")
    w = W.orderBy("minute").rowsBetween(-59, 0)
    s = j.select(
        "minute",
        F.count("*").over(w).alias("n"),
        F.sum("x").over(w).alias("sx"),
        F.sum("y").over(w).alias("sy"),
        F.sum(F.col("x") * F.col("y")).over(w).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).over(w).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).over(w).alias("syy"),
    )
    varx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vary = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    cov = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    return s.select(
        "minute",
        "n",
        F.round(
            F.when(
                (F.col("n") >= 10) & (varx > 0) & (vary > 0),
                cov / (F.sqrt(varx) * F.sqrt(vary)),
            ),
            6,
        ).alias("corr_r"),
    )


Q104_SQL = """
WITH pm AS (
  SELECT epoch_ms(ts) // 60000 AS minute, event_type, avg(value) AS v
  FROM events WHERE event_type IN ('click', 'purchase')
  GROUP BY 1, 2
),
j AS (
  SELECT x.minute, x.v AS x, y.v AS y
  FROM (SELECT minute, v FROM pm WHERE event_type = 'click') x
  JOIN (SELECT minute, v FROM pm WHERE event_type = 'purchase') y
    USING (minute)
),
s AS (
  SELECT minute,
         count(*)   OVER w AS n,
         sum(x)     OVER w AS sx,
         sum(y)     OVER w AS sy,
         sum(x * y) OVER w AS sxy,
         sum(x * x) OVER w AS sxx,
         sum(y * y) OVER w AS syy
  FROM j
  WINDOW w AS (ORDER BY minute ROWS BETWEEN 59 PRECEDING AND CURRENT ROW)
)
SELECT minute, n,
       round(CASE WHEN n >= 10 AND n * sxx - sx * sx > 0
                       AND n * syy - sy * sy > 0
                  THEN (n * sxy - sx * sy)
                       / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy))
             END, 6) AS corr_r
FROM s
"""


QUERIES = {
    "q82_gapfill_locf": q82_gapfill_locf,
    "q83_rolling_zscore": q83_rolling_zscore,
    "q104_rolling_corr": q104_rolling_corr,
}

ORACLES = {
    "q82_gapfill_locf": Q82_SQL,
    "q83_rolling_zscore": Q83_SQL,
    "q104_rolling_corr": Q104_SQL,
}
