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
# Scale shape: event_type alone is 4 values, so a plain window would
# serialize into 4 tasks. A TIME-chunked re-key (q22/q37 style) can't
# carry a 100-row frame across thin chunks, so the re-key here is
# ROW-COUNT-aware: with_global_rank assigns a distributed global
# per-type rank (bucket-offset two-pass — no serialized window), rows
# chunk by rank div 1000, and with_row_context replicates each chunk's
# last 100 rows into the next one. Interior chunks hold exactly 1000
# rows ≥ the frame depth BY CONSTRUCTION, at any scale factor — the
# occupancy precondition is guaranteed, not assumed.
# --------------------------------------------------------------------------
ZSCORE_FRAME = 100
ZSCORE_MIN_N = 20
ZSCORE_CUT = 2.5
ZSCORE_CHUNK_ROWS = 1000


def q83_rolling_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.partitioning import with_global_rank, with_row_context

    ev = load(spark, sf_dir, "events").select("event_id", "event_type", "ts", "value")
    ranked = with_global_rank(
        ev,
        ["event_type"],
        ["ts", "event_id"],
        bucket=F.expr("unix_seconds(ts) div 86400"),
    )
    chunked = with_row_context(
        ranked,
        ["event_type"],
        ["rank"],
        chunk=F.expr(f"(rank - 1) div {ZSCORE_CHUNK_ROWS}"),
        rows_before=ZSCORE_FRAME,
        # donor depth is guaranteed BY CONSTRUCTION (interior chunks
        # are exactly ZSCORE_CHUNK_ROWS = 10× the frame, see header);
        # the runtime tripwire would only re-run the rank lineage.
        check=False,
    )
    w = (
        W.partitionBy("event_type", "chunk")
        .orderBy("rank")
        .rowsBetween(-ZSCORE_FRAME, -1)
    )
    scored = chunked.select(
        "event_id",
        "event_type",
        "value",
        "is_ctx",
        F.count("value").over(w).alias("n_prev"),
        F.avg("value").over(w).alias("mu"),
        F.stddev_samp("value").over(w).alias("sd"),
    ).filter(F.col("is_ctx") == 0)
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
    # bounded window: the joint minute grid is calendar-bounded
    # (≤ span minutes at any SF — see docstring)
    from ..operators.partitioning import bounded_ordered_window

    w = bounded_ordered_window("minute", "minute").rowsBetween(-59, 0)
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


# --------------------------------------------------------------------------
# q111 — truncated-window EWMA smoothing of the daily mean value per
# event_type: weights a·(1-a)^i over the trailing 10 OBSERVATIONS
# (row-based lag taps over the daily series — on a sparse series with
# calendar gaps this is 10 rows, NOT 10 calendar days; a range-based
# day window would be the calendar variant), normalized by the weight
# mass actually present (series edges use the partial mass, the
# standard `adjust=True` convention). A 10-term trailing EWMA is
# exactly window-expressible as 10 lag() taps sharing ONE
# Window sort — no recursion, no state, no applyInPandas; the exact
# infinite-memory recurrence is deliberately avoided because its
# (1-a)^(-t) rescaling trick overflows on long series and a recursive
# form would serialize per key. Weighted taps are summed in a fixed
# left-to-right chain so both engines evaluate bit-identically.
# --------------------------------------------------------------------------
_EWMA_ALPHA = 0.3
_EWMA_TAPS = 10


def q111_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        load(spark, sf_dir, "events")
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.avg("value").alias("v"))
    )
    w = W.partitionBy("event_type").orderBy("day")
    num = F.lit(0.0)
    den = F.lit(0.0)
    for i in range(_EWMA_TAPS):
        wt = _EWMA_ALPHA * (1.0 - _EWMA_ALPHA) ** i
        tap = F.lag("v", i).over(w)
        num = num + F.when(tap.isNotNull(), F.lit(wt) * tap).otherwise(F.lit(0.0))
        den = den + F.when(tap.isNotNull(), F.lit(wt)).otherwise(F.lit(0.0))
    return daily.select(
        "event_type",
        "day",
        F.round("v", 6).alias("daily_mean_r"),
        F.round(num / den, 6).alias("ewma_r"),
    )


def _ewma_terms() -> tuple[str, str]:
    lagv = "lag(v, {i}) OVER (PARTITION BY event_type ORDER BY day)"
    num, den = "0.0", "0.0"
    for i in range(_EWMA_TAPS):
        wt = repr(_EWMA_ALPHA * (1.0 - _EWMA_ALPHA) ** i)
        tap = lagv.format(i=i)
        num += f" + (CASE WHEN {tap} IS NOT NULL THEN {wt} * {tap} ELSE 0.0 END)"
        den += f" + (CASE WHEN {tap} IS NOT NULL THEN {wt} ELSE 0.0 END)"
    return num, den


_N, _D = _ewma_terms()

Q111_SQL = f"""
WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
                      avg(value) AS v
               FROM events GROUP BY 1, 2)
SELECT event_type, day, round(v, 6) AS daily_mean_r,
       round(({_N}) / ({_D}), 6) AS ewma_r
FROM daily
"""


# --------------------------------------------------------------------------
# q112 — maximum drawdown per event_type over the cumulative daily
# value curve: running-max minus current, argmax with earliest-day
# tie-break. Two stacked windows on the same (event_type, day) sort —
# cumulative sum and running max collapse into one Window node — then
# a row_number pick. Drawdowns are rounded BEFORE the argmax so float
# ties resolve identically on both engines.
# --------------------------------------------------------------------------
def q112_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        load(spark, sf_dir, "events")
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.sum("value").alias("v"))
    )
    w = W.partitionBy("event_type").orderBy("day").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    curve = daily.select(
        "event_type", "day", F.sum("v").over(w).alias("equity")
    )
    dd = curve.select(
        "event_type",
        "day",
        F.round(
            F.max("equity").over(w) - F.col("equity"), 6
        ).alias("dd_r"),
    )
    pick = W.partitionBy("event_type").orderBy(F.desc("dd_r"), F.asc("day"))
    return (
        dd.withColumn("rk", F.row_number().over(pick))
        .filter(F.col("rk") == 1)
        .select(
            "event_type",
            F.col("day").alias("trough_day"),
            F.col("dd_r").alias("max_drawdown_r"),
        )
    )


Q112_SQL = """
WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
                      sum(value) AS v
               FROM events GROUP BY 1, 2),
curve AS (SELECT event_type, day,
                 sum(v) OVER (PARTITION BY event_type ORDER BY day
                              ROWS UNBOUNDED PRECEDING) AS equity
          FROM daily),
dd AS (SELECT event_type, day,
              round(max(equity) OVER (PARTITION BY event_type ORDER BY day
                                      ROWS UNBOUNDED PRECEDING)
                    - equity, 6) AS dd_r
       FROM curve),
pick AS (SELECT *, row_number() OVER (PARTITION BY event_type
                                      ORDER BY dd_r DESC, day ASC) AS rk
         FROM dd)
SELECT event_type, day AS trough_day, dd_r AS max_drawdown_r
FROM pick WHERE rk = 1
"""


# --------------------------------------------------------------------------
# q113 — seasonal-naive forecast backtest: predict each day's total
# value per event_type with the value 7 days (one season) earlier,
# then score MAE and sMAPE over the days where the lag exists. One
# shuffle for the daily aggregate, one keyed window for the lag, a
# groups-sized final aggregate — the canonical shape of a forecasting
# backtest as a query instead of a driver loop.
# --------------------------------------------------------------------------
_SEASON_DAYS = 7


def q113_seasonal_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        load(spark, sf_dir, "events")
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.sum("value").alias("v"))
    )
    w = W.partitionBy("event_type").orderBy("day")
    scored = daily.select(
        "event_type",
        "v",
        F.lag("v", _SEASON_DAYS).over(w).alias("f"),
    ).filter(F.col("f").isNotNull())
    err = F.abs(F.col("f") - F.col("v"))
    smape = F.lit(2.0) * err / (F.abs("f") + F.abs("v"))
    return scored.groupBy("event_type").agg(
        F.count("*").alias("n_days"),
        F.round(F.avg(err), 6).alias("mae_r"),
        F.round(F.avg(smape), 6).alias("smape_r"),
    )


Q113_SQL = f"""
WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
                      sum(value) AS v
               FROM events GROUP BY 1, 2),
scored AS (SELECT event_type, v,
                  lag(v, {_SEASON_DAYS}) OVER (PARTITION BY event_type
                                               ORDER BY day) AS f
           FROM daily)
SELECT event_type, count(*) AS n_days,
       round(avg(abs(f - v)), 6) AS mae_r,
       round(avg(2.0 * abs(f - v) / (abs(f) + abs(v))), 6) AS smape_r
FROM scored WHERE f IS NOT NULL
GROUP BY event_type
"""


# --------------------------------------------------------------------------
# q136 — full pairwise correlation matrix across the five event-type
# daily series (q104's rolling pair generalized to the static
# all-pairs matrix). The daily aggregate is one shuffle; the pair
# expansion is a self-join on the day key (5× fan-out per row, 10
# unordered pairs) and corr() reduces each pair to sufficient
# statistics map-side. At thousands of series the same query becomes
# the block-GEMM path (operators/similarity) — the SQL shape here is
# the exact-sufficient-statistics reference.
# --------------------------------------------------------------------------
def q136_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        load(spark, sf_dir, "events")
        .groupBy(F.to_date("ts").alias("day"), "event_type")
        .agg(F.sum("value").alias("v"))
    )
    a = daily.select("day", F.col("event_type").alias("ta"), F.col("v").alias("va"))
    b = daily.select("day", F.col("event_type").alias("tb"), F.col("v").alias("vb"))
    return (
        a.join(b, "day")
        .filter(F.col("ta") < F.col("tb"))
        .groupBy("ta", "tb")
        .agg(
            F.count("*").alias("n_days"),
            F.round(F.corr("va", "vb"), 6).alias("corr_r"),
        )
    )


Q136_SQL = """
WITH daily AS (SELECT CAST(ts AS DATE) AS day, event_type, sum(value) AS v
               FROM events GROUP BY 1, 2)
SELECT a.event_type AS ta, b.event_type AS tb,
       count(*) AS n_days, round(corr(a.v, b.v), 6) AS corr_r
FROM daily a JOIN daily b ON a.day = b.day AND a.event_type < b.event_type
GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# q160 — rolling median / MAD robust baseline per user: the
# outlier-resistant twin of q83's mean/stddev z-score. Spark has no
# percentile WINDOW function; for a bounded 15-row frame the exact
# order statistic is expression-level — collect_list over the frame,
# array_sort, take the middle element (and a second row-local pass for
# the median absolute deviation). Every output is an ELEMENT of the
# input (no accumulation), so cross-engine parity needs no rounding at
# all. Partition key is user_id — cardinality grows with the data, so
# no chunk re-key is needed (unlike q83's 4-value event_type).
# Robust z uses 1.4826·MAD (the normal-consistency constant).
# --------------------------------------------------------------------------
MED_FRAME = 15  # odd ⇒ the median is a single element, no interpolation


def q160_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select("event_id", "user_id", "ts", "value")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-(MED_FRAME - 1), 0)
    )
    mid = MED_FRAME // 2 + 1
    vals = F.array_sort(F.collect_list("value").over(w))
    scored = ev.select(
        "event_id",
        "user_id",
        "value",
        F.when(F.size(vals) == MED_FRAME, F.element_at(vals, mid)).alias("med"),
        F.when(F.size(vals) == MED_FRAME, vals).alias("__vals"),
    ).filter(F.col("med").isNotNull())
    dev = F.array_sort(
        F.transform("__vals", lambda x: F.abs(x - F.col("med")))
    )
    mad = F.element_at(dev, mid)
    return scored.select(
        "event_id",
        "user_id",
        "value",
        "med",
        mad.alias("mad"),
        F.when(
            mad > 0, (F.col("value") - F.col("med")) / (F.lit(1.4826) * mad)
        ).alias("robust_z"),
    )


Q160_SQL = f"""
WITH framed AS (
  SELECT event_id, user_id, value,
         list(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN {MED_FRAME - 1} PRECEDING AND CURRENT ROW)
           AS vals
  FROM events),
full_frames AS (
  SELECT event_id, user_id, value, list_sort(vals) AS svals
  FROM framed WHERE len(vals) = {MED_FRAME}),
med AS (
  SELECT *, svals[{MED_FRAME // 2 + 1}] AS med FROM full_frames),
mads AS (
  SELECT event_id, user_id, value, med,
         list_sort(list_transform(svals, x -> abs(x - med)))[{MED_FRAME // 2 + 1}]
           AS mad
  FROM med)
SELECT event_id, user_id, value, med, mad,
       CASE WHEN mad > 0 THEN (value - med) / (1.4826 * mad) END AS robust_z
FROM mads
"""


# --------------------------------------------------------------------------
# q177 — CUSUM control chart (change-point detection) on daily purchase
# revenue. The textbook form is the sequential Lindley recursion
# C⁺_t = max(0, C⁺_{t-1} + x_t − μ), but its closed-form solution is
# the REFLECTED WALK: with S_t = Σ_{j≤t}(x_j − μ) and S_0 = 0,
#   C⁺_t = S_t − min_{0≤j≤t} S_j,   C⁻_t = S_t − max_{0≤j≤t} S_j —
# two running aggregates over one sort instead of a per-step recursion
# (a recursive-CTE draft measured 6.9 s at sf0.1 purely in per-step
# scheduling; this form is ~0.5 s and scale-free). Everything is
# scaled by n (days) so the mean never materializes as a float: the
# walk runs on EXACT int64 (n·x_t − total) and alarms fire on an
# integer threshold (total div 5) — bit-deterministic on both engines.
# The windows run over the DAYS summary (calendar-bounded), so the
# single-partition sort is summary-sized by construction; the only
# data-sized work is the daily aggregate.
# --------------------------------------------------------------------------
def _q177_sql(div: str, view: str, part: str = "") -> str:
    # `part` lets the Spark variant partition the daily-summary windows
    # by pmod(hash(day), 1) — identically 0 but non-foldable, the
    # bounded_ordered_window trick (a bare literal partition is
    # stripped by Catalyst's foldable-partition elimination): the frame
    # is the calendar-bounded daily summary (≤ span days at any SF),
    # and the explicit bounded partition keeps the spurious WindowExec
    # degradation warning out of sweep logs (round-9 structural-bound
    # item). The DuckDB oracle keeps the plain spec.
    return f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM {view} WHERE event_type = 'purchase' GROUP BY 1),
tot AS (
  SELECT CAST(sum(cents) AS BIGINT) AS total,
         count(*) AS n,
         CAST(sum(cents) {div} 5 AS BIGINT) AS thr
  FROM daily),
walk AS (
  SELECT day, cents,
         CAST(sum(n * cents - total) OVER
              ({part}ORDER BY day ROWS UNBOUNDED PRECEDING) AS BIGINT) AS s,
         thr
  FROM daily CROSS JOIN tot),
refl AS (
  SELECT day, cents, thr,
         s - least(CAST(0 AS BIGINT),
                   min(s) OVER ({part}ORDER BY day ROWS UNBOUNDED PRECEDING))
           AS cp,
         s - greatest(CAST(0 AS BIGINT),
                      max(s) OVER ({part}ORDER BY day ROWS UNBOUNDED PRECEDING))
           AS cn
  FROM walk)
SELECT day, cents,
       cp AS cusum_pos_scaled,
       cn AS cusum_neg_scaled,
       CAST(CASE WHEN cp > thr THEN 1 ELSE 0 END AS BIGINT) AS alarm_up,
       CAST(CASE WHEN -cn > thr THEN 1 ELSE 0 END AS BIGINT) AS alarm_down
FROM refl
"""


def q177_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    # DataFrame substitution ({ev} placeholder) instead of a named temp
    # view: no shared-catalog mutation, nothing to race on or leak when
    # query builders run concurrently in one session
    return spark.sql(
        _q177_sql("DIV", "{ev}", part="PARTITION BY pmod(hash(day), 1) "),
        ev=load(spark, sf_dir, "events"),
    )


Q177_SQL = _q177_sql("//", "events")


# --------------------------------------------------------------------------
# q203 — SAX symbolization + motif census (Lin/Keogh symbolic aggregate
# approXimation — the standard way to mine motifs/anomalies over
# massive time series by compressing them into short strings first).
# Per event_type: values z-normalize against the key's own mean/std,
# PAA-compress 16 consecutive events into their mean, map each PAA
# mean onto a 4-symbol alphabet at the N(0,1) quartile breakpoints
# (±0.6745, 0), and census the 3-symbol motifs. Scale shape: the only
# per-event steps are a parallel (key,bucket) rank (with_global_rank —
# no single-partition window) and a partially-aggregable PAA groupBy;
# the per-key ORDER-dependent window (motif trigrams) runs on the
# 16×-compressed PAA series, and key count is the parallelism unit
# (symbols/series ids at production scale). Float determinism: values
# sum in exact integer cents; mean/std/PAA are fixed-shape IEEE
# expressions over those exact sums, identical in both engines.
# --------------------------------------------------------------------------
_PAA_W = 16
_SAX_BP = 0.6745


def q203_sax_motifs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.partitioning import with_global_rank

    ev = load(spark, sf_dir, "events").select(
        "event_type",
        "ts",
        "event_id",
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    )
    ranked = with_global_rank(
        ev,
        ["event_type"],
        [F.asc("ts"), F.asc("event_id")],
        bucket=F.to_date("ts"),
        rank_col="rnk",
    )
    seg = ranked.groupBy(
        "event_type",
        F.expr(f"CAST((rnk - 1) DIV {_PAA_W} AS BIGINT)").alias("seg"),
    ).agg((F.sum("cents") * F.lit(1.0) / F.count("*")).alias("paa"))
    # greatest(0, var): the E[x²]−µ² form can round a hair NEGATIVE for
    # near-constant series (catastrophic cancellation) — DuckDB's
    # sqrt(negative) RAISES while Spark returns NaN; clamping in BOTH
    # engines keeps them on the same double. nullif(sd, 0): a constant
    # series has sd = 0 exactly — Spark ANSI raises on the double
    # division while DuckDB yields NULL; with the guard both give
    # z = NULL → every CASE arm is non-true → symbol 'd' on both sides
    # (round-7 ln/sqrt domain audit).
    stats = ev.groupBy("event_type").agg(
        (F.sum("cents") * F.lit(1.0) / F.count("*")).alias("mu"),
        F.sqrt(
            F.greatest(
                F.lit(0.0),
                F.sum(F.col("cents") * F.col("cents"))
                * F.lit(1.0)
                / F.count("*")
                - (F.sum("cents") * F.lit(1.0) / F.count("*"))
                * (F.sum("cents") * F.lit(1.0) / F.count("*")),
            )
        ).alias("sd"),
    )
    z = (F.col("paa") - F.col("mu")) / F.nullif(F.col("sd"), F.lit(0.0))
    sym = (
        seg.join(F.broadcast(stats), "event_type")
        .select(
            "event_type",
            "seg",
            F.when(z < -_SAX_BP, "a")
            .when(z < 0, "b")
            .when(z < _SAX_BP, "c")
            .otherwise("d")
            .alias("sym"),
        )
    )
    w = W.partitionBy("event_type").orderBy("seg")
    tri = sym.select(
        "event_type",
        F.concat("sym", F.lead("sym", 1).over(w), F.lead("sym", 2).over(w)).alias(
            "motif"
        ),
    ).filter(F.col("motif").isNotNull())
    return tri.groupBy("event_type", "motif").agg(
        F.count("*").alias("n")
    )


Q203_SQL = f"""
WITH e AS (SELECT event_type, ts, event_id,
                  CAST(round(value * 100, 0) AS BIGINT) AS cents
           FROM events),
r AS (SELECT event_type, cents,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY ts, event_id) AS rnk
      FROM e),
seg AS (SELECT event_type, (rnk - 1) // {_PAA_W} AS seg,
               CAST(sum(cents) AS BIGINT) * 1.0 / count(*) AS paa
        FROM r GROUP BY 1, 2),
st AS (SELECT event_type,
              CAST(sum(cents) AS BIGINT) * 1.0 / count(*) AS mu,
              sqrt(greatest(0.0,
                   CAST(sum(cents * cents) AS BIGINT) * 1.0 / count(*)
                   - (CAST(sum(cents) AS BIGINT) * 1.0 / count(*))
                   * (CAST(sum(cents) AS BIGINT) * 1.0 / count(*)))) AS sd
       FROM e GROUP BY 1),
sym AS (SELECT s.event_type, s.seg,
               CASE WHEN (paa - mu) / nullif(sd, 0.0) < -{_SAX_BP} THEN 'a'
                    WHEN (paa - mu) / nullif(sd, 0.0) < 0 THEN 'b'
                    WHEN (paa - mu) / nullif(sd, 0.0) < {_SAX_BP} THEN 'c'
                    ELSE 'd' END AS sym
        FROM seg s JOIN st USING (event_type)),
tri AS (SELECT event_type,
               sym || lead(sym, 1) OVER w || lead(sym, 2) OVER w AS motif
        FROM sym WINDOW w AS (PARTITION BY event_type ORDER BY seg))
SELECT event_type, motif, CAST(count(*) AS BIGINT) AS n
FROM tri WHERE motif IS NOT NULL GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# q212 — seasonal robust anomaly detection: per (event_type,
# UTC-hour-of-day) season, the EXACT median and MAD (median absolute
# deviation) of the value column, and the count of events outside the
# Hampel gate |x − med| > 3·MAD — the outlier rule that, unlike
# z-scores, is not itself corrupted by the outliers it hunts. Exactness
# trick: values are integer cents, deviations are kept as the integers
# dev2 = |2x − median_x2| (median_x2 = lower+upper middle, exact for
# both parities), and the gate 2·dev2 > 3·mad4 is pure integer
# arithmetic — the only floats are two final IEEE divisions for the
# report columns. Scale shape: two exact_grouped_median passes (each a
# (key,bucket) histogram + straddling-bucket probe — never a full
# per-key sort), one broadcast join back per pass; the hour bucket is
# floor(unix_micros/3.6e9)%24, timezone/DST-fixed in both engines
# (the q110 lesson).
# --------------------------------------------------------------------------
def q212_seasonal_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.quantiles import exact_grouped_median

    e = (
        load(spark, sf_dir, "events")
        .select(
            "event_type",
            F.expr("CAST((unix_micros(ts) DIV 3600000000) % 24 AS INT)").alias(
                "hr"
            ),
            F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
        )
        .withColumn(
            "g", F.concat_ws("|", "event_type", F.col("hr").cast("string"))
        )
        .localCheckpoint(eager=True)  # feeds both median passes + the gate
    )
    med = exact_grouped_median(e, "g", "cents").select(
        "g", "n_rows", F.col("median_x2_cents").alias("m2")
    )
    d = e.join(F.broadcast(med), "g").withColumn(
        "dev2", F.abs(2 * F.col("cents") - F.col("m2"))
    ).localCheckpoint(eager=True)  # feeds the MAD pass + the gate count
    mad = exact_grouped_median(d, "g", "dev2").select(
        "g", F.col("median_x2_cents").alias("mad4")
    )
    return (
        d.join(F.broadcast(mad), "g")
        .groupBy("event_type", "hr")
        .agg(
            F.count("*").alias("n"),
            (F.max("m2") / F.lit(200.0)).alias("median_r"),
            (F.max("mad4") / F.lit(400.0)).alias("mad_r"),
            F.sum(
                (2 * F.col("dev2") > 3 * F.col("mad4")).cast("long")
            ).alias("n_outliers"),
        )
    )


Q212_SQL = """
WITH e AS (SELECT event_type,
                  CAST((epoch_us(ts) // 3600000000) % 24 AS INT) AS hr,
                  CAST(round(value * 100, 0) AS BIGINT) AS cents
           FROM events),
r1 AS (SELECT *, row_number() OVER (PARTITION BY event_type, hr
                                    ORDER BY cents) AS rn,
              count(*) OVER (PARTITION BY event_type, hr) AS n
       FROM e),
med AS (SELECT event_type, hr, CAST(max(n) AS BIGINT) AS n,
               CAST(sum(CASE WHEN rn = (n + 1) // 2 THEN cents ELSE 0 END)
                    + sum(CASE WHEN rn = (n + 2) // 2 THEN cents ELSE 0 END)
                    AS BIGINT) AS m2
        FROM r1 GROUP BY 1, 2),
d AS (SELECT e.event_type, e.hr, m.n, m.m2,
             abs(2 * e.cents - m.m2) AS dev2
      FROM e JOIN med m USING (event_type, hr)),
r2 AS (SELECT *, row_number() OVER (PARTITION BY event_type, hr
                                    ORDER BY dev2) AS rn,
              count(*) OVER (PARTITION BY event_type, hr) AS nn
       FROM d),
mad AS (SELECT event_type, hr,
               CAST(sum(CASE WHEN rn = (nn + 1) // 2 THEN dev2 ELSE 0 END)
                    + sum(CASE WHEN rn = (nn + 2) // 2 THEN dev2 ELSE 0 END)
                    AS BIGINT) AS mad4
        FROM r2 GROUP BY 1, 2)
SELECT d.event_type, d.hr,
       CAST(count(*) AS BIGINT) AS n,
       max(d.m2) / 200.0 AS median_r,
       max(mad4) / 400.0 AS mad_r,
       CAST(sum(CASE WHEN 2 * d.dev2 > 3 * mad4 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_outliers
FROM d JOIN mad USING (event_type, hr)
GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# q222 — inter-arrival burstiness (Fano factor) per event_type: the
# dispersion of gaps between consecutive events — Fano = var/mean of
# the inter-arrival time. ≈1 means Poisson arrivals; >>1 means bursts
# (bot traffic, batch replays, thundering herds); <1 means pacing. The
# readout an ingestion team uses to size buffers and spot replayed
# traffic. Exactness: gaps are INTEGER seconds (µs epoch DIV 1e6 —
# NOTE the domain assumption: Spark's DIV truncates toward zero while
# DuckDB's // floors, so the two agree only for NON-NEGATIVE epochs;
# event timestamps are post-1970 by the data contract, where both
# yield the same quotient), so n/Σd/Σd² are exact int64 sums and the
# final mean/Fano are deterministic IEEE expressions over identical
# doubles — no rounding needed anywhere. (Fano from sums:
# var_samp/mean = (n·S2 − S1²)/((n−1)·S1), computed in DOUBLE so the
# int64 products can't overflow.) Scale shape: the lag window runs per
# (event_type, day-chunk) with 1-row boundary context — event_type is
# a handful of values, and without the chunk the sort would serialize
# into |event_types| tasks (the q37/q38 convention); the final
# aggregate is map-side combinable.
# --------------------------------------------------------------------------
def q222_interarrival_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.partitioning import with_row_context

    ev = load(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        F.expr("unix_micros(ts) DIV 1000000").alias("su"),
    )
    tc = with_row_context(
        ev,
        ["event_type"],
        ["su", "event_id"],
        chunk=F.expr("su DIV 86400"),
        rows_before=1,
    )
    w = W.partitionBy("event_type", "chunk").orderBy("su", "event_id")
    gaps = (
        tc.select(
            "event_type",
            "is_ctx",
            (F.col("su") - F.lag("su").over(w)).alias("d"),
        )
        .filter((F.col("is_ctx") == 0) & F.col("d").isNotNull())
    )
    agg = gaps.groupBy("event_type").agg(
        F.count("*").alias("n_gaps"),
        F.sum("d").alias("s1"),
        F.sum(F.col("d") * F.col("d")).alias("s2"),
    )
    n = F.col("n_gaps").cast("double")
    s1 = F.col("s1").cast("double")
    s2 = F.col("s2").cast("double")
    # nullif-guard the Fano denominator: a key with exactly ONE gap
    # (n=1) or all-identical arrival seconds (s1=0) zeroes it — DuckDB
    # DOUBLE division by zero yields NULL, but this session runs Spark
    # ANSI mode where it RAISES; the guard makes both engines emit NULL
    return agg.select(
        "event_type",
        "n_gaps",
        "s1",
        (s1 / n).alias("mean_gap_s"),
        (
            (n * s2 - s1 * s1)
            / F.nullif((n - F.lit(1.0)) * s1, F.lit(0.0))
        ).alias("fano"),
    )


Q222_SQL = """
WITH e AS (SELECT event_type, event_id,
                  epoch_us(ts) // 1000000 AS su
           FROM events),
g AS (SELECT event_type,
             su - lag(su) OVER (PARTITION BY event_type
                                ORDER BY su, event_id) AS d
      FROM e),
a AS (SELECT event_type,
             CAST(count(*) AS BIGINT) AS n_gaps,
             CAST(sum(d) AS BIGINT) AS s1,
             CAST(sum(d * d) AS BIGINT) AS s2
      FROM g WHERE d IS NOT NULL GROUP BY event_type)
SELECT event_type, n_gaps, s1,
       CAST(s1 AS DOUBLE) / n_gaps AS mean_gap_s,
       (CAST(n_gaps AS DOUBLE) * s2 - CAST(s1 AS DOUBLE) * s1)
         / nullif((n_gaps - 1.0) * s1, 0.0) AS fano
FROM a
"""



# --------------------------------------------------------------------------
# q241 — unnormalized Haar wavelet energy decomposition of the
# per-minute value series, 3 levels, per event_type: the multi-
# resolution variance split (which timescale carries the signal's
# energy — minute-to-minute chop vs 4-8-minute swings). Everything is
# EXACT integer arithmetic because the unnormalized Haar detail at
# level L is a ±1-signed sum of the minute series: d_L[j] =
# Σ_m s[m]·sign((m DIV 2^(L-1)) mod 2) over m ∈ [j·2^L, (j+1)·2^L) —
# so each level is ONE map-side-combinable aggregate over the (type ×
# minutes) SUMMARY (the data collapses to the minute grid first; gaps
# are zeros by construction of the signed sum). Minute indices are
# rebased per type via an equi-joined 1-row-per-type min — the index
# arithmetic (DIV/mod) is identical on both engines. energy = Σ d² is
# an exact int64; frac_r divides by the per-type total over the
# 3-row-per-type level summary (a window over 9 rows at any SF).
# --------------------------------------------------------------------------
HAAR_LEVELS = 3


def q241_haar_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    mins = (
        load(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            (F.unix_millis("ts") / F.lit(60000)).cast("long").alias("m"),
        )
        .agg(F.sum(F.round(F.col("value") * 100).cast("long")).alias("sv"))
        .localCheckpoint(eager=False)  # feeds m0 + one agg per level
    )
    m0 = mins.groupBy("event_type").agg(F.min("m").alias("m0"))
    idx = mins.join(m0, "event_type").select(
        "event_type", (F.col("m") - F.col("m0")).alias("idx"), "sv"
    )
    pieces = []
    for lvl in range(1, HAAR_LEVELS + 1):
        half, full = 1 << (lvl - 1), 1 << lvl
        d = idx.groupBy(
            "event_type", F.expr(f"idx div {full}").alias("j")
        ).agg(
            F.sum(
                F.when(F.expr(f"(idx div {half}) % 2 = 0"), F.col("sv"))
                .otherwise(-F.col("sv"))
            ).alias("d")
        )
        pieces.append(
            d.groupBy("event_type").agg(
                F.lit(lvl).cast("long").alias("level"),
                F.count("*").alias("n_coefs"),
                F.sum(F.col("d") * F.col("d")).alias("energy"),
            )
        )
    out = pieces[0]
    for x in pieces[1:]:
        out = out.unionByName(x)
    wt = W.partitionBy("event_type")  # 3 rows per type: summary-sized
    return out.select(
        "event_type",
        "level",
        "n_coefs",
        "energy",
        (
            F.col("energy").cast("double")
            / F.nullif(F.sum("energy").over(wt).cast("double"), F.lit(0.0))
        ).alias("frac_r"),
    )


def _q241_lvl_sql(lvl: int) -> str:
    half, full = 1 << (lvl - 1), 1 << lvl
    return f"""
  SELECT event_type, {lvl} AS level, idx // {full} AS j,
         sum(CASE WHEN (idx // {half}) % 2 = 0 THEN sv ELSE -sv END) AS d
  FROM i GROUP BY 1, 3"""


Q241_SQL = f"""
WITH s AS (SELECT event_type, epoch_ms(ts) // 60000 AS m,
                  sum(CAST(round(value * 100) AS BIGINT)) AS sv
           FROM events GROUP BY 1, 2),
m0 AS (SELECT event_type, min(m) AS m0 FROM s GROUP BY 1),
i AS (SELECT s.event_type, m - m0 AS idx, sv
      FROM s JOIN m0 USING (event_type)),
lvl AS ({" UNION ALL ".join(_q241_lvl_sql(k) for k in range(1, HAAR_LEVELS + 1))}),
e AS (SELECT event_type, level, count(*) AS n_coefs, sum(d * d) AS energy
      FROM lvl GROUP BY 1, 2)
SELECT event_type, CAST(level AS BIGINT) AS level,
       CAST(n_coefs AS BIGINT) AS n_coefs,
       CAST(energy AS BIGINT) AS energy,
       CAST(energy AS DOUBLE)
         / nullif(CAST(sum(energy) OVER (PARTITION BY event_type) AS DOUBLE),
                  0.0) AS frac_r
FROM e
"""


# --------------------------------------------------------------------------
# q260/q261 share one shape: the events stream collapses to the
# per-(event_type, day) value-total DAILY SUMMARY — calendar-bounded
# (≤ span days per type, ~30 here, never data-sized) — and the robust
# trend statistics run over that summary. The summary totals are exact
# integer micro-units (round(value·1e6), the q255 grid), so every
# pairwise comparison below is exact.
#
# q260 — Theil–Sen robust trend: the median of all pairwise daily
# slopes (y_j−y_i)/(d_j−d_i), i<j. The pair set is summary² (≤ ~450
# pairs per type — scale-FREE: more events deepen the totals, they
# don't add days), each slope is ONE IEEE division of exact integers
# (identical on both engines), and the median is the lower-middle
# order statistic under a fully deterministic (slope, d_i, d_j) sort —
# no averaging of the two middles, so no second FP op.
#
# q261 — Mann–Kendall trend test on the same summary: S = Σ_{i<j}
# sign(y_j − y_i) (exact int), tie-corrected variance
# Var = [n(n−1)(2n+5) − Σ_t t(t−1)(2t+5)]/18 over the tied-value
# groups, and the normal z = (S ∓ 1)/√Var as one IEEE chain. The
# classic nonparametric "is there a monotone trend" gate a pipeline
# runs before fitting anything parametric; Theil–Sen is its slope
# estimate.
# --------------------------------------------------------------------------
def _daily_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select(
        "event_type",
        F.datediff(F.to_date("ts"), F.lit("2024-01-01")).alias("d"),
        F.round(F.col("value") * 1e6).cast("long").alias("vu"),
    )
    return ev.groupBy("event_type", "d").agg(F.sum("vu").alias("y"))


_DAILY_SQL = """
SELECT event_type, datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS d,
       sum(CAST(round(value * 1e6) AS BIGINT)) AS y
FROM events GROUP BY 1, 2
"""


def q260_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = _daily_totals(spark, sf_dir).localCheckpoint(eager=False)
    a = daily.select("event_type", F.col("d").alias("d1"), F.col("y").alias("y1"))
    b = daily.select("event_type", F.col("d").alias("d2"), F.col("y").alias("y2"))
    slopes = (
        a.join(b, "event_type")
        .filter(F.col("d1") < F.col("d2"))
        .select(
            "event_type",
            "d1",
            "d2",
            (
                (F.col("y2") - F.col("y1")).cast("double")
                / (F.col("d2") - F.col("d1")).cast("double")
            ).alias("slope"),
        )
    )
    w = W.partitionBy("event_type").orderBy("slope", "d1", "d2")
    ranked = slopes.select(
        "event_type",
        "slope",
        F.row_number().over(w).alias("rk"),
        F.count("*").over(W.partitionBy("event_type")).alias("m"),
    )
    n_days = daily.groupBy("event_type").agg(F.count("*").alias("n_days"))
    return (
        ranked.filter(F.col("rk") == F.expr("(m + 1) DIV 2"))
        .join(n_days, "event_type")
        .select(
            "event_type",
            "n_days",
            F.col("m").alias("n_pairs"),
            (F.col("slope") / F.lit(1e6)).alias("sen_slope"),
        )
    )


Q260_SQL = f"""
WITH daily AS ({_DAILY_SQL}),
slopes AS (SELECT a.event_type, a.d AS d1, b.d AS d2,
                  CAST(b.y - a.y AS DOUBLE) / CAST(b.d - a.d AS DOUBLE) AS slope
           FROM daily a JOIN daily b
             ON a.event_type = b.event_type AND a.d < b.d),
ranked AS (SELECT event_type, slope,
                  row_number() OVER (PARTITION BY event_type
                                     ORDER BY slope, d1, d2) AS rk,
                  count(*) OVER (PARTITION BY event_type) AS m
           FROM slopes),
nd AS (SELECT event_type, count(*) AS n_days FROM daily GROUP BY 1)
SELECT event_type, CAST(n_days AS BIGINT) AS n_days,
       CAST(m AS BIGINT) AS n_pairs, slope / 1e6 AS sen_slope
FROM ranked JOIN nd USING (event_type)
WHERE rk = (m + 1) // 2
"""


def q261_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = _daily_totals(spark, sf_dir).localCheckpoint(eager=False)
    a = daily.select("event_type", F.col("d").alias("d1"), F.col("y").alias("y1"))
    b = daily.select("event_type", F.col("d").alias("d2"), F.col("y").alias("y2"))
    s = (
        a.join(b, "event_type")
        .filter(F.col("d1") < F.col("d2"))
        .groupBy("event_type")
        .agg(F.sum(F.signum((F.col("y2") - F.col("y1")).cast("double")).cast("long")).alias("s"))
    )
    nd = daily.groupBy("event_type").agg(F.count("*").alias("n"))
    ties = (
        daily.groupBy("event_type", "y")
        .agg(F.count("*").alias("t"))
        .groupBy("event_type")
        .agg(F.sum(F.expr("t * (t - 1) * (2 * t + 5)")).alias("tie_term"))
    )
    j = s.join(nd, "event_type").join(ties, "event_type")
    var18 = (
        F.expr("n * (n - 1) * (2 * n + 5)") - F.col("tie_term")
    ).alias("var18")
    out = j.select("event_type", "n", "s", var18)
    sd = F.sqrt(F.col("var18").cast("double") / F.lit(18.0))
    z = (
        F.when(F.col("s") > 0, (F.col("s") - 1).cast("double"))
        .when(F.col("s") < 0, (F.col("s") + 1).cast("double"))
        .otherwise(F.lit(0.0))
        / F.nullif(sd, F.lit(0.0))
    )
    return out.select("event_type", "n", "s", "var18", z.alias("mk_z"))


Q261_SQL = f"""
WITH daily AS ({_DAILY_SQL}),
s AS (SELECT a.event_type,
             CAST(sum(CASE WHEN b.y > a.y THEN 1
                           WHEN b.y < a.y THEN -1 ELSE 0 END) AS BIGINT) AS s
      FROM daily a JOIN daily b
        ON a.event_type = b.event_type AND a.d < b.d
      GROUP BY 1),
nd AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM daily GROUP BY 1),
ties AS (SELECT event_type,
                CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie_term
         FROM (SELECT event_type, y, count(*) AS t FROM daily GROUP BY 1, 2)
         GROUP BY 1)
SELECT event_type, n, s,
       n * (n - 1) * (2 * n + 5) - tie_term AS var18,
       CASE WHEN s > 0 THEN CAST(s - 1 AS DOUBLE)
            WHEN s < 0 THEN CAST(s + 1 AS DOUBLE)
            ELSE 0.0 END
         / nullif(sqrt(CAST(n * (n - 1) * (2 * n + 5) - tie_term AS DOUBLE)
                       / 18.0), 0.0) AS mk_z
FROM s JOIN nd USING (event_type) JOIN ties USING (event_type)
"""


# --------------------------------------------------------------------------
# q282 — SEASONAL STRENGTH per event_type: the variance-decomposition
# readout 1 − SS_within/SS_total against the hour-of-day profile — the
# gate a pipeline checks BEFORE fitting seasonal models (q113 backtests
# a seasonal baseline, q212 flags seasonal outliers; this quantifies
# whether the seasonality is even there). Exactness: values become
# integer micro-units vu = round(value·1e6) (both engines round the
# same double); with per-(type, hour) exact sums S_h/n_h and global
# S/n/Q = Σvu² (Q in decimal(38,0) BY DESIGN — vu² alone is ~1e18),
# SS_total = Q − S²/n and SS_within = Q − Σ_h S_h²/n_h need NO row
# pass: the whole statistic is sufficient-statistics arithmetic. The
# 24 per-hour S_h²/n_h terms are identical doubles on both engines and
# fold in PINNED hour order (q268 discipline); one IEEE chain each for
# the two SS values and the strength, rounded 6 dp.
# Scale: one data-sized groupBy to the (type, hour) summary.
# --------------------------------------------------------------------------
def q282_seasonal_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select(
        "event_type",
        F.hour("ts").alias("hr"),
        F.round(F.col("value") * 1e6).cast("long").alias("vu"),
    )
    hourly = ev.groupBy("event_type", "hr").agg(
        F.count("*").alias("n_h"), F.sum("vu").alias("s_h")
    )
    glob = ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("vu").alias("s"),
        F.sum(F.col("vu").cast("decimal(38,0)") * F.col("vu")).alias("q"),
    )
    between = hourly.groupBy("event_type").agg(
        F.count("*").alias("n_hours"),
        F.aggregate(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("hr"),
                        (
                            F.col("s_h").cast("double")
                            * F.col("s_h").cast("double")
                            / F.col("n_h").cast("double")
                        ).alias("p"),
                    )
                )
            ),
            F.lit(0.0),
            lambda acc, x: acc + x["p"],
        ).alias("sb"),
    )
    j = glob.join(between, "event_type")
    qd = F.col("q").cast("double")
    sst = qd - F.col("s").cast("double") * F.col("s").cast("double") / F.col(
        "n"
    ).cast("double")
    ssw = qd - F.col("sb")
    strength = F.lit(1.0) - ssw / F.nullif(sst, F.lit(0.0))
    return j.select(
        "event_type",
        "n",
        "n_hours",
        F.round(sst / F.lit(1e12), 6).alias("sst_r"),
        F.round(ssw / F.lit(1e12), 6).alias("ssw_r"),
        F.round(strength, 6).alias("strength_r"),
    )


Q282_SQL = """
WITH ev AS (SELECT event_type, extract(hour FROM ts) AS hr,
                   CAST(round(value * 1e6) AS BIGINT) AS vu
            FROM events),
h AS (SELECT event_type, hr, count(*) AS n_h, sum(vu) AS s_h
      FROM ev GROUP BY 1, 2),
g AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(vu) AS BIGINT) AS s,
             sum(CAST(vu AS HUGEINT) * vu) AS q
      FROM ev GROUP BY 1),
b AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_hours,
             list_reduce(list(CAST(s_h AS DOUBLE) * CAST(s_h AS DOUBLE)
                              / CAST(n_h AS DOUBLE) ORDER BY hr),
                         (x, y) -> x + y) AS sb
      FROM h GROUP BY 1)
SELECT g.event_type, n, n_hours,
       round((CAST(q AS DOUBLE)
              - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
             / 1e12, 6) AS sst_r,
       round((CAST(q AS DOUBLE) - sb) / 1e12, 6) AS ssw_r,
       round(1.0 - (CAST(q AS DOUBLE) - sb)
                   / nullif(CAST(q AS DOUBLE)
                            - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                              / CAST(n AS DOUBLE), 0.0), 6) AS strength_r
FROM g JOIN b ON b.event_type = g.event_type
"""


QUERIES = {
    "q282_seasonal_strength": q282_seasonal_strength,
    "q82_gapfill_locf": q82_gapfill_locf,
    "q203_sax_motifs": q203_sax_motifs,
    "q212_seasonal_mad_outliers": q212_seasonal_mad_outliers,
    "q83_rolling_zscore": q83_rolling_zscore,
    "q160_rolling_median": q160_rolling_median,
    "q104_rolling_corr": q104_rolling_corr,
    "q222_interarrival_burstiness": q222_interarrival_burstiness,
    "q241_haar_energy": q241_haar_energy,
    "q111_ewma": q111_ewma,
    "q112_max_drawdown": q112_max_drawdown,
    "q113_seasonal_backtest": q113_seasonal_backtest,
    "q136_corr_matrix": q136_corr_matrix,
    "q177_cusum": q177_cusum,
    "q260_theil_sen": q260_theil_sen,
    "q261_mann_kendall": q261_mann_kendall,
}

ORACLES = {
    "q282_seasonal_strength": Q282_SQL,
    "q82_gapfill_locf": Q82_SQL,
    "q203_sax_motifs": Q203_SQL,
    "q212_seasonal_mad_outliers": Q212_SQL,
    "q83_rolling_zscore": Q83_SQL,
    "q160_rolling_median": Q160_SQL,
    "q104_rolling_corr": Q104_SQL,
    "q222_interarrival_burstiness": Q222_SQL,
    "q241_haar_energy": Q241_SQL,
    "q111_ewma": Q111_SQL,
    "q112_max_drawdown": Q112_SQL,
    "q113_seasonal_backtest": Q113_SQL,
    "q136_corr_matrix": Q136_SQL,
    "q177_cusum": Q177_SQL,
    "q260_theil_sen": Q260_SQL,
    "q261_mann_kendall": Q261_SQL,
}
