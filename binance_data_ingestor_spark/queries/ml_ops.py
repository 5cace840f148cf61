"""Model-adjacent aggregates: grouped regression and point-in-time
feature assembly — the feature-engineering queries a training pipeline
runs against the lake.

q89 fits per-group simple linear regressions in ONE aggregation pass
(regr_* are plain JVM aggregate functions — sufficient statistics,
map-side combinable, no iteration). q90 assembles multiple
time-varying features per target row with a single keyed window —
the feature-store "point-in-time correct join" without one as-of join
per feature table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from .util import copurchase_pairs, load


# --------------------------------------------------------------------------
# q89 — per-brand price~quantity regression (slope, intercept, R²,
# n). One broadcast dim join + one groupBy: the regr_* aggregates
# reduce each group to O(1) sufficient statistics at the mappers, so
# the shuffle carries 25 brands × a handful of doubles no matter the
# fact-table size.
# --------------------------------------------------------------------------
def q89_grouped_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    part = load(spark, sf_dir, "part").select("p_partkey", "p_brand")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.regr_count("l_extendedprice", "l_quantity").alias("n_pts"),
            F.round(F.regr_slope("l_extendedprice", "l_quantity"), 4).alias("slope_r"),
            F.round(F.regr_intercept("l_extendedprice", "l_quantity"), 4).alias(
                "intercept_r"
            ),
            F.round(F.regr_r2("l_extendedprice", "l_quantity"), 6).alias("r2_r"),
        )
    )


Q89_SQL = """
SELECT p_brand,
       regr_count(l_extendedprice, l_quantity) AS n_pts,
       round(regr_slope(l_extendedprice, l_quantity), 4) AS slope_r,
       round(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept_r,
       round(regr_r2(l_extendedprice, l_quantity), 6) AS r2_r
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
"""


# --------------------------------------------------------------------------
# q90 — point-in-time feature join: every purchase event enriched with
# the latest-prior signup value AND latest-prior click value of the
# same user. One union + ONE window shuffle covers all feature
# streams (vs one as-of join per feature table); feature rows order
# before targets at equal ts so "at or before" is inclusive. Exact-ts
# collisions inside a feature stream dedup via max_by(event_id).
# --------------------------------------------------------------------------
def q90_pit_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "event_type", "value"
    )

    def feature(ev_type: str, name: str) -> DataFrame:
        return (
            ev.filter(F.col("event_type") == ev_type)
            .groupBy("user_id", "ts")
            .agg(F.max_by("value", "event_id").alias(name))
        )

    targets = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    unioned = (
        targets.withColumn("_t", F.lit(1))
        .unionByName(feature("signup", "signup_val"), allowMissingColumns=True)
        .unionByName(feature("click", "click_val"), allowMissingColumns=True)
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", F.col("_t").asc_nulls_first())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        unioned.select(
            "event_id",
            "user_id",
            "ts",
            "value",
            "_t",
            F.last("signup_val", ignorenulls=True).over(w).alias("signup_val"),
            F.last("click_val", ignorenulls=True).over(w).alias("click_val"),
        )
        .filter(F.col("_t") == 1)
        .select(
            "event_id",
            "user_id",
            F.round("value", 2).alias("value_r"),
            F.round("signup_val", 2).alias("signup_val_r"),
            F.round("click_val", 2).alias("click_val_r"),
        )
    )


Q90_SQL = """
WITH sg AS (SELECT user_id, ts, arg_max(value, event_id) AS signup_val
            FROM events WHERE event_type = 'signup' GROUP BY user_id, ts),
ck AS (SELECT user_id, ts, arg_max(value, event_id) AS click_val
       FROM events WHERE event_type = 'click' GROUP BY user_id, ts),
t AS (SELECT event_id, user_id, ts, value FROM events
      WHERE event_type = 'purchase')
SELECT t.event_id, t.user_id, round(t.value, 2) AS value_r,
       round(sg.signup_val, 2) AS signup_val_r,
       round(ck.click_val, 2) AS click_val_r
FROM t
ASOF LEFT JOIN sg ON t.user_id = sg.user_id AND t.ts >= sg.ts
ASOF LEFT JOIN ck ON t.user_id = ck.user_id AND t.ts >= ck.ts
"""


# --------------------------------------------------------------------------
# q106 — market-basket association mining over order baskets: for part
# pairs co-purchased in ≥2 distinct orders, support / directional
# confidence / lift, top-20 by lift. The pair expansion is the same
# codegen'd distinct self-join as the dedup family (per-basket
# quadratic, bounded by max basket size ~13); per-item counts join
# back onto the pairs keyed by part, and the single basket-count row
# broadcasts. Ranking rounds lift to 9 dp BEFORE the top-k sort so
# float ties break identically on both engines (then u, v as total
# tie-break).
# --------------------------------------------------------------------------
def q106_copurchase_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    # basket set + pair counts shared with q105 (util.copurchase_pairs)
    baskets, pairs = copurchase_pairs(spark, sf_dir)
    n_orders = baskets.select("l_orderkey").distinct().agg(
        F.count("*").alias("n_orders")
    )
    item = baskets.groupBy(F.col("l_partkey").alias("p")).agg(
        F.count("*").alias("cnt")
    )
    scored = (
        pairs.join(item.select(F.col("p").alias("u"), F.col("cnt").alias("cu")), "u")
        .join(item.select(F.col("p").alias("v"), F.col("cnt").alias("cv")), "v")
        .crossJoin(F.broadcast(n_orders))
        .select(
            "u",
            "v",
            "pc",
            F.round(F.col("pc") / F.col("n_orders"), 6).alias("support_r"),
            F.round(F.col("pc") / F.col("cu"), 6).alias("conf_uv_r"),
            F.round(F.col("pc") / F.col("cv"), 6).alias("conf_vu_r"),
            F.round(
                F.col("pc") * F.col("n_orders") / (F.col("cu") * F.col("cv")), 9
            ).alias("lift_key"),
        )
    )
    return (
        scored.orderBy(F.col("lift_key").desc(), "u", "v")
        .limit(20)
        .select(
            "u",
            "v",
            "pc",
            "support_r",
            "conf_uv_r",
            "conf_vu_r",
            F.round("lift_key", 6).alias("lift_r"),
        )
    )


Q106_SQL = """
WITH baskets AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
n AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM baskets),
item AS (SELECT l_partkey AS p, count(*) AS cnt FROM baskets GROUP BY 1),
pairs AS (SELECT a.l_partkey AS u, b.l_partkey AS v, count(*) AS pc
          FROM baskets a JOIN baskets b
            ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
          GROUP BY 1, 2 HAVING count(*) >= 2),
scored AS (
  SELECT u, v, pc,
         round(pc / CAST(n_orders AS DOUBLE), 6) AS support_r,
         round(pc / CAST(cu.cnt AS DOUBLE), 6) AS conf_uv_r,
         round(pc / CAST(cv.cnt AS DOUBLE), 6) AS conf_vu_r,
         round(pc * n_orders / CAST(cu.cnt * cv.cnt AS DOUBLE), 9) AS lift_key
  FROM pairs
  JOIN item cu ON cu.p = pairs.u
  JOIN item cv ON cv.p = pairs.v
  CROSS JOIN n)
SELECT u, v, pc, support_r, conf_uv_r, conf_vu_r,
       round(lift_key, 6) AS lift_r
FROM scored ORDER BY lift_key DESC, u, v LIMIT 20
"""


# --------------------------------------------------------------------------
# q132 — gains table / decile lift: rank customers by a model score
# (account balance as the stand-in), cut into score deciles, and
# report per-decile and cumulative response rates and lift vs the
# overall base rate. The standard offline model-evaluation readout.
# Response = customer placed ≥1 urgent-priority order (semi-join).
# The decile cut uses the bucket-offset two-pass ntile
# (partitioning.with_global_ntile): the sorted set is customers —
# 10^8 rows at 100 TB — so a single-partition global ntile window is
# a one-task sort of every customer; the two-pass form is fully
# parallel with a 64-row serialized bucket prefix. The cumulative
# stage runs over 10 rows (bounded — plain window is correct there).
# --------------------------------------------------------------------------
def q132_decile_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.partitioning import with_global_ntile, with_range_bucket

    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    responders = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
        .distinct()
    )
    labeled = cust.join(
        responders, cust["c_custkey"] == responders["o_custkey"], "left"
    ).select(
        "c_custkey",
        "c_acctbal",
        F.col("o_custkey").isNotNull().cast("long").alias("resp"),
    ).localCheckpoint(eager=False)
    tiled = with_global_ntile(
        with_range_bucket(labeled, -F.col("c_acctbal"), bucket_col="__rb"),
        [F.desc("c_acctbal"), F.asc("c_custkey")],
        10,
        bucket=F.col("__rb"),
        tile_col="decile",
    )
    deciles = tiled.groupBy("decile").agg(
        F.count("*").alias("n"), F.sum("resp").alias("n_resp")
    ).localCheckpoint(eager=False)
    # cumulative via bounded explode over the 10 known tiles (decile d
    # contributes to every target ≥ d) — no partition-less window, no
    # single-partition exchange, same exact long sums
    cum = (
        deciles.select(
            F.explode(F.sequence(F.col("decile"), F.lit(10))).alias("__d"),
            "n",
            "n_resp",
        )
        .groupBy("__d")
        .agg(F.sum("n").alias("__cum_n"), F.sum("n_resp").alias("__cum_resp"))
    )
    # grand totals: 1-row planning statistic as literals (a broadcast
    # cross of the 1-row aggregate would add a BNLJ node to the plan)
    tot = deciles.agg(F.sum("n"), F.sum("n_resp")).collect()[0]
    tot_n, tot_resp = int(tot[0] or 0), int(tot[1] or 0)
    return deciles.join(cum, deciles["decile"] == cum["__d"]).select(
        "decile",
        "n",
        "n_resp",
        F.round(F.col("n_resp") / F.col("n"), 6).alias("rate_r"),
        F.round(
            (F.col("__cum_resp") / F.col("__cum_n"))
            / (F.lit(tot_resp) / F.lit(tot_n)),
            6,
        ).alias("cum_lift_r"),
    )


Q132_SQL = """
WITH labeled AS (
  SELECT c_custkey, c_acctbal,
         CASE WHEN EXISTS (SELECT 1 FROM orders
                           WHERE o_custkey = c_custkey
                             AND o_orderpriority = '1-URGENT')
              THEN 1 ELSE 0 END AS resp
  FROM customer),
d AS (SELECT ntile(10) OVER (ORDER BY c_acctbal DESC, c_custkey ASC)
               AS decile, resp
      FROM labeled),
g AS (SELECT decile, count(*) AS n,
             CAST(sum(resp) AS BIGINT) AS n_resp
      FROM d GROUP BY decile)
SELECT decile, n, n_resp,
       round(n_resp / CAST(n AS DOUBLE), 6) AS rate_r,
       round((sum(n_resp) OVER (ORDER BY decile ROWS UNBOUNDED PRECEDING)
              / CAST(sum(n) OVER (ORDER BY decile ROWS UNBOUNDED PRECEDING)
                     AS DOUBLE))
             / (sum(n_resp) OVER () / CAST(sum(n) OVER () AS DOUBLE)), 6)
         AS cum_lift_r
FROM g
"""


# --------------------------------------------------------------------------
# q133 — AUC via the Mann-Whitney rank-sum identity:
# AUC = (R_pos − n_pos(n_pos+1)/2) / (n_pos · n_neg), with ranks over
# the score ordering. Ranks use row_number with a deterministic key
# tie-break (score ties are broken identically on both engines rather
# than averaged — documented deviation from tie-averaged MW, exact
# for continuous scores). Ranking runs through the bucket-offset
# two-pass global rank (partitioning.with_global_rank) — a one-task
# global row_number sort over 10^8 customers is not acceptable at
# scale; the rank-sum aggregate only needs sum(pos·rank), which the
# offset form reproduces exactly. One 1-row aggregate on top.
# --------------------------------------------------------------------------
def q133_auc_ranksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.partitioning import with_global_rank, with_range_bucket

    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    responders = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
        .distinct()
    )
    labeled = cust.join(
        responders, cust["c_custkey"] == responders["o_custkey"], "left"
    ).select(
        "c_acctbal",
        "c_custkey",
        F.col("o_custkey").isNotNull().cast("long").alias("pos"),
    ).localCheckpoint(eager=False)
    ranked = with_global_rank(
        with_range_bucket(labeled, F.col("c_acctbal"), bucket_col="__rb"),
        [],
        [F.asc("c_acctbal"), F.asc("c_custkey")],
        bucket=F.col("__rb"),
        rank_col="rk",
    ).select("pos", "rk")
    return ranked.agg(
        F.sum("pos").alias("n_pos"),
        F.sum(F.lit(1) - F.col("pos")).alias("n_neg"),
        F.round(
            (
                F.sum(F.col("pos") * F.col("rk"))
                - F.sum("pos") * (F.sum("pos") + 1) / 2
            )
            / F.nullif(
                (F.sum("pos") * F.sum(F.lit(1) - F.col("pos"))).cast("double"),
                F.lit(0.0),
            ),
            6,
        ).alias("auc_r"),
    )


Q133_SQL = """
WITH labeled AS (
  SELECT c_acctbal, c_custkey,
         CASE WHEN EXISTS (SELECT 1 FROM orders
                           WHERE o_custkey = c_custkey
                             AND o_orderpriority = '1-URGENT')
              THEN 1 ELSE 0 END AS pos
  FROM customer),
ranked AS (
  SELECT pos, row_number() OVER (ORDER BY c_acctbal ASC, c_custkey ASC)
           AS rk
  FROM labeled)
SELECT CAST(sum(pos) AS BIGINT) AS n_pos,
       CAST(sum(1 - pos) AS BIGINT) AS n_neg,
       round((sum(pos * rk) - sum(pos) * (sum(pos) + 1) / 2)
             / nullif(CAST(sum(pos) * sum(1 - pos) AS DOUBLE), 0.0), 6)
         AS auc_r
FROM ranked
"""


# --------------------------------------------------------------------------
# q174 — purged time-series cross-validation audit: K=5 contiguous
# time folds over the event log; for each fold, every row is test
# (inside the fold), purged (within the 12 h embargo around the fold's
# boundaries — the leakage guard for features with temporal reach), or
# train. The split a PIT-correct backtest runs instead of random K-fold
# (which leaks future into past). Fold boundaries derive from one
# 1-row min/max broadcast in exact µs integer arithmetic; the
# row × K expansion is the honest cost (each row gets a role per fold)
# and stays a zero-shuffle map until the 5-group count.
# --------------------------------------------------------------------------
TSCV_FOLDS = 5
TSCV_EMBARGO_US = 12 * 3600 * 1_000_000


def q174_purged_tscv(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select(
        F.unix_micros("ts").alias("us")
    )
    span = ev.agg(
        F.min("us").alias("tmin"),
        (F.max("us") - F.min("us") + 1).alias("span_us"),
    )
    k = F.col("fold")
    lo = F.col("tmin") + F.expr(f"span_us * fold div {TSCV_FOLDS}")
    hi = F.col("tmin") + F.expr(f"span_us * (fold + 1) div {TSCV_FOLDS}")
    is_test = (F.col("us") >= lo) & (F.col("us") < hi)
    in_embargo = (F.col("us") >= lo - TSCV_EMBARGO_US) & (
        F.col("us") < hi + TSCV_EMBARGO_US
    )
    return (
        ev.crossJoin(F.broadcast(span))
        .select(
            "us",
            "tmin",
            "span_us",
            F.explode(F.sequence(F.lit(0), F.lit(TSCV_FOLDS - 1))).alias("fold"),
        )
        .select(
            k.alias("fold"),
            F.when(is_test, 1).otherwise(0).alias("t"),
            F.when(~is_test & in_embargo, 1).otherwise(0).alias("p"),
        )
        .groupBy("fold")
        .agg(
            F.sum("t").cast("long").alias("n_test"),
            F.sum("p").cast("long").alias("n_purged"),
            (F.count("*") - F.sum("t") - F.sum("p")).cast("long").alias("n_train"),
        )
    )


Q174_SQL = f"""
WITH ev AS (SELECT epoch_us(ts) AS us FROM events),
span AS (SELECT min(us) AS tmin, max(us) - min(us) + 1 AS span_us FROM ev),
x AS (
  SELECT us, tmin, span_us, f.fold
  FROM ev, span, (SELECT unnest(generate_series(0, {TSCV_FOLDS - 1})) AS fold) f),
roles AS (
  SELECT fold,
         CASE WHEN us >= tmin + span_us * fold // {TSCV_FOLDS}
               AND us <  tmin + span_us * (fold + 1) // {TSCV_FOLDS}
              THEN 1 ELSE 0 END AS t,
         CASE WHEN NOT (us >= tmin + span_us * fold // {TSCV_FOLDS}
                    AND us <  tmin + span_us * (fold + 1) // {TSCV_FOLDS})
               AND us >= tmin + span_us * fold // {TSCV_FOLDS}
                         - {TSCV_EMBARGO_US}
               AND us <  tmin + span_us * (fold + 1) // {TSCV_FOLDS}
                         + {TSCV_EMBARGO_US}
              THEN 1 ELSE 0 END AS p
  FROM x)
SELECT fold,
       CAST(sum(t) AS BIGINT) AS n_test,
       CAST(sum(p) AS BIGINT) AS n_purged,
       CAST(count(*) - sum(t) - sum(p) AS BIGINT) AS n_train
FROM roles GROUP BY fold
"""


# --------------------------------------------------------------------------
# q204 — leave-one-out target encoding with additive smoothing (the
# standard high-cardinality categorical encoder for tabular training
# data; LOO removes the row's own label so the feature leaks nothing):
# enc_i = (Σ_cat y − y_i + m·prior) / (n_cat − 1 + m), prior = global
# mean, m = 20. Scale shape: ONE partially-aggregable groupBy reduces
# the fact table to |categories| sufficient-statistic rows, which
# broadcast-join back; the global prior is a 1-row crossJoin-broadcast
# scalar — no window, no second scan of unreduced data.
# Float determinism: the target is summed in exact integer CENTS
# (CAST(round(price·100) AS BIGINT)), so category and global sums are
# order-independent; the only floating steps (prior division, final
# blend) are fixed-shape IEEE expressions both engines evaluate
# identically.
# --------------------------------------------------------------------------
_LOO_M = 20


def q204_loo_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100, 0)
        .cast("long")
        .alias("cents"),
    )
    cat = orders.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_c"), F.sum("cents").alias("s_c")
    )
    glob = orders.agg(
        (F.sum("cents") / F.count("*")).alias("prior_cents")
    )
    enc = (
        (
            F.col("s_c")
            - F.col("cents")
            + F.lit(float(_LOO_M)) * F.col("prior_cents")
        )
        / (F.col("n_c") - 1 + F.lit(_LOO_M))
        / 100.0
    )
    return (
        orders.join(F.broadcast(cat), "o_orderpriority")
        .crossJoin(F.broadcast(glob))
        .select(
            "o_orderkey",
            "o_orderpriority",
            F.round(enc, 6).alias("loo_enc"),
        )
    )


Q204_SQL = f"""
WITH o AS (SELECT o_orderkey, o_orderpriority,
                  CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
           FROM orders),
cat AS (SELECT o_orderpriority,
               CAST(count(*) AS BIGINT) AS n_c,
               CAST(sum(cents) AS BIGINT) AS s_c
        FROM o GROUP BY o_orderpriority),
gl AS (SELECT CAST(sum(cents) AS BIGINT) * 1.0 / count(*) AS prior_cents
       FROM o)
SELECT o.o_orderkey, o.o_orderpriority,
       round((s_c - cents + {float(_LOO_M)} * prior_cents)
             / (n_c - 1 + {_LOO_M}) / 100.0, 6) AS loo_enc
FROM o JOIN cat USING (o_orderpriority) CROSS JOIN gl
"""


# --------------------------------------------------------------------------
# q217 — one-pass best-split finder (the inner loop of decision-tree /
# GBDT training, and a standard feature-importance screen for tabular
# training data): for each candidate feature, the threshold whose
# binary split maximizes Gini gain against the return-flag label.
# Scale shape: the ONLY data-sized stage is one partially-aggregable
# groupBy collapsing the fact table to (feature, value) histograms
# (bounded by each feature's value domain); prefix sums, gains, and
# the per-feature argmax all run on those histogram rows. Every input
# to the gain formula is an exact integer (counts + positives), so the
# fixed-shape double expression is identical across engines; the
# argmax is a row_number over (rounded gain DESC, threshold ASC) —
# fully tie-broken.
# --------------------------------------------------------------------------
def q217_best_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select(
        (F.col("l_returnflag") == "R").cast("long").alias("y"),
        F.col("l_quantity").cast("int").alias("quantity"),
        F.round(F.col("l_discount") * 100, 0).cast("int").alias("discount_c"),
        F.round(F.col("l_tax") * 100, 0).cast("int").alias("tax_c"),
    )
    melted = li.select(
        "y",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("feature"), F.col(c).alias("v")
                    )
                    for c in ("quantity", "discount_c", "tax_c")
                ]
            )
        ).alias("fv"),
    ).select("y", "fv.feature", "fv.v")
    hist = melted.groupBy("feature", "v").agg(
        F.count("*").alias("n"), F.sum("y").alias("p")
    )
    wf = W.partitionBy("feature").orderBy("v")
    wt = W.partitionBy("feature")
    pre = hist.select(
        "feature",
        "v",
        F.sum("n").over(wf.rowsBetween(W.unboundedPreceding, 0)).alias("nl"),
        F.sum("p").over(wf.rowsBetween(W.unboundedPreceding, 0)).alias("pl"),
        F.sum("n").over(wt).alias("nn"),
        F.sum("p").over(wt).alias("pp"),
    ).filter(F.col("nl") < F.col("nn"))
    gain = (
        2.0 * F.col("pp") * (F.col("nn") - F.col("pp"))
        / (F.col("nn") * F.col("nn"))
        - 2.0 * F.col("pl") * (F.col("nl") - F.col("pl"))
        / (F.col("nl") * F.col("nn"))
        - 2.0 * (F.col("pp") - F.col("pl"))
        * ((F.col("nn") - F.col("nl")) - (F.col("pp") - F.col("pl")))
        / ((F.col("nn") - F.col("nl")) * F.col("nn"))
    )
    scored = pre.select(
        "feature",
        F.col("v").alias("thr"),
        F.round(gain, 6).alias("gain_r"),
        F.col("nl").alias("n_left"),
        (F.col("nn") - F.col("nl")).alias("n_right"),
    )
    wr = W.partitionBy("feature").orderBy(F.desc("gain_r"), F.asc("thr"))
    return (
        scored.withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


Q217_SQL = """
WITH base AS (SELECT CAST(l_returnflag = 'R' AS BIGINT) AS y,
                     CAST(l_quantity AS INT) AS quantity,
                     CAST(round(l_discount * 100, 0) AS INT) AS discount_c,
                     CAST(round(l_tax * 100, 0) AS INT) AS tax_c
              FROM lineitem),
melted AS (SELECT y, 'quantity' AS feature, quantity AS v FROM base
           UNION ALL SELECT y, 'discount_c', discount_c FROM base
           UNION ALL SELECT y, 'tax_c', tax_c FROM base),
hist AS (SELECT feature, v, CAST(count(*) AS BIGINT) AS n,
                CAST(sum(y) AS BIGINT) AS p
         FROM melted GROUP BY 1, 2),
pre AS (SELECT feature, v,
               CAST(sum(n) OVER (PARTITION BY feature ORDER BY v) AS BIGINT) AS nl,
               CAST(sum(p) OVER (PARTITION BY feature ORDER BY v) AS BIGINT) AS pl,
               CAST(sum(n) OVER (PARTITION BY feature) AS BIGINT) AS nn,
               CAST(sum(p) OVER (PARTITION BY feature) AS BIGINT) AS pp
        FROM hist),
scored AS (SELECT feature, v AS thr,
                  round(2.0 * pp * (nn - pp) / (nn * nn)
                        - 2.0 * pl * (nl - pl) / (nl * nn)
                        - 2.0 * (pp - pl) * ((nn - nl) - (pp - pl))
                          / ((nn - nl) * nn), 6) AS gain_r,
                  nl AS n_left, (nn - nl) AS n_right
           FROM pre WHERE nl < nn),
ranked AS (SELECT *, row_number() OVER (PARTITION BY feature
                                        ORDER BY gain_r DESC, thr ASC) AS rn
           FROM scored)
SELECT feature, thr, gain_r, n_left, n_right FROM ranked WHERE rn = 1
"""


# --------------------------------------------------------------------------
# q223 — frequent 3-itemsets via a-priori pruning: which part TRIPLES
# co-occur in >= 2 orders. One level up from q106's pairs — the step
# where naive enumeration explodes (a 40-item basket has 9,880 triples
# but only 780 pairs) and the a-priori property ("every subset of a
# frequent set is frequent") becomes the algorithm. Scale shape: pair
# instances rebuild from the checkpointed basket artifact and are
# LEFT-SEMI pruned against the frequent-pair table BEFORE the third
# item joins in, then the (u,w)/(v,w) sub-pairs are semi-pruned too —
# so the triple shuffle carries only candidates whose every sub-pair
# is frequent, not the raw basket-cubed blowup. The prune is pure
# optimization (any tc>=2 triple has all sub-pairs >=2 by a-priori),
# so the oracle can state the plain triple join. Counts exact ints;
# support = one rounded division via the 1-row n_orders broadcast
# (the q106 crossJoin shape — adjudicated in plans_census).
# --------------------------------------------------------------------------
def q223_frequent_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .util import COPURCHASE_MIN_ORDERS

    baskets, pairs = copurchase_pairs(spark, sf_dir)
    fp = pairs.select("u", "v")
    n_orders = baskets.select("l_orderkey").distinct().agg(
        F.count("*").alias("n_orders")
    )
    pi = (
        baskets.alias("x")
        .join(baskets.alias("y"), "l_orderkey")
        .filter(F.col("x.l_partkey") < F.col("y.l_partkey"))
        .select(
            "l_orderkey",
            F.col("x.l_partkey").alias("u"),
            F.col("y.l_partkey").alias("v"),
        )
        .join(fp, ["u", "v"], "left_semi")
    )
    cand = (
        pi.join(baskets.alias("z"), "l_orderkey")
        .filter(F.col("z.l_partkey") > F.col("v"))
        .select("u", "v", F.col("z.l_partkey").alias("w"))
        .join(
            fp.select(F.col("u"), F.col("v").alias("w")), ["u", "w"], "left_semi"
        )
        .join(
            fp.select(F.col("u").alias("v"), F.col("v").alias("w")),
            ["v", "w"],
            "left_semi",
        )
    )
    tri = (
        cand.groupBy("u", "v", "w")
        .agg(F.count("*").alias("tc"))
        .filter(F.col("tc") >= COPURCHASE_MIN_ORDERS)
    )
    return tri.crossJoin(F.broadcast(n_orders)).select(
        "u",
        "v",
        "w",
        "tc",
        F.round(F.col("tc") / F.col("n_orders"), 9).alias("support_r"),
    )


Q223_SQL = """
WITH baskets AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
n AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM baskets),
tr AS (SELECT a.l_partkey AS u, b.l_partkey AS v, c.l_partkey AS w,
              CAST(count(*) AS BIGINT) AS tc
       FROM baskets a
       JOIN baskets b ON a.l_orderkey = b.l_orderkey
                     AND a.l_partkey < b.l_partkey
       JOIN baskets c ON a.l_orderkey = c.l_orderkey
                     AND b.l_partkey < c.l_partkey
       GROUP BY 1, 2, 3 HAVING count(*) >= 2)
SELECT u, v, w, tc,
       round(tc / CAST(n_orders AS DOUBLE), 9) AS support_r
FROM tr CROSS JOIN n
"""


# --------------------------------------------------------------------------
# q227 — calibration curve + Brier reliability terms: bucket a score
# into 10 equal-width probability bins and compare mean predicted
# probability against the observed event rate per bin — the standard
# model-readout for "does 0.7 mean 70%?", with each bin's Murphy
# reliability numerator n_k·(p̄_k − ō_k)² emitted so
# Σ rel_term / N recovers the Brier reliability component. Score
# construction is INTEGER-exact end-to-end: the customer balance in
# cents min-max-scales to a micro-probability
# p_c = (bal_c − lo)·10⁶ DIV (hi − lo + 1) ∈ [0, 10⁶) (pure integer
# DIV — no double-floor boundary risk, the round-6 ntile lesson), the
# bin is p_c DIV 10⁵, and every output is a single IEEE expression
# over exact int64 sums (no round() needed — the q35 convention).
# Label = q132's urgent-order responder. Scale shape: one 1-ROW
# min/max span broadcast (BNLJ adjudicated — the q94/q129 shape), one
# broadcast semi-join for labels, one 10-row map-side-combinable
# aggregate. The (Σp_c − 10⁶·n_pos)² product is computed in DOUBLE
# (exact casts; int64 would overflow past ~10⁹ rows/bin).
# --------------------------------------------------------------------------
def q227_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer").select(
        "c_custkey",
        (F.col("c_acctbal").cast("decimal(18,2)") * 100).cast("long").alias("bal_c"),
    )
    responders = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
        .distinct()
    )
    labeled = cust.join(
        responders, cust["c_custkey"] == responders["o_custkey"], "left"
    ).select(
        "bal_c", F.col("o_custkey").isNotNull().cast("long").alias("y")
    )
    span = labeled.agg(F.min("bal_c").alias("lo"), F.max("bal_c").alias("hi"))
    scored = labeled.join(F.broadcast(span)).select(
        "y",
        F.expr("(bal_c - lo) * 1000000 DIV (hi - lo + 1)").alias("p_c"),
    )
    g = scored.groupBy(
        F.expr("p_c DIV 100000").cast("long").alias("bin")
    ).agg(
        F.count("*").alias("n"),
        F.sum("y").alias("n_pos"),
        F.sum("p_c").alias("sp"),
    )
    nd = F.col("n").cast("double")
    mean_pred = F.col("sp").cast("double") / (nd * 1e6)
    event_rate = F.col("n_pos").cast("double") / nd
    dev = F.col("sp").cast("double") - F.lit(1e6) * F.col("n_pos").cast("double")
    return g.select(
        "bin",
        "n",
        "n_pos",
        mean_pred.alias("mean_pred"),
        event_rate.alias("event_rate"),
        (dev * dev / (F.lit(1e12) * nd)).alias("rel_term"),
    )


Q227_SQL = """
WITH c AS (SELECT c_custkey,
                  CAST(c_acctbal * 100 AS BIGINT) AS bal_c
           FROM customer),
lab AS (SELECT bal_c,
               CASE WHEN EXISTS (SELECT 1 FROM orders
                                 WHERE o_custkey = c_custkey
                                   AND o_orderpriority = '1-URGENT')
                    THEN 1 ELSE 0 END AS y
        FROM c),
span AS (SELECT min(bal_c) AS lo, max(bal_c) AS hi FROM lab),
scored AS (SELECT y, (bal_c - lo) * 1000000 // (hi - lo + 1) AS p_c
           FROM lab, span),
g AS (SELECT CAST(p_c // 100000 AS BIGINT) AS bin,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(y) AS BIGINT) AS n_pos,
             CAST(sum(p_c) AS BIGINT) AS sp
      FROM scored GROUP BY 1)
SELECT bin, n, n_pos,
       CAST(sp AS DOUBLE) / (CAST(n AS DOUBLE) * 1e6) AS mean_pred,
       CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE) AS event_rate,
       (CAST(sp AS DOUBLE) - 1e6 * CAST(n_pos AS DOUBLE))
         * (CAST(sp AS DOUBLE) - 1e6 * CAST(n_pos AS DOUBLE))
         / (1e12 * CAST(n AS DOUBLE)) AS rel_term
FROM g
"""



# --------------------------------------------------------------------------
# q242 — split-conformal prediction thresholds per customer segment:
# the distribution-free 90% prediction-interval radius. Orders split
# train/calibration by md5 key-hash (reproducible across engines /
# reruns / partitionings — never RNG); the "model" is the train-side
# per-segment mean price; the threshold is the ⌈0.9·(n_cal+1)⌉-th
# smallest calibration residual — conformal's finite-sample coverage
# guarantee rides on that EXACT order statistic, so approx_percentile
# is disqualified by construction. Exactness trick: with the mean as
# the ratio num/den of exact int64 sums, the residual is kept as the
# INTEGER |y·den − num| (scaled by den) and only descaled in the final
# output division. The order statistic uses the q169/q170 doctrine:
# cumulate over the aggregated (segment, residual) axis via the
# bucket-offset two-pass cumsum — the only serialized step is the
# |segments|×64 bucket prefix; ceil is pure integer arithmetic
# ((a+b−1) DIV b — the q-ntile lesson); min(struct) picks the
# threshold row and its inclusive count doubles as the empirical
# coverage numerator. y·den stays in int64 through sf1 (≈1.5e13);
# beyond that the residual moves to decimal(38,0) — same note as q230.
# --------------------------------------------------------------------------
CONF_ALPHA_NUM = 9  # coverage 9/10


def q242_conformal(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.partitioning import with_global_cumsum, with_range_bucket
    from ..operators.text import hash_bucket_sql

    oc = (
        load(spark, sf_dir, "orders")
        .join(
            F.broadcast(
                load(spark, sf_dir, "customer").select(
                    "c_custkey", F.col("c_mktsegment").alias("seg")
                )
            ),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .select(
            "seg",
            F.round(F.col("o_totalprice") * 100).cast("long").alias("y"),
            F.expr(hash_bucket_sql("spark", "o_orderkey")).alias("b"),
        )
    )
    tr = oc.filter(F.col("b") < 50).groupBy("seg").agg(
        F.count("*").alias("n_train"), F.sum("y").alias("num")
    )
    cal = (
        oc.filter(F.col("b") >= 50)
        .join(F.broadcast(tr), "seg")
        .select(
            "seg",
            F.abs(F.col("y") * F.col("n_train") - F.col("num")).alias("r"),
        )
    )
    # span agg + bucket counts + data join + n_cal totals all derive
    # from this summary: materialize it once (q142 pattern) — without
    # it every consumer re-runs the orders scan + per-row md5 split
    summary = (
        cal.groupBy("seg", "r")
        .agg(F.count("*").alias("cnt"))
        .localCheckpoint(eager=False)
    )
    tot = summary.groupBy("seg").agg(F.sum("cnt").alias("n_cal"))
    b = with_range_bucket(summary, F.col("r"), bucket_col="__rb")
    cum = with_global_cumsum(
        b, ["seg"], [F.asc("r")], "cnt", bucket=F.col("__rb"), out_col="cum"
    ).drop("__rb")
    k = F.least(
        F.expr(f"({CONF_ALPHA_NUM} * (n_cal + 1) + 9) DIV 10"), F.col("n_cal")
    )
    pick = (
        cum.join(F.broadcast(tot), "seg")
        .withColumn("k", k)
        .filter(F.col("cum") >= F.col("k"))
        .groupBy("seg", "n_cal", "k")
        .agg(F.min(F.struct("r", "cum")).alias("m"))
    )
    return pick.join(F.broadcast(tr), "seg").select(
        "seg",
        "n_train",
        "n_cal",
        "k",
        (F.col("m.r").cast("double") / F.col("n_train") / F.lit(100.0)).alias(
            "thr_r"
        ),
        (F.col("m.cum").cast("double") / F.col("n_cal")).alias("cov_r"),
    )


def _q242_sql() -> str:
    from ..operators.text import hash_bucket_sql

    return f"""
WITH oc AS (SELECT c_mktsegment AS seg,
                   CAST(round(o_totalprice * 100) AS BIGINT) AS y,
                   {hash_bucket_sql("duckdb", "o_orderkey")} AS b
            FROM orders JOIN customer ON o_custkey = c_custkey),
tr AS (SELECT seg, count(*) AS n_train, sum(y) AS num
       FROM oc WHERE b < 50 GROUP BY 1),
cal AS (SELECT oc.seg, abs(y * n_train - num) AS r
        FROM oc JOIN tr USING (seg) WHERE b >= 50),
tot AS (SELECT seg, count(*) AS n_cal FROM cal GROUP BY 1),
s AS (SELECT seg, r, count(*) AS cnt FROM cal GROUP BY 1, 2),
c AS (SELECT seg, r,
             sum(cnt) OVER (PARTITION BY seg ORDER BY r
                            ROWS UNBOUNDED PRECEDING) AS cum
      FROM s),
pick AS (SELECT c.seg, n_cal,
                least(({CONF_ALPHA_NUM} * (n_cal + 1) + 9) // 10, n_cal) AS k,
                min(r) AS thr, arg_min(cum, r) AS cum_at
         FROM c JOIN tot USING (seg)
         WHERE cum >= least(({CONF_ALPHA_NUM} * (n_cal + 1) + 9) // 10, n_cal)
         GROUP BY 1, 2, 3)
SELECT seg, CAST(n_train AS BIGINT) AS n_train,
       CAST(n_cal AS BIGINT) AS n_cal, CAST(k AS BIGINT) AS k,
       CAST(thr AS DOUBLE) / n_train / 100.0 AS thr_r,
       CAST(cum_at AS DOUBLE) / n_cal AS cov_r
FROM pick JOIN tr USING (seg)
"""


Q242_SQL = _q242_sql()


# --------------------------------------------------------------------------
# q254 — Cochran–Armitage trend test per customer segment: is the
# order-failure rate monotonically related to the (ordered) priority
# level? The dose-response test a labeling pipeline runs before
# trusting an ordinal feature — chi-square (q114) only detects
# ASSOCIATION, this detects the ordered TREND with one extra weight
# column. Exposure score w = priority rank (1-URGENT..5-LOW → 1..5),
# outcome = order failed ('F'). Everything reduces to five exact int64
# sums per segment over the ≤5-level summary (N, D, Σw·n, Σw²·n,
# Σw·d — all map-side combinable); the statistic
# z² = N·(N·Σwd − D·Σwn)² / (D·(N−D)·(N·Σw²n − (Σwn)²)) is one
# fixed-order IEEE chain over the casts (the inner differences stay
# exact int64 through sf10; the squares happen in double), nullif on
# the degenerate all-failed / no-failed / single-level segments.
# Plan: one equi-join (customer dim) + one 5-level-per-segment
# aggregate — only counts shuffle.
# --------------------------------------------------------------------------
def q254_cochran_armitage(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer").select(
        "c_custkey", F.col("c_mktsegment").alias("seg")
    )
    orders = load(spark, sf_dir, "orders").select(
        "o_custkey",
        F.substring("o_orderpriority", 1, 1).cast("long").alias("w"),
        (F.col("o_orderstatus") == "F").cast("long").alias("y"),
    )
    levels = (
        orders.join(cust, orders["o_custkey"] == cust["c_custkey"])
        .groupBy("seg", "w")
        .agg(F.count("*").alias("nw"), F.sum("y").alias("dw"))
    )
    agg = levels.groupBy("seg").agg(
        F.sum("nw").alias("n"),
        F.sum("dw").alias("d"),
        F.sum(F.col("w") * F.col("nw")).alias("swn"),
        F.sum(F.col("w") * F.col("w") * F.col("nw")).alias("sw2n"),
        F.sum(F.col("w") * F.col("dw")).alias("swd"),
    )
    num1 = F.col("n") * F.col("swd") - F.col("d") * F.col("swn")
    den1 = F.col("n") * F.col("sw2n") - F.col("swn") * F.col("swn")
    z2 = (
        F.col("n").cast("double")
        * num1.cast("double")
        * num1.cast("double")
        / F.nullif(
            F.col("d").cast("double")
            * (F.col("n") - F.col("d")).cast("double")
            * den1.cast("double"),
            F.lit(0.0),
        )
    )
    return agg.select("seg", "n", "d", "swn", "sw2n", "swd", z2.alias("ca_z2"))


Q254_SQL = """
WITH o AS (SELECT o_custkey,
                  CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS w,
                  CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
           FROM orders),
lv AS (SELECT c_mktsegment AS seg, w, count(*) AS nw, sum(y) AS dw
       FROM o JOIN customer ON o_custkey = c_custkey GROUP BY 1, 2),
a AS (SELECT seg,
             CAST(sum(nw) AS BIGINT) AS n,
             CAST(sum(dw) AS BIGINT) AS d,
             CAST(sum(w * nw) AS BIGINT) AS swn,
             CAST(sum(w * w * nw) AS BIGINT) AS sw2n,
             CAST(sum(w * dw) AS BIGINT) AS swd
      FROM lv GROUP BY 1)
SELECT seg, n, d, swn, sw2n, swd,
       CAST(n AS DOUBLE)
         * CAST(n * swd - d * swn AS DOUBLE)
         * CAST(n * swd - d * swn AS DOUBLE)
         / nullif(CAST(d AS DOUBLE) * CAST(n - d AS DOUBLE)
                  * CAST(n * sw2n - swn * swn AS DOUBLE), 0.0) AS ca_z2
FROM a
"""


# --------------------------------------------------------------------------
# q270 — inverse-propensity-weighted treatment effect: does URGENT
# priority (the "treatment") move order value, adjusting for the
# customer segment (the observed confounder)? The workhorse of
# offline causal evaluation on logged data. Because the propensity
# e(s) = P(T=1 | segment) is segment-constant, the IPW sums collapse
# to per-segment EXACT INTEGER statistics: each segment contributes
# term_t = (ΣY_treated)·n_s/n_treated and term_c = (ΣY_control)·
# n_s/n_control — ratios of exact int64 cent sums, one IEEE chain per
# segment. The global ATE sums the per-segment contributions as EXACT
# INTEGER MICRO-UNITS (round(term·1e6) → BIGINT — a 6-dp-rounded
# DOUBLE is not dyadic, so summing rounded doubles is still
# order-dependent; the integer detour is the only order-free form),
# then divides once; per-segment rows are emitted alongside so the
# grain is auditable. DEGENERATE SEGMENTS (zero treated or zero
# control rows — contrib_u NULL) are excluded from BOTH the numerator
# and the denominator n_all (round-9 ADVICE: counting their n while
# dropping their null contribution silently shrank the ATE toward 0;
# the estimator is now the IPW effect over estimable segments only).
# Scale: one customer-dim equi-join + a 5-row segment summary; only
# counts and cent sums shuffle.
# --------------------------------------------------------------------------
def q270_ipw_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer").select(
        "c_custkey", F.col("c_mktsegment").alias("seg")
    )
    orders = load(spark, sf_dir, "orders").select(
        "o_custkey",
        (F.col("o_orderpriority") == "1-URGENT").cast("long").alias("t"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("yc"),
    )
    seg = (
        orders.join(cust, orders["o_custkey"] == cust["c_custkey"])
        .groupBy("seg")
        .agg(
            F.count("*").alias("n"),
            F.sum("t").alias("nt"),
            F.sum(F.col("t") * F.col("yc")).alias("yt"),
            F.sum((1 - F.col("t")) * F.col("yc")).alias("ycn"),
        )
    )
    nd = F.col("n").cast("double")
    mu_t = F.col("yt").cast("double") / F.nullif(F.col("nt").cast("double"), F.lit(0.0))
    mu_c = F.col("ycn").cast("double") / F.nullif(
        (F.col("n") - F.col("nt")).cast("double"), F.lit(0.0)
    )
    contrib_u = F.round((mu_t - mu_c) * nd / F.lit(100.0) * F.lit(1e6)).cast(
        "long"
    )
    per_seg = seg.select(
        "seg",
        "n",
        "nt",
        "yt",
        "ycn",
        F.round(mu_t / F.lit(100.0), 6).alias("mu_treated_r"),
        F.round(mu_c / F.lit(100.0), 6).alias("mu_control_r"),
        contrib_u.alias("contrib_u"),
    )
    tot = per_seg.agg(
        F.sum(
            F.when(F.col("contrib_u").isNotNull(), F.col("n"))
        ).alias("n_all"),
        F.sum("contrib_u").alias("c_all"),
    )
    return per_seg.crossJoin(F.broadcast(tot)).select(
        "seg",
        "n",
        "nt",
        "yt",
        "ycn",
        "mu_treated_r",
        "mu_control_r",
        (F.col("contrib_u").cast("double") / F.lit(1e6)).alias("contrib_r"),
        (
            F.col("c_all").cast("double")
            / F.lit(1e6)
            / F.col("n_all").cast("double")
        ).alias("ate_ipw"),
    )


Q270_SQL = """
WITH o AS (SELECT o_custkey,
                  CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS t,
                  CAST(round(o_totalprice * 100) AS BIGINT) AS yc
           FROM orders),
s AS (SELECT c_mktsegment AS seg,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(t) AS BIGINT) AS nt,
             CAST(sum(t * yc) AS BIGINT) AS yt,
             CAST(sum((1 - t) * yc) AS BIGINT) AS ycn
      FROM o JOIN customer ON o_custkey = c_custkey GROUP BY 1),
p AS (SELECT seg, n, nt, yt, ycn,
             round(CAST(yt AS DOUBLE) / nullif(CAST(nt AS DOUBLE), 0.0)
                   / 100.0, 6) AS mu_treated_r,
             round(CAST(ycn AS DOUBLE) / nullif(CAST(n - nt AS DOUBLE), 0.0)
                   / 100.0, 6) AS mu_control_r,
             CAST(round((CAST(yt AS DOUBLE) / nullif(CAST(nt AS DOUBLE), 0.0)
                         - CAST(ycn AS DOUBLE)
                           / nullif(CAST(n - nt AS DOUBLE), 0.0))
                        * CAST(n AS DOUBLE) / 100.0 * 1e6) AS BIGINT)
               AS contrib_u
      FROM s),
t AS (SELECT sum(n) FILTER (WHERE contrib_u IS NOT NULL) AS n_all,
             CAST(sum(contrib_u) AS BIGINT) AS c_all FROM p)
SELECT seg, n, nt, yt, ycn, mu_treated_r, mu_control_r,
       CAST(contrib_u AS DOUBLE) / 1e6 AS contrib_r,
       CAST((SELECT c_all FROM t) AS DOUBLE) / 1e6
         / CAST((SELECT n_all FROM t) AS DOUBLE) AS ate_ipw
FROM p
"""


QUERIES = {
    "q89_grouped_regression": q89_grouped_regression,
    "q227_calibration": q227_calibration,
    "q242_conformal": q242_conformal,
    "q204_loo_target_encoding": q204_loo_target_encoding,
    "q217_best_split": q217_best_split,
    "q90_pit_features": q90_pit_features,
    "q106_copurchase_lift": q106_copurchase_lift,
    "q223_frequent_triples": q223_frequent_triples,
    "q132_decile_lift": q132_decile_lift,
    "q133_auc_ranksum": q133_auc_ranksum,
    "q174_purged_tscv": q174_purged_tscv,
    "q254_cochran_armitage": q254_cochran_armitage,
    "q270_ipw_effect": q270_ipw_effect,
}

ORACLES = {
    "q89_grouped_regression": Q89_SQL,
    "q227_calibration": Q227_SQL,
    "q242_conformal": Q242_SQL,
    "q204_loo_target_encoding": Q204_SQL,
    "q217_best_split": Q217_SQL,
    "q90_pit_features": Q90_SQL,
    "q106_copurchase_lift": Q106_SQL,
    "q223_frequent_triples": Q223_SQL,
    "q132_decile_lift": Q132_SQL,
    "q133_auc_ranksum": Q133_SQL,
    "q174_purged_tscv": Q174_SQL,
    "q254_cochran_armitage": Q254_SQL,
    "q270_ipw_effect": Q270_SQL,
}
