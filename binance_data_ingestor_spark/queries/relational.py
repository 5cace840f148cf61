"""Core relational operator surface over the TPC-H-ish tables.

Covers SURVEY.md §2.2 (projection/filter/predicates/scalar fns),
§2.3 (top-k/limit), §2.4 A4 (groupBy/distinct/rollup), §2.5 (joins,
set ops).  The reference's declarative algebra is `filter on a
discriminator + nested projection + limit` (SURVEY §3.3); everything
here is that algebra generalized to the full relational surface Spark
gives us for free.

Scale notes per query are inline.  Conventions for the DuckDB oracle:
every computed column is aliased identically on both sides, and every
floating aggregate is rounded on both sides so double summation-order
differences between engines don't break the value hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from .util import load


# --------------------------------------------------------------------------
# q01 — flagship: TPC-H Q1 pricing summary (scan → filter → hash agg).
# Scale: predicate + column pruning push into the parquet scan; the groupBy
# has 6 groups so the shuffle after partial (map-side) aggregation is tiny.
# --------------------------------------------------------------------------
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


Q01_SQL = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2)                                        AS sum_qty,
       round(sum(l_extendedprice), 2)                                   AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
       round(avg(l_quantity), 6)                                        AS avg_qty,
       round(avg(l_extendedprice), 6)                                   AS avg_price,
       round(avg(l_discount), 6)                                        AS avg_disc,
       count(*)                                                         AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


# --------------------------------------------------------------------------
# q02 — shipping priority (TPC-H Q3 shape): 3-way join → agg → top-10.
# Scale: customer is 1/10 the size of orders → Catalyst broadcasts it
# (explicit hint); orders⨝lineitem is the big shuffle join on l_orderkey.
# Top-10 via orderBy+limit: Spark's TakeOrderedAndProject avoids a global
# sort — each partition keeps 10 rows, driver merges.
# --------------------------------------------------------------------------
def q02_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp")
    )
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        # no broadcast hint on customer: it scales with the data, so the
        # size threshold / AQE must make the call (it broadcasts at test
        # SFs, demotes to shuffle at 100 TB where it would not fit)
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


Q02_SQL = """
SELECT l_orderkey, o_orderdate, o_orderpriority,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND l_shipdate  > TIMESTAMP '1998-01-01'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


# --------------------------------------------------------------------------
# q03 — regional revenue (TPC-H Q5 shape): 5-way star join.
# Scale: region/nation/supplier/customer are dims → broadcast the whole dim
# chain; only orders⨝lineitem shuffles. Join order: filters first so the
# probe side is pre-pruned.
# --------------------------------------------------------------------------
def q03_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load(spark, sf_dir, "nation")
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem")
    dims = (
        cust.join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("c_custkey", "n_name")
    )
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        # dims contains customer (data-scaling): AQE decides, not a hint
        .join(dims, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
    )


Q03_SQL = """
SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
GROUP BY n_name
"""


# --------------------------------------------------------------------------
# q04 — top-k per group (SURVEY §2.3 L1/L2 generalized): top 3 orders by
# totalprice within each priority. Scale: row_number over a partitioned
# window is a single shuffle on the partition key; no global sort.
# --------------------------------------------------------------------------
def q04_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderpriority").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        orders.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("o_orderpriority", "o_orderkey", F.round("o_totalprice", 2).alias("total_price"), "rk")
    )


Q04_SQL = """
SELECT o_orderpriority, o_orderkey, round(o_totalprice, 2) AS total_price, rk
FROM (
  SELECT o_orderpriority, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
  FROM orders
)
WHERE rk <= 3
"""


# --------------------------------------------------------------------------
# q05 — pivot (wide aggregation). Oracle = conditional aggregation.
# --------------------------------------------------------------------------
def q05_pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    pivoted = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.round(F.sum("l_quantity"), 2))
    )
    return pivoted.select("l_returnflag", F.col("O").alias("qty_open"), F.col("F").alias("qty_filled"))


Q05_SQL = """
SELECT l_returnflag,
       round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2) AS qty_open,
       round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2) AS qty_filled
FROM lineitem
GROUP BY l_returnflag
"""


# --------------------------------------------------------------------------
# q06 — rollup (grouping sets): subtotals + grand total in one pass.
# --------------------------------------------------------------------------
def q06_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n_rows"), F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
    )


Q06_SQL = """
SELECT l_returnflag, l_linestatus, count(*) AS n_rows, round(sum(l_quantity), 2) AS sum_qty
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


# --------------------------------------------------------------------------
# q07 — semi/anti join (EXISTS / NOT EXISTS): customers with an urgent
# order but no low-priority order. Scale: both are broadcast-able probe
# builds on the small side; semi/anti never widen rows.
# --------------------------------------------------------------------------
def q07_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    low = orders.filter(F.col("o_orderpriority") == "5-LOW").select("o_custkey")
    return (
        cust.join(urgent, cust.c_custkey == urgent.o_custkey, "left_semi")
        .join(low, cust.c_custkey == low.o_custkey, "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
    )


Q07_SQL = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderpriority = '5-LOW')
"""


# --------------------------------------------------------------------------
# q08 — set ops (SURVEY §2.5 J2): INTERSECT / EXCEPT over key sets.
# --------------------------------------------------------------------------
def q08_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    high = orders.filter(F.col("o_orderpriority") == "2-HIGH").select("o_custkey")
    low = orders.filter(F.col("o_orderpriority") == "5-LOW").select("o_custkey")
    both = urgent.intersect(high)
    return both.exceptAll(both.intersect(low)).select(F.col("o_custkey").alias("custkey"))


Q08_SQL = """
SELECT o_custkey AS custkey FROM (
  (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
   INTERSECT
   SELECT o_custkey FROM orders WHERE o_orderpriority = '2-HIGH')
  EXCEPT
  (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
   INTERSECT
   SELECT o_custkey FROM orders WHERE o_orderpriority = '2-HIGH'
   INTERSECT
   SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW')
)
"""


# --------------------------------------------------------------------------
# q09 — distinct aggregation: exact distinct counts per group.
# --------------------------------------------------------------------------
def q09_distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("n_parts"),
            F.countDistinct("l_suppkey").alias("n_supps"),
            F.count("*").alias("n_rows"),
        )
    )


Q09_SQL = """
SELECT l_returnflag,
       count(DISTINCT l_partkey) AS n_parts,
       count(DISTINCT l_suppkey) AS n_supps,
       count(*)                  AS n_rows
FROM lineitem
GROUP BY l_returnflag
"""


# --------------------------------------------------------------------------
# q10 — broadcast dim enrichment + scalar functions (SURVEY §2.2 P6/P15):
# string normalization functions over a broadcast join.
# --------------------------------------------------------------------------
def q10_enrich_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part")
    li = load(spark, sf_dir, "lineitem")
    return (
        # part scales with the data — no forced broadcast (AQE decides)
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg(F.round(F.sum(F.col("l_quantity") * F.col("p_retailprice")), 2).alias("retail_value"))
        .select(
            F.upper("p_brand").alias("brand_upper"),
            F.concat(
                F.upper(F.substring(F.regexp_replace(F.lower("p_brand"), "#", " "), 1, 1)),
                F.substring(F.regexp_replace(F.lower("p_brand"), "#", " "), 2, 1_000_000),
            ).alias("brand_label"),
            "retail_value",
        )
    )


Q10_SQL = """
WITH agg AS (
  SELECT p_brand, round(sum(l_quantity * p_retailprice), 2) AS retail_value
  FROM lineitem JOIN part ON l_partkey = p_partkey
  GROUP BY p_brand
)
SELECT upper(p_brand) AS brand_upper,
       concat(upper(substr(replace(lower(p_brand), '#', ' '), 1, 1)),
              substr(replace(lower(p_brand), '#', ' '), 2)) AS brand_label,
       retail_value
FROM agg
"""


# --------------------------------------------------------------------------
# q11 — global sort + limit (SURVEY §2.3 L4): total order across the
# whole relation. Scale: Spark plans TakeOrderedAndProject — per-
# partition top-N then a single driver-side merge of N·partitions rows;
# no global sort materialization.
# --------------------------------------------------------------------------
def q11_global_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.select(
            "l_orderkey",
            "l_linenumber",
            F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 2).alias(
                "net_price"
            ),
        )
        .orderBy(F.desc("net_price"), F.asc("l_orderkey"), F.asc("l_linenumber"))
        .limit(25)
    )


Q11_SQL = """
SELECT l_orderkey, l_linenumber,
       round(l_extendedprice * (1 - l_discount), 2) AS net_price
FROM lineitem
ORDER BY net_price DESC, l_orderkey ASC, l_linenumber ASC
LIMIT 25
"""


# --------------------------------------------------------------------------
# q12 — exact percentiles (median/p90/p99) per group: percentile_cont
# with linear interpolation, the same definition DuckDB's quantile_cont
# uses. Scale: exact percentiles need the sorted group in one place —
# one shuffle on the group key; approx_percentile is the sketch-based
# alternative when that shuffle is too big.
# --------------------------------------------------------------------------
def q12_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("double")
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile_cont(0.5) WITHIN GROUP (ORDER BY l_quantity)"), 6).alias("p50"),
        F.round(F.expr("percentile_cont(0.9) WITHIN GROUP (ORDER BY l_quantity)"), 6).alias("p90"),
        F.round(F.expr("percentile_cont(0.99) WITHIN GROUP (ORDER BY l_quantity)"), 6).alias("p99"),
        F.round(F.avg(qty), 6).alias("mean_qty"),
    )


Q12_SQL = """
SELECT l_returnflag,
       round(quantile_cont(l_quantity, 0.5), 6)  AS p50,
       round(quantile_cont(l_quantity, 0.9), 6)  AS p90,
       round(quantile_cont(l_quantity, 0.99), 6) AS p99,
       round(avg(l_quantity), 6)                 AS mean_qty
FROM lineitem
GROUP BY l_returnflag
"""


# --------------------------------------------------------------------------
# q13 — CUBE over two dimensions (A4 grouping-sets family; rollup is
# q06). Scale: Spark expands grouping sets map-side (Expand operator),
# one shuffle for all 4 grouping combinations.
# --------------------------------------------------------------------------
def q13_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("n_rows"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
        .select(
            F.coalesce(F.col("l_returnflag"), F.lit("ALL")).alias("returnflag"),
            F.coalesce(F.col("l_linestatus"), F.lit("ALL")).alias("linestatus"),
            "n_rows",
            "sum_qty",
        )
    )


Q13_SQL = """
SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
       coalesce(l_linestatus, 'ALL') AS linestatus,
       count(*)                      AS n_rows,
       round(sum(l_quantity), 2)     AS sum_qty
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
"""


# --------------------------------------------------------------------------
# q14 — skew-resilient aggregation via salting: the two-phase
# (salted partial → final) rewrite of a groupBy whose key distribution
# is pathological. At 100 TB a single hot key would pin one reducer;
# salting spreads each key over SALT partial aggregates first. The
# result is byte-identical to the direct aggregation (the oracle is the
# UNsalted SQL — that IS the semantics being preserved).
# --------------------------------------------------------------------------
SALT = 16


def q14_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    salted = li.withColumn("__salt", F.pmod(F.xxhash64("l_orderkey"), F.lit(SALT)))
    partial = salted.groupBy("l_returnflag", "__salt").agg(
        F.count("*").alias("pn"),
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("prev"),
    )
    return (
        partial.groupBy("l_returnflag")
        .agg(
            F.sum("pn").alias("n_rows"),
            F.round(F.sum("prev"), 2).alias("revenue"),
        )
    )


Q14_SQL = """
SELECT l_returnflag, count(*) AS n_rows,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
GROUP BY l_returnflag
"""


# --------------------------------------------------------------------------
# q15 — local-supplier revenue (the full TPC-H Q5 shape, including the
# supplier co-location condition c_nationkey = s_nationkey that makes
# Q5 interesting): revenue from lineitems where the supplying supplier
# and ordering customer share a nation. Scale: supplier/customer/nation
# are broadcast dims; the only shuffle join is lineitem⨝orders on
# l_orderkey; the co-location predicate is applied as a post-broadcast
# filter, never a shuffle.
# --------------------------------------------------------------------------
def q15_local_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        # customer/supplier scale with the data — AQE decides; only the
        # bounded dim (nation, 25 rows) keeps a forced broadcast
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


Q15_SQL = """
SELECT n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*)                                          AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey  = c_custkey
JOIN supplier ON l_suppkey  = s_suppkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE c_nationkey = s_nationkey
GROUP BY n_name
"""


# --------------------------------------------------------------------------
# q16 — sketch aggregates with a checked accuracy contract. At 100 TB,
# COUNT(DISTINCT) and exact percentiles are shuffle-the-world
# operations; HyperLogLog (approx_count_distinct) and KLL/GK quantile
# sketches (approx_percentile) are the mergeable, map-side-combinable
# replacements. Raw sketch outputs aren't portable across engines, so
# the query emits the EXACT values plus pass/fail flags asserting the
# sketch landed inside its error bound — the oracle expects every flag
# to be 1, which makes sketch accuracy itself part of the correctness
# gate rather than an act of faith.
# --------------------------------------------------------------------------
def q16_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    # NEVER mix count_distinct with object-buffer aggregates (percentile
    # maps, HLL/KLL sketches) in one agg: the distinct rewrite keys the
    # partial phase on (group, distinct-col), so every distinct key
    # allocates its own copy of every sketch buffer — measured 15-40×
    # slower here, and an OOM at real scale. Two groupBys + a
    # groups-sized join is the correct plan.
    sketches = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey", 0.02).alias("__hll"),
        F.expr("percentile(l_extendedprice, 0.5)").alias("__p50_exact"),
        F.expr("approx_percentile(l_extendedprice, 0.5, 10000)").alias("__p50_sketch"),
    )
    exact = li.groupBy("l_returnflag").agg(
        F.count_distinct("l_orderkey").alias("n_distinct_exact")
    )
    g = sketches.join(exact, "l_returnflag")
    within = lambda a, b, tol: (F.abs(F.col(a) - F.col(b)) / F.col(b)) <= tol  # noqa: E731
    return g.select(
        "l_returnflag",
        "n_distinct_exact",
        F.when(within("__hll", "n_distinct_exact", 0.05), 1)
        .otherwise(0)
        .cast("long")
        .alias("hll_within_5pct"),
        F.when(within("__p50_sketch", "__p50_exact", 0.01), 1)
        .otherwise(0)
        .cast("long")
        .alias("p50_within_1pct"),
    )


Q16_SQL = """
SELECT l_returnflag,
       count(DISTINCT l_orderkey) AS n_distinct_exact,
       CAST(1 AS BIGINT)          AS hll_within_5pct,
       CAST(1 AS BIGINT)          AS p50_within_1pct
FROM lineitem GROUP BY l_returnflag
"""


# --------------------------------------------------------------------------
# q17 — correlated scalar subquery (TPC-H Q17 shape): revenue from
# small-quantity lineitems, "small" defined per part by a correlated
# average. Expressed in SQL on purpose: Catalyst's decorrelation
# (RewriteCorrelatedScalarSubquery) turns the per-row subquery into an
# aggregate + join — the rewrite a naive engine would execute as one
# subquery PER ROW. Scale: the decorrelated form is one extra
# aggregation over lineitem shuffled on partkey, joined back; the plan
# guard asserts no nested-loop anything survives.
# --------------------------------------------------------------------------
def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    # DataFrame substitution, not named temp views: query builders stay
    # side-effect-free on the shared session catalog
    return spark.sql(
        """
        SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
        FROM {li} JOIN {pt} ON p_partkey = l_partkey
        WHERE p_brand = 'Brand#13'
          AND l_quantity < (SELECT 0.5 * avg(l_quantity)
                            FROM {li} l2
                            WHERE l2.l_partkey = p_partkey)
        """,
        li=load(spark, sf_dir, "lineitem"),
        pt=load(spark, sf_dir, "part"),
    )


Q17_SQL = """
SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#13'
  AND l_quantity < (SELECT 0.5 * avg(l_quantity)
                    FROM lineitem l2
                    WHERE l2.l_partkey = p_partkey)
"""


# --------------------------------------------------------------------------
# q18 — group-HAVING semi-join (TPC-H Q18 shape): orders whose total
# quantity exceeds a threshold, with customer context. Scale: the
# HAVING aggregate runs lineitem-side first (map-side combinable) and
# its survivors — a tiny fraction — drive the joins; never join first
# and aggregate later.
# --------------------------------------------------------------------------
BIG_ORDER_QTY = 250


def q18_big_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
        .filter(F.col("sum_qty") > BIG_ORDER_QTY)
    )
    return (
        big.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("total_price"),
            "sum_qty",
        )
    )


Q18_SQL = f"""
SELECT c_custkey, c_name, o_orderkey,
       round(o_totalprice, 2) AS total_price, sum_qty
FROM (SELECT l_orderkey, round(sum(l_quantity), 2) AS sum_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING round(sum(l_quantity), 2) > {BIG_ORDER_QTY}) big
JOIN orders   ON o_orderkey = big.l_orderkey
JOIN customer ON c_custkey = o_custkey
"""


# --------------------------------------------------------------------------
# q19 — disjunctive multi-predicate join (TPC-H Q19 shape): revenue over
# an OR of conjunct bundles mixing both join sides. What it exercises:
# Catalyst must still run this as ONE equi-join on partkey with the
# disjunction as a post-join filter, push the side-local parts of each
# disjunct (brand/size, quantity) down to the scans as ORs, and not
# fall back to a nested loop. The common `p_size >= 1` conjunct is
# factored out and reaches the part scan as a pushed filter.
# --------------------------------------------------------------------------
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    joined = li.join(part, F.col("l_partkey") == F.col("p_partkey"))
    b1 = (
        (F.col("p_brand") == "Brand#12")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 20)
    )
    b2 = (
        (F.col("p_brand") == "Brand#23")
        & F.col("p_size").between(1, 25)
        & F.col("l_quantity").between(10, 30)
    )
    b3 = (
        (F.col("p_brand") == "Brand#34")
        & F.col("p_size").between(1, 35)
        & F.col("l_quantity").between(20, 40)
    )
    return joined.filter(b1 | b2 | b3).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "revenue"
        ),
        F.count("*").alias("n_items"),
    )


Q19_SQL = """
SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 30)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 40)
"""


# --------------------------------------------------------------------------
# q103 — 2-D skyline (Pareto frontier): parts no other part beats on
# BOTH price (lower better) and size (higher better). Computed by
# level compression, not a self-join: collapse to distinct price
# levels (groupBy → max size), running-max over strictly-cheaper
# levels (ROWS … 1 PRECEDING), join survivors back by price. The
# quadratic dominance EXISTS-check becomes one grouped aggregate + an
# exclusive running max over the level table + one keyed join. The
# running max goes through the bucket-offset two-pass form
# (with_global_runmax): price levels can approach |parts| distinct
# values, so a partition-less window over them would serialize — the
# two-pass form keeps only the 64-bucket summary on one task.
# --------------------------------------------------------------------------
def q103_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.partitioning import with_global_runmax, with_range_bucket

    part = load(spark, sf_dir, "part").select(
        "p_partkey", "p_retailprice", "p_size"
    )
    # one materialization of the level table: the range-bucket span agg,
    # the bucket summary, and the offset join all consume it
    lvl = (
        part.groupBy("p_retailprice")
        .agg(F.max("p_size").alias("msize"))
        .localCheckpoint(eager=False)
    )
    run = with_global_runmax(
        with_range_bucket(lvl, F.col("p_retailprice"), bucket_col="__rb"),
        [],
        [F.asc("p_retailprice")],
        "msize",
        bucket=F.col("__rb"),
        out_col="prev_max",
        exclusive=True,
    ).drop("__rb")
    return (
        part.join(run, "p_retailprice")
        .filter(
            (F.col("p_size") == F.col("msize"))
            & (F.col("prev_max").isNull() | (F.col("p_size") > F.col("prev_max")))
        )
        .select(
            "p_partkey",
            F.col("p_retailprice").alias("price"),
            F.col("p_size").alias("size"),
        )
    )


Q103_SQL = """
WITH lvl AS (SELECT p_retailprice, max(p_size) AS msize
             FROM part GROUP BY 1),
run AS (SELECT p_retailprice, msize,
               max(msize) OVER (ORDER BY p_retailprice
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND 1 PRECEDING) AS prev_max
        FROM lvl)
SELECT p_partkey, p_retailprice AS price, p_size AS size
FROM part JOIN run USING (p_retailprice)
WHERE p_size = msize AND (prev_max IS NULL OR p_size > prev_max)
"""


# --------------------------------------------------------------------------
# q109 — recursive CTE (Spark 4.x WITH RECURSIVE): walk each supplier
# up the synthetic binary hierarchy parent(k) = k DIV 2 down to root 1,
# accumulating depth and the account-balance sum along the ancestor
# chain. Exercises the engine's native recursive-query execution
# (iterative UNION ALL expansion with a working table — ~log2(N)
# rounds here, each one keyed join against the broadcast-able supplier
# dim). The DuckDB oracle runs the identical recursion (only the
# integer-division operator differs by dialect). Chain sums accumulate
# in a fixed order (leaf→root), so float results are bit-stable across
# engines before the final round.
# --------------------------------------------------------------------------
def _q109_sql(intdiv: str, view: str) -> str:
    return f"""
WITH RECURSIVE chain AS (
  SELECT s_suppkey AS suppkey, s_suppkey AS cur,
         s_acctbal AS bal, 1 AS depth
  FROM {view}
  UNION ALL
  SELECT c.suppkey, p.s_suppkey, c.bal + p.s_acctbal, c.depth + 1
  FROM chain c JOIN {view} p ON p.s_suppkey = {intdiv}
  WHERE c.cur > 1
)
SELECT suppkey, depth, round(bal, 2) AS anc_bal_r
FROM chain WHERE cur = 1
"""


def q109_recursive_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    # DataFrame substitution keeps the builder catalog-side-effect-free
    return spark.sql(
        _q109_sql("c.cur DIV 2", "{sup}"), sup=load(spark, sf_dir, "supplier")
    )


Q109_SQL = _q109_sql("c.cur // 2", "supplier")


# --------------------------------------------------------------------------
# q122 — TPC-H Q7 shape: bilateral shipping volume between two
# nations by ship year. Two independent dim chains hang off lineitem
# (supplier→nation and orders→customer→nation); both nation dims are
# fixed-size → broadcast, so the only big shuffles are
# lineitem⨝orders and the final (nation, nation, year) aggregate,
# which is groups-sized. The pair filter applies post-join on the two
# broadcast-joined nation names — Catalyst pushes each side's IN
# filter into its dim.
# --------------------------------------------------------------------------
_N1, _N2 = "NATION_1", "NATION_2"


def q122_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    n1 = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(supp, li["l_suppkey"] == supp["s_suppkey"])
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("cn_key"))
        .filter(
            ((F.col("supp_nation") == _N1) & (F.col("cust_nation") == _N2))
            | ((F.col("supp_nation") == _N2) & (F.col("cust_nation") == _N1))
        )
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


Q122_SQL = f"""
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       year(l_shipdate) AS l_year,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
WHERE (sn.n_name = '{_N1}' AND cn.n_name = '{_N2}')
   OR (sn.n_name = '{_N2}' AND cn.n_name = '{_N1}')
GROUP BY 1, 2, 3
"""


# --------------------------------------------------------------------------
# q123 — TPC-H Q8 shape: market share of one supplier nation inside
# one customer region for one part type, by order year. The share is
# a conditional-sum / total-sum ratio inside one aggregate (no second
# pass); the denominator is nullif-guarded on both engines (years
# where the filtered market is empty yield NULL, not an ANSI error —
# the q35 lesson institutionalized).
# --------------------------------------------------------------------------
_MKT_NATION, _MKT_REGION, _MKT_TYPE = "NATION_3", "EUROPE", "PROMO"


def q123_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    part = load(spark, sf_dir, "part").filter(F.col("p_type") == _MKT_TYPE)
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == _MKT_REGION)
    cust_dim = cust.join(
        F.broadcast(
            nation.join(
                F.broadcast(region),
                nation["n_regionkey"] == region["r_regionkey"],
            ).select("n_nationkey")
        ),
        F.col("c_nationkey") == F.col("n_nationkey"),
    ).select("c_custkey")
    supp_dim = supp.join(
        F.broadcast(nation.select("n_nationkey", "n_name")),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(part.select("p_partkey")), li["l_partkey"] == F.col("p_partkey"))
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust_dim, F.col("o_custkey") == cust_dim["c_custkey"])
        .join(supp_dim, li["l_suppkey"] == supp_dim["s_suppkey"])
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == _MKT_NATION, vol).otherwise(0.0))
                / F.nullif(F.sum(vol), F.lit(0.0)),
                6,
            ).alias("mkt_share_r")
        )
    )


Q123_SQL = f"""
SELECT year(o_orderdate) AS o_year,
       round(sum(CASE WHEN sn.n_name = '{_MKT_NATION}'
                      THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END)
             / nullif(sum(l_extendedprice * (1 - l_discount)), 0.0), 6)
         AS mkt_share_r
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
JOIN region   ON cn.n_regionkey = r_regionkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
WHERE p_type = '{_MKT_TYPE}' AND r_name = '{_MKT_REGION}'
GROUP BY 1
"""


# --------------------------------------------------------------------------
# q124 — TPC-H Q9 shape: product profit by supplier nation and year.
# (No partsupp table in this star schema — supply cost is proxied as
# 20% of p_retailprice, mirrored in the oracle.) Part/supplier/nation
# dims broadcast; profit terms are per-row expressions folded into one
# aggregate. Profit is emitted as integer cents (per-row round, then
# exact integer sum) — a straight double SUM rounds differently per
# accumulation order across engines at .005 boundaries (observed:
# …2.88 vs …2.87 at sf0.01).
# --------------------------------------------------------------------------
def q124_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").filter(F.col("p_name").like("%o%"))
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.col(
        "l_quantity"
    ) * (F.col("p_retailprice") * 0.2)
    return (
        li.join(
            F.broadcast(part.select("p_partkey", "p_retailprice")),
            li["l_partkey"] == F.col("p_partkey"),
        )
        .join(supp, li["l_suppkey"] == supp["s_suppkey"])
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(
            F.sum(F.round(profit * 100).cast("long")).alias("profit_cents")
        )
    )


Q124_SQL = """
SELECT n_name AS nation, year(o_orderdate) AS o_year,
       -- outer CAST: DuckDB sum(BIGINT) is HUGEINT → float64 in pandas,
       -- which hash-mismatches Spark's exact int64 on the driver
       CAST(sum(CAST(round((l_extendedprice * (1 - l_discount)
                            - l_quantity * (p_retailprice * 0.2)) * 100)
                     AS BIGINT)) AS BIGINT) AS profit_cents
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN orders   ON l_orderkey = o_orderkey
WHERE p_name LIKE '%o%'
GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# q125 — explicit GROUPING SETS (the A4 grouping family beyond
# rollup/cube): detail, one-dimension subtotal, and grand total in a
# single Expand + one shuffle. Subtotal rows are labeled via
# null-coalescing (portable across engines, no grouping_id dialect
# dependence — group columns are never null in the data, so NULL
# means "aggregated away").
# --------------------------------------------------------------------------
def q125_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    # DataFrame substitution keeps the builder catalog-side-effect-free
    return spark.sql(
        """
        SELECT coalesce(l_returnflag, 'ALL') AS ret_flag,
               coalesce(l_linestatus, 'ALL') AS line_status,
               count(*) AS n_rows,
               round(sum(l_quantity), 2) AS sum_qty
        FROM {li}
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                                (l_returnflag), ())
    """,
        li=load(spark, sf_dir, "lineitem"),
    )


Q125_SQL = """
SELECT coalesce(l_returnflag, 'ALL') AS ret_flag,
       coalesce(l_linestatus, 'ALL') AS line_status,
       count(*) AS n_rows,
       round(sum(l_quantity), 2) AS sum_qty
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
"""


# --------------------------------------------------------------------------
# q126 — distribution-analytic window battery: ntile quartile,
# percent_rank, cume_dist over order value within each priority.
# One Window node (same partition/order for all three); ntile's
# row-order dependence is made deterministic with the orderkey
# tie-break, percent_rank/cume_dist are tie-stable by definition.
# --------------------------------------------------------------------------
def q126_window_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return orders.select(
        "o_orderpriority",
        "o_orderkey",
        F.round("o_totalprice", 2).alias("total_price"),
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank_r"),
        F.round(F.cume_dist().over(w), 6).alias("cume_dist_r"),
    )


Q126_SQL = """
SELECT o_orderpriority, o_orderkey,
       round(o_totalprice, 2) AS total_price,
       ntile(4) OVER w AS quartile,
       round(percent_rank() OVER w, 6) AS pct_rank_r,
       round(cume_dist() OVER w, 6) AS cume_dist_r
FROM orders
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
"""


# --------------------------------------------------------------------------
# q127 — array / higher-order-function surface: per-order quantity
# vector (sorted on collect for determinism), folded with aggregate(),
# filtered with filter(), span from element access. HOF lambdas are
# interpreted (the known slow path) — correct here because each array
# is ≤13 elements; bulk math stays in the groupBy that builds the
# arrays. The sort fixes the fold order, so double sums are
# bit-identical across engines.
# --------------------------------------------------------------------------
def q127_array_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    per_order = li.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_list("l_quantity")).alias("qtys")
    )
    return per_order.select(
        "l_orderkey",
        F.size("qtys").alias("n_items"),
        F.round(
            F.aggregate("qtys", F.lit(0.0), lambda acc, x: acc + x), 2
        ).alias("qty_sum"),
        F.size(F.filter("qtys", lambda x: x > 25)).alias("n_large"),
        F.round(
            F.element_at("qtys", -1) - F.element_at("qtys", 1), 2
        ).alias("qty_span"),
    )


Q127_SQL = """
WITH per_order AS (
  SELECT l_orderkey, list_sort(list(l_quantity)) AS qtys
  FROM lineitem GROUP BY l_orderkey
)
SELECT l_orderkey,
       len(qtys) AS n_items,
       round(list_aggregate(qtys, 'sum'), 2) AS qty_sum,
       len(list_filter(qtys, x -> x > 25)) AS n_large,
       round(qtys[-1] - qtys[1], 2) AS qty_span
FROM per_order
"""



# --------------------------------------------------------------------------
# q142 — ABC (Pareto) classification of parts by revenue: rank parts
# by total revenue, compute each part's cumulative share of the grand
# total, and classify A (≤80%), B (≤95%), C (rest). Revenue is exact
# integer cents so the ranking key and the cumulative sums are
# order-deterministic on both engines. The running total uses the
# bucket-offset two-pass cumsum (partitioning.with_global_cumsum) over
# an equal-width revenue bucket — the parts dimension grows with the
# data (10^8 parts at 100 TB), so a `SUM OVER (ORDER BY …)` with no
# partition (one task holding every part) is not acceptable; the
# two-pass form is fully parallel with one tiny serialized prefix over
# the 64-row bucket summary. Grand total rides in as a broadcast
# 1-row aggregate.
# --------------------------------------------------------------------------
def q142_abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.partitioning import with_global_cumsum, with_range_bucket

    rev = (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_partkey")
        .agg(
            F.sum(
                F.round(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
                ).cast("long")
            ).alias("cents")
        )
        # span agg + bucket counts + data + grand total all read this
        # aggregate: materialize it once instead of 4 lineitem scans
        .localCheckpoint(eager=False)
    )
    # bucket monotone along (cents DESC): equal-width bucket of -cents
    b = with_range_bucket(rev, -F.col("cents"), bucket_col="__rb")
    cum = with_global_cumsum(
        b,
        [],
        [F.desc("cents"), F.asc("l_partkey")],
        "cents",
        bucket=F.col("__rb"),
        out_col="cum_cents",
    ).drop("__rb")
    # grand total: 1-row planning statistic as a literal (a broadcast
    # cross of the 1-row aggregate would add a BNLJ node to the plan)
    total = rev.agg(F.sum("cents")).collect()[0][0] or 0
    share = F.col("cum_cents") / F.lit(total)
    cls = (
        F.when(share <= 0.80, "A").when(share <= 0.95, "B").otherwise("C")
    )
    per_part = cum.select("l_partkey", "cents", cls.alias("abc_class"))
    return per_part.groupBy("abc_class").agg(
        F.count("*").alias("n_parts"),
        F.sum("cents").alias("cents_sum"),
    )


Q142_SQL = """
WITH rev AS (
  SELECT l_partkey,
         CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))
              AS BIGINT) AS cents
  FROM lineitem GROUP BY 1
),
ranked AS (
  SELECT l_partkey, cents,
         sum(cents) OVER (ORDER BY cents DESC, l_partkey
                          ROWS UNBOUNDED PRECEDING)
           / CAST(sum(cents) OVER () AS DOUBLE) AS cum_share
  FROM rev
)
SELECT CASE WHEN cum_share <= 0.80 THEN 'A'
            WHEN cum_share <= 0.95 THEN 'B' ELSE 'C' END AS abc_class,
       count(*) AS n_parts, CAST(sum(cents) AS BIGINT) AS cents_sum
FROM ranked GROUP BY 1
"""


# --------------------------------------------------------------------------
# q145 — TPC-H Q21 shape (suppliers who kept orders waiting): for
# finished orders served by >= 2 suppliers where EXACTLY ONE supplier
# shipped late, count that supplier's late lines.  "Late" is adapted to
# this schema (no commit/receipt dates): l_shipdate > o_orderdate + 90
# days.
#
# Spark side deliberately does NOT use the textbook correlated
# EXISTS / NOT EXISTS pair (two extra joins against the same fact): one
# per-order aggregate computes (distinct suppliers, distinct LATE
# suppliers) in a single shuffle, and late lines join that order
# profile — the profile is orders-sized, the whole query is two
# data-sized shuffles.  The ORACLE keeps the textbook
# EXISTS/NOT-EXISTS formulation, so the hash compare also proves the
# aggregate rewrite equivalent to the correlated-subquery semantics.
# --------------------------------------------------------------------------
_Q145_LATE_DAYS = 90


def q145_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    sup = load(spark, sf_dir, "supplier")
    l = li.join(
        orders, li.l_orderkey == orders.o_orderkey, "inner"
    ).select(
        "l_orderkey",
        "l_suppkey",
        (
            F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), _Q145_LATE_DAYS)
        ).alias("is_late"),
    )
    profile = l.groupBy("l_orderkey").agg(
        F.count_distinct("l_suppkey").alias("n_supp"),
        F.count_distinct(F.when(F.col("is_late"), F.col("l_suppkey"))).alias(
            "n_late_supp"
        ),
    )
    hits = (
        l.filter(F.col("is_late"))
        .join(
            profile.filter((F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1)),
            "l_orderkey",
        )
        .groupBy("l_suppkey")
        .agg(F.count("*").alias("numwait"))
    )
    return (
        hits.join(F.broadcast(sup), hits.l_suppkey == sup.s_suppkey)
        .select("s_name", "numwait")
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


Q145_SQL = f"""
SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
FROM supplier, lineitem l1, orders
WHERE s_suppkey = l1.l_suppkey
  AND o_orderkey = l1.l_orderkey
  AND o_orderstatus = 'F'
  AND l1.l_shipdate > o_orderdate + INTERVAL {_Q145_LATE_DAYS} DAY
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3 JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_shipdate > o3.o_orderdate + INTERVAL {_Q145_LATE_DAYS} DAY)
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 20
"""


# --------------------------------------------------------------------------
# q146 — TPC-H Q13 shape (customer order-count distribution): LEFT
# join customers to their non-urgent orders (zero-order customers must
# survive), count per customer, then histogram the counts.  Two
# aggregates, each with map-side partials; the left join is
# customer⨝orders on the natural key.  The o_orderpriority exclusion
# stands in for Q13's o_comment NOT LIKE filter (this schema has no
# comment column) — the point is the predicate belongs to the JOIN
# condition, not a WHERE (a WHERE would turn the left join inner and
# drop zero-order customers).
# --------------------------------------------------------------------------
def q146_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    per_cust = (
        cust.join(
            orders,
            (cust.c_custkey == orders.o_custkey)
            & (orders.o_orderpriority != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


Q146_SQL = """
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM (
  SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


# --------------------------------------------------------------------------
# q154 — top supplier by quarterly revenue (TPC-H Q15 shape): revenue
# per supplier over a 3-month ship window, then the supplier(s) at the
# GLOBAL MAX — the tie-safe "view + scalar subquery equality" pattern.
# The max comparison must be EXACT equality, so revenue accumulates as
# integer cents×(100-disc) units (a rounded double max would tie-break
# differently per engine): one parallel aggregate, a 1-row broadcast
# max, and a broadcast supplier dim join. Shuffle budget: 1.
# --------------------------------------------------------------------------
Q154_WINDOW = ("1996-01-01", "1996-04-01")


def q154_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    supp = load(spark, sf_dir, "supplier")
    lo, hi = Q154_WINDOW
    ext_c = F.round(F.col("l_extendedprice") * 100).cast("long")
    disc_c = F.round(F.col("l_discount") * 100).cast("long")
    rev = (
        li.filter(
            (F.col("l_shipdate") >= F.lit(lo).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(hi).cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(F.sum(ext_c * (100 - disc_c)).alias("rc"))
    )
    mx = rev.agg(F.max("rc").alias("mrc"))
    return (
        rev.join(F.broadcast(mx), F.col("rc") == F.col("mrc"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            (F.col("rc") / F.lit(10000.0)).alias("total_revenue"),
        )
    )


Q154_SQL = f"""
WITH rev AS (
  SELECT l_suppkey,
         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                  * (100 - CAST(round(l_discount * 100) AS BIGINT)))
              AS BIGINT) AS rc
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '{Q154_WINDOW[0]}'
    AND l_shipdate <  TIMESTAMP '{Q154_WINDOW[1]}'
  GROUP BY l_suppkey)
SELECT s_suppkey, s_name, rc / 10000.0 AS total_revenue
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE rc = (SELECT max(rc) FROM rev)
"""


# --------------------------------------------------------------------------
# q155 — dormant high-balance customers (TPC-H Q22 shape): customers
# whose balance exceeds the positive-balance average AND who placed no
# order since the cutoff, aggregated per nation. The above-average
# test is pure integer cross-multiplication (bal_cents·n > total_cents
# — no float average crosses an engine boundary); the "no recent
# order" test is an anti-join against the date-filtered orders scan.
# Shuffle budget: customer⨝orders anti-join + the nation aggregate.
# --------------------------------------------------------------------------
Q155_CUTOFF = "2000-01-01"


def q155_dormant_capital(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    bal_c = F.round(F.col("c_acctbal") * 100).cast("long")
    pos = cust.filter(F.col("c_acctbal") > 0).agg(
        F.sum(bal_c).alias("tot_c"), F.count("*").alias("n_pos")
    )
    rich = (
        cust.crossJoin(F.broadcast(pos))
        .filter(bal_c * F.col("n_pos") > F.col("tot_c"))
    )
    recent = orders.filter(
        F.col("o_orderdate") >= F.lit(Q155_CUTOFF).cast("timestamp")
    ).select("o_custkey")
    dormant = rich.join(
        recent, rich.c_custkey == recent.o_custkey, "left_anti"
    )
    return dormant.groupBy("c_nationkey").agg(
        F.count("*").alias("n_custs"),
        (F.sum(bal_c) / F.lit(100.0)).alias("total_acctbal"),
    )


Q155_SQL = f"""
WITH pos AS (
  SELECT CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS tot_c,
         CAST(count(*) AS BIGINT) AS n_pos
  FROM customer WHERE c_acctbal > 0),
rich AS (
  SELECT c_custkey, c_nationkey,
         CAST(round(c_acctbal * 100) AS BIGINT) AS bal_c
  FROM customer, pos
  WHERE CAST(round(c_acctbal * 100) AS BIGINT) * n_pos > tot_c),
dormant AS (
  SELECT * FROM rich r
  WHERE NOT EXISTS (SELECT 1 FROM orders o
                    WHERE o.o_custkey = r.c_custkey
                      AND o.o_orderdate >= TIMESTAMP '{Q155_CUTOFF}'))
SELECT c_nationkey,
       CAST(count(*) AS BIGINT) AS n_custs,
       CAST(sum(bal_c) AS BIGINT) / 100.0 AS total_acctbal
FROM dormant GROUP BY c_nationkey
"""


# --------------------------------------------------------------------------
# q163 — RFM customer segmentation: quintile scores for Recency (last
# order date), Frequency (order count) and Monetary (lifetime cents),
# aggregated into segment cells. Each quintile comes from the
# bucket-offset two-pass ntile (partitioning.with_global_ntile) with
# fully deterministic orderings (metric DESC, then custkey); monetary
# accumulates as exact cents. Customers grow with the data (10^8 at
# 100 TB), so the naive three unpartitioned ntile(5) windows — three
# single-task sorts of every customer — are replaced by three parallel
# rank passes whose only serialized step is a 64-row bucket-summary
# prefix each. Output: one row per (r,f,m) cell.
# --------------------------------------------------------------------------
def q163_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.partitioning import with_global_ntile, with_range_bucket

    orders = load(spark, sf_dir, "orders")
    # localCheckpoint: three rank passes each read the aggregate 3×
    # (span, bucket counts, data); materializing it once replaces nine
    # orders scans with one
    per_cust = orders.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("recency"),
        F.count("*").alias("frequency"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("cents"),
    ).localCheckpoint(eager=False)

    # each metric is ranked DESC → bucket on the negated metric
    def tile_map(metric, neg, out):
        proj = per_cust.select("o_custkey", metric)
        b = with_range_bucket(proj, neg, bucket_col="__rb")
        return with_global_ntile(
            b,
            [F.desc(metric), F.asc("o_custkey")],
            5,
            bucket=F.col("__rb"),
            tile_col=out,
        ).select("o_custkey", out)

    scored = (
        per_cust.select("o_custkey", "cents")
        .join(tile_map("recency", -F.unix_timestamp("recency"), "r_q"), "o_custkey")
        .join(tile_map("frequency", -F.col("frequency"), "f_q"), "o_custkey")
        .join(tile_map("cents", -F.col("cents"), "m_q"), "o_custkey")
    )
    return scored.groupBy("r_q", "f_q", "m_q").agg(
        F.count("*").alias("n_customers"),
        F.sum("cents").alias("segment_cents"),
    )


Q163_SQL = """
WITH per_cust AS (
  SELECT o_custkey,
         max(o_orderdate) AS recency,
         count(*) AS frequency,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS cents
  FROM orders GROUP BY o_custkey),
scored AS (
  SELECT o_custkey, cents,
         ntile(5) OVER (ORDER BY recency DESC, o_custkey ASC) AS r_q,
         ntile(5) OVER (ORDER BY frequency DESC, o_custkey ASC) AS f_q,
         ntile(5) OVER (ORDER BY cents DESC, o_custkey ASC) AS m_q
  FROM per_cust)
SELECT r_q, f_q, m_q,
       CAST(count(*) AS BIGINT) AS n_customers,
       CAST(sum(cents) AS BIGINT) AS segment_cents
FROM scored GROUP BY r_q, f_q, m_q
"""


# --------------------------------------------------------------------------
# q184 — salted fact⨝dim join under a hot key (operators/skew.salted_join
# certified through the oracle gate): lineitem⨝orders on orderkey with
# the large side scattered across 8 salt buckets and the dim replicated
# into each, then revenue by order priority. The salt changes ONLY the
# shuffle layout — the oracle runs the plain join, so the hash compare
# proves salting result-invariant (inner-join semantics survive because
# the large side keeps exactly one copy of each row). This is the
# pathological-skew answer AQE's post-shuffle split can't reach: one
# key too hot for a single map task's output. Cost: dim replicated 8×;
# revenue accumulates as exact integer cents so the group sums are
# order-independent.
# --------------------------------------------------------------------------
def q184_salted_hot_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.skew import salted_join

    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        F.round(
            F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
        ).cast("long").alias("rev_c"),
    )
    orders = load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    joined = salted_join(li, orders, "l_orderkey", salt_buckets=8)
    return joined.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_lines"),
        F.sum("rev_c").alias("revenue_cents"),
    )


Q184_SQL = """
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_lines,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))
            AS BIGINT) AS revenue_cents
FROM lineitem JOIN orders ON o_orderkey = l_orderkey
GROUP BY 1
"""


QUERIES = {
    "q184_salted_hot_join": q184_salted_hot_join,
    "q01_pricing_summary": q01_pricing_summary,
    "q02_shipping_priority": q02_shipping_priority,
    "q03_regional_revenue": q03_regional_revenue,
    "q04_topk_per_group": q04_topk_per_group,
    "q05_pivot_status": q05_pivot_status,
    "q06_rollup": q06_rollup,
    "q07_semi_anti": q07_semi_anti,
    "q08_set_ops": q08_set_ops,
    "q09_distinct_agg": q09_distinct_agg,
    "q10_enrich_scalar": q10_enrich_scalar,
    "q11_global_topk": q11_global_topk,
    "q12_percentiles": q12_percentiles,
    "q13_cube": q13_cube,
    "q14_salted_agg": q14_salted_agg,
    "q15_local_supplier_revenue": q15_local_supplier_revenue,
    "q16_approx_distinct": q16_approx_distinct,
    "q17_small_qty_revenue": q17_small_qty_revenue,
    "q18_big_orders": q18_big_orders,
    "q19_disjunctive_revenue": q19_disjunctive_revenue,
    "q103_skyline": q103_skyline,
    "q109_recursive_hierarchy": q109_recursive_hierarchy,
    "q122_nation_volume": q122_nation_volume,
    "q123_market_share": q123_market_share,
    "q124_product_profit": q124_product_profit,
    "q125_grouping_sets": q125_grouping_sets,
    "q126_window_analytics": q126_window_analytics,
    "q127_array_hof": q127_array_hof,
    "q142_abc_classification": q142_abc_classification,
    "q145_waiting_suppliers": q145_waiting_suppliers,
    "q146_order_count_distribution": q146_order_count_distribution,
    "q154_top_supplier": q154_top_supplier,
    "q155_dormant_capital": q155_dormant_capital,
    "q163_rfm_segments": q163_rfm_segments,
}

ORACLES = {
    "q184_salted_hot_join": Q184_SQL,
    "q01_pricing_summary": Q01_SQL,
    "q02_shipping_priority": Q02_SQL,
    "q03_regional_revenue": Q03_SQL,
    "q04_topk_per_group": Q04_SQL,
    "q05_pivot_status": Q05_SQL,
    "q06_rollup": Q06_SQL,
    "q07_semi_anti": Q07_SQL,
    "q08_set_ops": Q08_SQL,
    "q09_distinct_agg": Q09_SQL,
    "q10_enrich_scalar": Q10_SQL,
    "q11_global_topk": Q11_SQL,
    "q12_percentiles": Q12_SQL,
    "q13_cube": Q13_SQL,
    "q14_salted_agg": Q14_SQL,
    "q15_local_supplier_revenue": Q15_SQL,
    "q16_approx_distinct": Q16_SQL,
    "q17_small_qty_revenue": Q17_SQL,
    "q18_big_orders": Q18_SQL,
    "q19_disjunctive_revenue": Q19_SQL,
    "q103_skyline": Q103_SQL,
    "q109_recursive_hierarchy": Q109_SQL,
    "q122_nation_volume": Q122_SQL,
    "q123_market_share": Q123_SQL,
    "q124_product_profit": Q124_SQL,
    "q125_grouping_sets": Q125_SQL,
    "q126_window_analytics": Q126_SQL,
    "q127_array_hof": Q127_SQL,
    "q142_abc_classification": Q142_SQL,
    "q145_waiting_suppliers": Q145_SQL,
    "q146_order_count_distribution": Q146_SQL,
    "q154_top_supplier": Q154_SQL,
    "q155_dormant_capital": Q155_SQL,
    "q163_rfm_segments": Q163_SQL,
}
