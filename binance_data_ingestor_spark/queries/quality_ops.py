"""Data-quality audit + embedding statistics.

q91 runs a rule suite (FK integrity, nulls, ranges, consistency,
duplicates) and reports violations per rule — the "expectations"
gate a lake pipeline runs before promoting a snapshot. Every rule is
an aggregate or anti-join the optimizer can push down; the output is
one row per rule regardless of table size.

q92 computes the upper-triangle covariance of the first 8 embedding
dimensions in ONE pass (64 covar_pop aggregates over a single scan) —
the sufficient statistic for PCA; `operators/similarity.pca_project`
consumes it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .util import load


# --------------------------------------------------------------------------
# q91 — constraint audit. Anti-join FK checks broadcast the PK side's
# keys when small (AQE decides); each rule collapses to a 1-row count,
# so the union output is rules × 1 rows. Rules are named so the gate
# can diff runs.
# --------------------------------------------------------------------------
def q91_constraint_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    li = load(spark, sf_dir, "lineitem")
    ev = load(spark, sf_dir, "events")
    docs = load(spark, sf_dir, "documents")

    def rule(name: str, df: DataFrame) -> DataFrame:
        return df.agg(
            F.lit(name).alias("rule"), F.count("*").alias("n_violations")
        )

    checks = [
        rule(
            "orders_fk_customer",
            orders.join(cust, orders.o_custkey == cust.c_custkey, "left_anti"),
        ),
        rule(
            "lineitem_fk_orders",
            li.join(orders, li.l_orderkey == orders.o_orderkey, "left_anti"),
        ),
        rule("events_null_user", ev.filter(F.col("user_id").isNull())),
        rule("events_negative_value", ev.filter(F.col("value") < 0)),
        rule(
            "documents_nchars_mismatch",
            docs.filter(F.col("n_chars") != F.length("text")),
        ),
        rule(
            "documents_duplicate_text",
            docs.groupBy(F.md5("text")).agg(F.count("*").alias("c")).filter(
                F.col("c") > 1
            ),
        ),
    ]
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out


Q91_SQL = """
SELECT 'orders_fk_customer' AS rule, count(*) AS n_violations
FROM orders ANTI JOIN customer ON o_custkey = c_custkey
UNION ALL
SELECT 'lineitem_fk_orders', count(*)
FROM lineitem ANTI JOIN orders ON l_orderkey = o_orderkey
UNION ALL
SELECT 'events_null_user', count(*) FROM events WHERE user_id IS NULL
UNION ALL
SELECT 'events_negative_value', count(*) FROM events WHERE value < 0
UNION ALL
SELECT 'documents_nchars_mismatch', count(*)
FROM documents WHERE n_chars <> length(text)
UNION ALL
SELECT 'documents_duplicate_text', count(*)
FROM (SELECT md5(text) AS h, count(*) AS c FROM documents
      GROUP BY md5(text) HAVING count(*) > 1)
"""


# --------------------------------------------------------------------------
# q92 — one-pass covariance of embedding dims 0..7 (upper triangle incl.
# diagonal): 36 covar_pop aggregates over one scan; the shuffle carries
# a single row of sufficient statistics.
# --------------------------------------------------------------------------
COV_DIMS = 8


def q92_embedding_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings").select(
        *[
            F.element_at("embedding", i + 1).cast("double").alias(f"d{i}")
            for i in range(COV_DIMS)
        ]
    )
    pairs = [(i, j) for i in range(COV_DIMS) for j in range(i, COV_DIMS)]
    row = emb.agg(
        *[
            F.round(F.covar_pop(f"d{i}", f"d{j}"), 6).alias(f"c_{i}_{j}")
            for i, j in pairs
        ]
    )
    return row.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("dim_i"),
                        F.lit(j).alias("dim_j"),
                        F.col(f"c_{i}_{j}").alias("cov_r"),
                    )
                    for i, j in pairs
                ]
            )
        ).alias("s")
    ).select("s.*")


Q92_SQL = "\nUNION ALL\n".join(
    f"SELECT {i} AS dim_i, {j} AS dim_j, "
    f"round(covar_pop(CAST(embedding[{i + 1}] AS DOUBLE), "
    f"CAST(embedding[{j + 1}] AS DOUBLE)), 6) AS cov_r FROM embeddings"
    for i in range(COV_DIMS)
    for j in range(i, COV_DIMS)
)


QUERIES = {
    "q91_constraint_audit": q91_constraint_audit,
    "q92_embedding_covariance": q92_embedding_covariance,
}

ORACLES = {
    "q91_constraint_audit": Q91_SQL,
    "q92_embedding_covariance": Q92_SQL,
}
