"""Bucketed-table co-located join (operators/partitioning.write_bucketed).

The plan property under test: two tables bucketed on the join key with
matching bucket counts must join with ZERO exchanges — the physical
plan contains the join and the scans, and nothing in between moves
data. This is the 100 TB pattern for any fact⨝fact join that recurs
across a workload: pay the shuffle once at write time.
"""

import pytest

from pyspark.sql import functions as F

from binance_data_ingestor_spark.operators.partitioning import write_bucketed

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    lineitem = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    write_bucketed(orders, "orders_b", ["o_orderkey"], 8, sort_cols=["o_orderkey"])
    write_bucketed(
        lineitem, "lineitem_b", ["l_orderkey"], 8, sort_cols=["l_orderkey"]
    )
    yield "orders_b", "lineitem_b"
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    ot, lt = bucketed_tables
    # disable auto-broadcast so the join can't cheat its way out of the
    # assertion at this tiny SF; at real scale both sides are too big to
    # broadcast and this conf is the ambient state
    with _no_broadcast(spark):
        joined = (
            spark.table(lt)
            .join(spark.table(ot), F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderstatus")
            .agg(F.sum("l_quantity").alias("qty"))
        )
        joined.collect()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        final = plan.split("== Initial Plan ==")[0]
        assert "SortMergeJoin" in final
        # the only exchange allowed is the one for the groupBy, never
        # below the join
        join_part = final.split("SortMergeJoin")[-1]
        assert "Exchange" not in join_part, join_part
        assert "SelectedBucketsCount" in final


def test_bucketed_join_matches_unbucketed(spark, bucketed_tables):
    ot, lt = bucketed_tables
    bucketed = (
        spark.table(lt)
        .join(spark.table(ot), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"))
    )
    plain = (
        spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        .join(
            spark.read.parquet(f"{SF_DIR}/orders.parquet"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"))
    )
    assert sorted(map(tuple, bucketed.collect())) == sorted(
        map(tuple, plain.collect())
    )


class _no_broadcast:
    def __init__(self, spark):
        self.spark = spark

    def __enter__(self):
        self.prev = self.spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        self.spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    def __exit__(self, *exc):
        self.spark.conf.set("spark.sql.autoBroadcastJoinThreshold", self.prev)
