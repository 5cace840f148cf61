"""salted_join (operators/skew.py): result parity with a plain join and
the plan property the salt exists for — the join key is (key, salt) so
a hot key's rows hash across many shuffle partitions."""

import pytest

from pyspark.sql import functions as F

from binance_data_ingestor_spark.operators.skew import salted_join

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def skewed(spark):
    # 2000 rows for one hot key, a handful elsewhere — the shape where
    # an unsalted join puts 99% of the work in one shuffle partition
    facts = spark.range(2000).select(
        F.lit(7).alias("k"), F.col("id").alias("payload")
    ).union(
        spark.range(50).select(
            (F.col("id") % 5).alias("k"), (F.col("id") + 10_000).alias("payload")
        )
    )
    dims = spark.createDataFrame(
        [(i, f"dim_{i}") for i in range(10)], "k long, label string"
    )
    return facts, dims


def _as_set(df):
    return set(map(tuple, df.collect()))


def test_inner_matches_plain(spark, skewed):
    facts, dims = skewed
    got = salted_join(facts, dims, "k", salt_buckets=4)
    want = facts.join(dims, "k")
    assert _as_set(got.select("k", "payload", "label")) == _as_set(
        want.select("k", "payload", "label")
    )


def test_left_matches_plain(spark, skewed):
    facts, dims = skewed
    missing = dims.filter(F.col("k") < 3)  # some fact keys unmatched
    got = salted_join(facts, missing, "k", how="left")
    want = facts.join(missing, "k", "left")
    assert _as_set(got.select("k", "payload", "label")) == _as_set(
        want.select("k", "payload", "label")
    )


def test_left_anti_matches_plain(spark, skewed):
    facts, dims = skewed
    some = dims.filter(F.col("k") >= 5)
    got = salted_join(facts, some, "k", how="left_anti")
    want = facts.join(some, "k", "left_anti")
    assert _as_set(got) == _as_set(want)


def test_hot_key_spreads_over_buckets(spark, skewed):
    facts, dims = skewed
    salted = facts.withColumn(
        "__salt", F.pmod(F.xxhash64("payload"), F.lit(4)).cast("int")
    )
    per_bucket = (
        salted.filter(F.col("k") == 7).groupBy("__salt").count().collect()
    )
    # all 4 buckets used, none holding more than ~half the hot rows
    assert len(per_bucket) == 4
    assert max(r["count"] for r in per_bucket) < 1200


def test_real_tables_parity(spark):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
        "o_orderkey", "o_orderstatus"
    ).withColumnRenamed("o_orderkey", "l_orderkey")
    got = salted_join(li, orders, "l_orderkey", salt_buckets=8)
    want = li.join(orders, "l_orderkey")
    assert got.count() == want.count()
    g = _as_set(got.groupBy("o_orderstatus").agg(F.sum("l_quantity")))
    w = _as_set(want.groupBy("o_orderstatus").agg(F.sum("l_quantity")))
    assert g == w


def test_rejects_right_join(spark, skewed):
    facts, dims = skewed
    with pytest.raises(ValueError):
        salted_join(facts, dims, "k", how="right")
