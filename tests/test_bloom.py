"""Bloom prefilter: zero false negatives, bounded false positives,
and exactness of the composite prefilter+refine semi-join."""

from __future__ import annotations

from pyspark.sql import functions as F

from binance_data_ingestor_spark.operators.bloom import (
    bloom_parameters,
    bloom_prefilter_semi_join,
    build_bloom,
    might_contain,
)


def test_bloom_parameters_sizing():
    m, k = bloom_parameters(1000, 0.01)
    assert m % 8 == 0
    assert 9 * 1000 <= m <= 11 * 1000  # ~9.6 bits/key at 1% fpp
    assert 5 <= k <= 9                 # ~6.6 optimal


def test_no_false_negatives_and_bounded_fpr(spark):
    members = spark.range(0, 2000).select(
        F.concat(F.lit("key_"), F.col("id")).alias("s")
    )
    m, k = bloom_parameters(2000, 0.01)
    bloom = build_bloom(members, "s", m, k)

    false_neg = members.filter(~might_contain(bloom, F.col("s"), k)).count()
    assert false_neg == 0  # structural guarantee, not probabilistic

    outsiders = spark.range(0, 10_000).select(
        F.concat(F.lit("other_"), F.col("id")).alias("s")
    )
    fp = outsiders.filter(might_contain(bloom, F.col("s"), k)).count()
    assert fp / 10_000 < 0.05  # target 1%; generous determinism margin


def test_semi_join_composite_is_exact(spark):
    big = spark.range(0, 5000).select(
        F.concat(F.lit("k"), (F.col("id") % 700)).alias("key"),
        F.col("id").alias("payload"),
    )
    small = spark.range(0, 300).select(
        F.concat(F.lit("k"), (F.col("id") * 3)).alias("key")
    )
    exact = big.join(small.distinct(), "key", "left_semi")
    got = bloom_prefilter_semi_join(big, small, on="key", fpp=0.01)
    a = sorted((r.key, r.payload) for r in exact.collect())
    b = sorted((r.key, r.payload) for r in got.collect())
    assert a == b and a  # equal and non-empty
