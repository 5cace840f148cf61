"""Heavy-hitters operator (operators/frequent.py): Misra-Gries
candidates + exact recount equals the naive exact computation."""

from __future__ import annotations

import random
from collections import Counter

from pyspark.sql import functions as F

from binance_data_ingestor_spark.operators.frequent import heavy_hitters, mg_candidates


def _exact(items, min_share):
    c = Counter(items)
    tot = len(items)
    return {k: v for k, v in c.items() if v >= tot * min_share}


def test_matches_exact_on_skewed_stream(spark):
    rng = random.Random(42)
    # zipf-ish: a few hot items, a long tail of near-uniques
    items = (
        ["hot1"] * 500 + ["hot2"] * 300 + ["warm"] * 80
        + [f"tail{i}" for i in range(1000)]
    )
    rng.shuffle(items)
    df = spark.createDataFrame([(x,) for x in items], "token string").repartition(7)
    got = {r.token: r.cnt for r in heavy_hitters(df, "token", 0.05).collect()}
    assert got == _exact(items, 0.05)


def test_threshold_boundary_inclusive(spark):
    items = ["a"] * 10 + ["b"] * 5 + ["c"] * 5  # tot=20, share 0.25 ⇒ a, b, c
    df = spark.createDataFrame([(x,) for x in items], "token string").repartition(3)
    got = {r.token for r in heavy_hitters(df, "token", 0.25).collect()}
    assert got == {"a", "b", "c"}


def test_candidates_bounded_and_superset(spark):
    # capacity 4 across a 2000-item tail: summary stays tiny but always
    # contains the true heavy hitter
    items = ["big"] * 400 + [f"t{i}" for i in range(2000)]
    random.Random(7).shuffle(items)
    df = spark.createDataFrame([(x,) for x in items], "token string").repartition(5)
    cands = [r.token for r in mg_candidates(df, "token", 4).collect()]
    assert len(cands) <= 5 * 4
    assert "big" in cands


def test_no_raw_vocabulary_shuffle(spark):
    df = spark.createDataFrame([("a",)], "token string")
    plan = (
        heavy_hitters(df, "token", 0.1)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # candidates and the 1-row total broadcast; MG summaries run in-place
    assert plan.count("BroadcastExchange") >= 2
    assert "MapInPandas" in plan
