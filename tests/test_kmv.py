"""KMV sketch operator (operators/kmv.py): hash portability, sketch
determinism under repartitioning, and estimator accuracy vs exact
distinct counts on synthetic key sets."""

from __future__ import annotations

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from binance_data_ingestor_spark.operators.kmv import (
    kmv_estimate_expr,
    kmv_sketch,
    u60,
    u60_sql,
)


def test_u60_matches_duckdb_and_python_reference(spark):
    """The Spark expression, the DuckDB expression, and a direct Python
    md5 fold all agree — the sketch is engine-portable by construction."""
    import hashlib

    keys = list(range(100))
    got_spark = {
        r.k: r.h
        for r in spark.createDataFrame([(k,) for k in keys], "k long")
        .select("k", u60("k").alias("h"))
        .collect()
    }
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"k": keys}))
    got_duck = dict(
        con.execute(f"SELECT k, {u60_sql('duckdb', 'k')} AS h FROM t").fetchall()
    )
    for k in keys:
        ref = int(hashlib.md5(str(k).encode()).hexdigest()[:15], 16)
        assert got_spark[k] == ref, k
        assert got_duck[k] == ref, k


def test_sketch_partition_invariant_and_sorted(spark):
    df = spark.createDataFrame([(i,) for i in range(5000)], "k long")
    a = [r.asDict() for r in kmv_sketch(df.repartition(1), "k", 64).collect()]
    b = [r.asDict() for r in kmv_sketch(df.repartition(13), "k", 64).collect()]
    assert a == b
    hs = [r["__h"] for r in a]
    assert hs == sorted(hs) and len(hs) == 64


def test_estimates_within_3_sigma(spark):
    """Distinct, union, intersection, and Jaccard estimates land inside
    the documented 3σ band on sets large relative to k."""
    k = 128
    a_keys = set(range(0, 6000))  # |A| = 6000
    b_keys = set(range(4000, 12000))  # |B| = 8000, |A∩B| = 2000
    rows = [(x, x in a_keys, x in b_keys) for x in a_keys | b_keys]
    df = spark.createDataFrame(rows, "k long, in_a boolean, in_b boolean")
    sk = kmv_sketch(df, "k", k)
    row = sk.agg(
        F.max("__h").alias("hu"),
        F.count_if(F.col("in_a") & F.col("in_b")).alias("x"),
    ).collect()[0]
    est_u_df = spark.range(1).select(
        kmv_estimate_expr(k, F.lit(row.hu)).alias("e")
    )
    est_u = est_u_df.collect()[0].e
    n_union = len(a_keys | b_keys)
    rse3 = 3.0 / (k - 2) ** 0.5
    assert abs(est_u - n_union) <= rse3 * n_union
    jacc = row.x / k
    true_j = len(a_keys & b_keys) / n_union
    # binomial noise on x: 3·sqrt(J(1-J)/k) absolute
    assert abs(jacc - true_j) <= 3.0 * (true_j * (1 - true_j) / k) ** 0.5
    est_i = jacc * est_u
    assert abs(est_i - len(a_keys & b_keys)) <= 0.4 * len(a_keys & b_keys)
