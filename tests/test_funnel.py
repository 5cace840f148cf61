"""Funnel sequence-matching semantics (operators/funnel.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from binance_data_ingestor_spark.operators.funnel import funnel_steps


def _run(spark, rows):
    df = spark.createDataFrame(rows, "user string, eid long, ts long, et string")
    out = funnel_steps(
        df,
        key="user",
        ts="ts",
        steps=[
            ("a", F.col("et") == "A"),
            ("b", F.col("et") == "B"),
            ("c", F.col("et") == "C"),
        ],
        tie_break="eid",
    )
    return {r.user: r for r in out.collect()}


def test_full_funnel_in_order(spark):
    r = _run(spark, [("u", 1, 10, "A"), ("u", 2, 20, "B"), ("u", 3, 30, "C")])["u"]
    assert (r.a_ts, r.b_ts, r.c_ts, r.stage) == (10, 20, 30, 3)


def test_out_of_order_steps_dont_count(spark):
    # B before any A: no valid click step, so C can't complete either
    r = _run(spark, [("u", 1, 10, "B"), ("u", 2, 20, "A"), ("u", 3, 30, "C")])["u"]
    assert (r.a_ts, r.b_ts, r.c_ts, r.stage) == (20, None, None, 1)


def test_earliest_valid_occurrence_wins(spark):
    # two Bs after A — earliest counts; a pre-A B is ignored
    r = _run(
        spark,
        [("u", 1, 5, "B"), ("u", 2, 10, "A"), ("u", 3, 15, "B"), ("u", 4, 20, "B")],
    )["u"]
    assert (r.a_ts, r.b_ts, r.stage) == (10, 15, 2)


def test_same_timestamp_counts_at_or_after(spark):
    # B at the same ts as A, later tie-break id ⇒ counts
    r = _run(spark, [("u", 1, 10, "A"), ("u", 2, 10, "B")])["u"]
    assert (r.a_ts, r.b_ts, r.stage) == (10, 10, 2)
    # reversed tie-break order ⇒ B precedes A in the sort, doesn't count
    r2 = _run(spark, [("u", 2, 10, "A"), ("u", 1, 10, "B")])["u"]
    assert (r2.a_ts, r2.b_ts, r2.stage) == (10, None, 1)


def test_no_steps_completed(spark):
    r = _run(spark, [("u", 1, 10, "X"), ("u", 2, 20, "C")])["u"]
    assert (r.a_ts, r.b_ts, r.c_ts, r.stage) == (None, None, None, 0)


def test_keys_are_independent(spark):
    out = _run(
        spark,
        [("u1", 1, 10, "A"), ("u2", 2, 20, "B"), ("u2", 3, 30, "A")],
    )
    assert out["u1"].stage == 1
    assert (out["u2"].a_ts, out["u2"].b_ts, out["u2"].stage) == (30, None, 1)


def test_single_shuffle_single_sort(spark):
    df = spark.createDataFrame(
        [("u", 1, 10, "A")], "user string, eid long, ts long, et string"
    )
    plan = funnel_steps(
        df,
        key="user",
        ts="ts",
        steps=[("a", F.col("et") == "A"), ("b", F.col("et") == "B")],
        tie_break="eid",
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1
    assert plan.count("Sort ") <= 1 or plan.count("+- Sort") == 1
