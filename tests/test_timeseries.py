"""Gap-fill + LOCF semantics (operators/timeseries.py)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from binance_data_ingestor_spark.operators.timeseries import gap_fill_locf


def _ts(h, m=0, s=0):
    return dt.datetime(2024, 1, 1, h, m, s)


def _run(spark, rows, step="1 hour"):
    df = spark.createDataFrame(rows, "k string, eid long, ts timestamp, v double")
    out = gap_fill_locf(df, key="k", ts="ts", value="v", step=step, tie_break="eid")
    return {(r.k, r.grid_ts): r.locf_value for r in out.collect()}


def test_gaps_carry_forward(spark):
    got = _run(spark, [("a", 1, _ts(0, 30), 1.0), ("a", 2, _ts(3, 10), 2.0)])
    # grid spans hour-truncated min..max = 00:00..03:00
    assert got == {
        ("a", _ts(0)): None,   # before first observation
        ("a", _ts(1)): 1.0,
        ("a", _ts(2)): 1.0,
        ("a", _ts(3)): 1.0,    # 03:00 precedes the 03:10 observation
    }


def test_observation_on_grid_point_is_inclusive(spark):
    got = _run(spark, [("a", 1, _ts(1, 0), 5.0), ("a", 2, _ts(2, 0), 7.0)])
    assert got[("a", _ts(1))] == 5.0
    assert got[("a", _ts(2))] == 7.0


def test_exact_ts_collision_tie_breaks_on_id(spark):
    got = _run(
        spark,
        [("a", 2, _ts(1), 9.0), ("a", 1, _ts(1), 3.0), ("a", 3, _ts(2), 4.0)],
    )
    assert got[("a", _ts(1))] == 9.0  # max eid wins


def test_keys_fill_independently_over_global_span(spark):
    got = _run(
        spark,
        [("a", 1, _ts(0, 5), 1.0), ("b", 2, _ts(2, 5), 8.0)],
    )
    # both keys get the full 00:00..02:00 grid; b is null until 02:00…
    assert got[("b", _ts(0))] is None
    assert got[("b", _ts(1))] is None
    assert got[("b", _ts(2))] is None  # 02:00 < 02:05 observation
    assert got[("a", _ts(1))] == 1.0
    assert got[("a", _ts(2))] == 1.0
    assert len(got) == 6


def test_single_window_shuffle(spark):
    df = spark.createDataFrame(
        [("a", 1, _ts(0), 1.0)], "k string, eid long, ts timestamp, v double"
    )
    plan = (
        gap_fill_locf(df, key="k", ts="ts", value="v", tie_break="eid")
        ._jdf.queryExecution().executedPlan().toString()
    )
    # exactly one Window (one sort) over the union; the 1-row span agg
    # broadcasts to the grid generator — no shuffle join anywhere
    assert plan.count("Window") == 1
    assert plan.count("+- Sort") == 1
    assert "BroadcastExchange" in plan or "BroadcastQueryStage" in plan
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan
