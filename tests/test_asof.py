"""as-of join semantics, incl. the equal-timestamp tie rule."""

from __future__ import annotations

from binance_data_ingestor_spark.operators.asof import asof_join


def test_asof_basic_and_ties(spark):
    left = spark.createDataFrame(
        [("u1", 10, "L1"), ("u1", 20, "L2"), ("u1", 5, "L0"), ("u2", 10, "M1")],
        "user string, t long, tag string",
    )
    right = spark.createDataFrame(
        [("u1", 8, 1.0), ("u1", 20, 2.0), ("u2", 30, 9.0)],
        "user string, t long, v double",
    )
    out = {
        r.tag: r.asof_v
        for r in asof_join(
            left, right, on="t", by="user", value_cols=["v"]
        ).collect()
    }
    assert out["L0"] is None        # nothing at or before t=5
    assert out["L1"] == 1.0         # latest at-or-before 10 is t=8
    assert out["L2"] == 2.0         # equal timestamp IS visible (>= rule)
    assert out["M1"] is None        # other group's rows don't leak


def test_asof_multiple_value_cols(spark):
    left = spark.createDataFrame([("a", 10)], "k string, t long")
    right = spark.createDataFrame(
        [("a", 9, 1.5, "x")], "k string, t long, v double, s string"
    )
    row = asof_join(left, right, on="t", by="k", value_cols=["v", "s"]).collect()[0]
    assert row.asof_v == 1.5 and row.asof_s == "x"
