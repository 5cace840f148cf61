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


def test_asof_tolerance_nulls_stale_matches(spark):
    left = spark.createDataFrame(
        [("u", 100, "L1"), ("u", 500, "L2")], "k string, t long, tag string"
    )
    right = spark.createDataFrame([("u", 90, 1.0)], "k string, t long, v double")
    out = {
        r.tag: r.asof_v
        for r in asof_join(
            left, right, on="t", by="k", value_cols=["v"], tolerance=50
        ).collect()
    }
    assert out["L1"] == 1.0      # gap 10 <= 50
    assert out["L2"] is None     # gap 410 > 50 -> stale


def test_asof_forward_direction(spark):
    left = spark.createDataFrame(
        [("u", 10, "L1"), ("u", 30, "L2"), ("u", 100, "L3")],
        "k string, t long, tag string",
    )
    right = spark.createDataFrame(
        [("u", 20, 1.0), ("u", 30, 2.0)], "k string, t long, v double"
    )
    out = {
        r.tag: r.asof_v
        for r in asof_join(
            left, right, on="t", by="k", value_cols=["v"], direction="forward"
        ).collect()
    }
    assert out["L1"] == 1.0      # earliest at-or-after 10 is t=20
    assert out["L2"] == 2.0      # equal timestamp visible forward too
    assert out["L3"] is None     # nothing after 100


def test_asof_nearest_picks_closer_tie_backward(spark):
    left = spark.createDataFrame(
        [("u", 50, "mid"), ("u", 12, "nearlo"), ("u", 95, "nearhi"),
         ("u", 5, "before_all")],
        "k string, t long, tag string",
    )
    right = spark.createDataFrame(
        [("u", 10, 1.0), ("u", 90, 2.0)], "k string, t long, v double"
    )
    out = {
        r.tag: r.asof_v
        for r in asof_join(
            left, right, on="t", by="k", value_cols=["v"], direction="nearest"
        ).collect()
    }
    assert out["mid"] == 1.0         # |50-10|=40 == |50-90|=40 -> tie -> backward
    assert out["nearlo"] == 1.0
    assert out["nearhi"] == 2.0
    assert out["before_all"] == 1.0  # only forward candidate exists


def test_asof_nearest_duplicate_left_rows_and_tolerance(spark):
    left = spark.createDataFrame(
        [("u", 50), ("u", 50), ("u", 300)], "k string, t long"
    )
    right = spark.createDataFrame([("u", 60, 7.0)], "k string, t long, v double")
    rows = asof_join(
        left, right, on="t", by="k", value_cols=["v"],
        direction="nearest", tolerance=20,
    ).collect()
    assert len(rows) == 3  # duplicate left rows both survive
    by_t = sorted((r.t, r.asof_v) for r in rows)
    assert by_t == [(50, 7.0), (50, 7.0), (300, None)]  # 300 is stale


def test_asof_matches_pandas_merge_asof(spark):
    """Randomized cross-check against pandas merge_asof for all three
    directions (no tolerance; pandas tie rules match ours)."""
    import random

    import pandas as pd

    rng = random.Random(3)
    lrows = [("k", rng.randrange(0, 1000)) for _ in range(60)]
    rrows = [("k", rng.randrange(0, 1000), float(i)) for i, _ in enumerate(range(25))]
    rrows = [("k", t, v) for (_, t, _), v in zip(rrows, [float(i) for i in range(25)])]
    rrows = list({t: ("k", t, v) for (_, t, v) in rrows}.values())  # unique ts
    left = spark.createDataFrame(lrows, "k string, t long")
    right = spark.createDataFrame(rrows, "k string, t long, v double")
    lpd = pd.DataFrame(lrows, columns=["k", "t"]).sort_values("t")
    rpd = pd.DataFrame(rrows, columns=["k", "t", "v"]).sort_values("t")
    for direction in ("backward", "forward", "nearest"):
        want = pd.merge_asof(lpd, rpd, on="t", by="k", direction=direction)
        want_map = sorted(
            (t, None if pd.isna(v) else v) for t, v in zip(want.t, want.v)
        )
        got = sorted(
            (r.t, r.asof_v)
            for r in asof_join(
                left, right, on="t", by="k", value_cols=["v"], direction=direction
            ).collect()
        )
        assert got == want_map, direction
