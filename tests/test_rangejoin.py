"""Binned range-join exactness vs a naive nested-loop reference.

The operator's whole claim is that the bin rewrite is *exact* — same
rows as the O(n·m) inequality join, for any bin width.  These tests
randomize intervals/points (fixed seed), run both forms across several
bin widths (including ones much smaller and much larger than the
interval widths), and require set equality.  Edge cases pinned:
boundary timestamps exactly on bin edges, closed-interval endpoints,
zero-width intervals, pairs overlapping in many shared bins (the
exactly-once guard), and the left-join add-back.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from binance_data_ingestor_spark.operators.rangejoin import (
    interval_overlap_join,
    point_in_interval_join,
)

BASE = 1_700_000_000  # any epoch-seconds anchor


def _ts(sec: float):
    return F.timestamp_seconds(F.lit(sec))


def _points(spark, rows):
    return spark.createDataFrame(rows, "pid long, k string, sec double").select(
        "pid", "k", F.timestamp_seconds("sec").alias("pt")
    )


def _intervals(spark, rows):
    return spark.createDataFrame(
        rows, "iid long, k string, lo_s double, hi_s double"
    ).select(
        "iid",
        "k",
        F.timestamp_seconds("lo_s").alias("lo"),
        F.timestamp_seconds("hi_s").alias("hi"),
    )


def _random_fixture(n_pts=120, n_ivs=60, span=40_000, seed=7):
    rng = random.Random(seed)
    pts = [
        (i, rng.choice("ab"), BASE + rng.uniform(0, span)) for i in range(n_pts)
    ]
    # mix of zero-width, short, and multi-bin-spanning intervals; some
    # endpoints land EXACTLY on 600 s bin edges
    ivs = []
    for j in range(n_ivs):
        lo = BASE + rng.uniform(0, span)
        if j % 5 == 0:
            lo = float(BASE + 600 * rng.randrange(span // 600))  # exact bin edge
        width = rng.choice([0.0, rng.uniform(0, 300), rng.uniform(0, 5000)])
        ivs.append((j, rng.choice("ab"), lo, lo + width))
    return pts, ivs


def test_point_in_interval_matches_nested_loop(spark):
    pts_rows, ivs_rows = _random_fixture()
    pts, ivs = _points(spark, pts_rows), _intervals(spark, ivs_rows)

    naive = {
        (r.pid, r.iid)
        for r in pts.join(
            ivs,
            (pts.k == ivs.k) & pts.pt.between(ivs.lo, ivs.hi),
        ).collect()
    }
    assert naive, "fixture produced no matches — widen it"

    for bin_seconds in (60, 600, 7200, 100_000):
        got = {
            (r.pid, r.iid)
            for r in point_in_interval_join(
                pts,
                ivs,
                point_ts="pt",
                lo="lo",
                hi="hi",
                bin_seconds=bin_seconds,
                keys=["k"],
            ).collect()
        }
        assert got == naive, f"bin_seconds={bin_seconds}"


def test_point_in_interval_closed_endpoints_and_bin_edges(spark):
    # point exactly at lo, at hi, and at a bin boundary inside the interval
    pts = _points(
        spark,
        [
            (1, "a", float(BASE)),  # == lo
            (2, "a", float(BASE + 1200)),  # == hi, also a 600 s bin edge
            (3, "a", float(BASE + 600)),  # interior bin edge
            (4, "a", float(BASE + 1201)),  # just outside
        ],
    )
    ivs = _intervals(spark, [(10, "a", float(BASE), float(BASE + 1200))])
    got = {
        r.pid
        for r in point_in_interval_join(
            pts, ivs, point_ts="pt", lo="lo", hi="hi", bin_seconds=600, keys=["k"]
        ).collect()
    }
    assert got == {1, 2, 3}


def test_point_in_interval_left_join_pads_unmatched(spark):
    pts = _points(spark, [(1, "a", float(BASE + 10)), (2, "a", float(BASE + 999_999))])
    ivs = _intervals(spark, [(10, "a", float(BASE), float(BASE + 100))])
    out = point_in_interval_join(
        pts, ivs, point_ts="pt", lo="lo", hi="hi", bin_seconds=600,
        keys=["k"], how="left",
    ).collect()
    by_pid = {r.pid: r for r in out}
    assert len(out) == 2
    assert by_pid[1].iid == 10
    assert by_pid[2].iid is None and by_pid[2].lo is None


def test_interval_overlap_matches_nested_loop_exactly_once(spark):
    _, ivs_rows = _random_fixture(n_ivs=80, seed=11)
    ivs = _intervals(spark, ivs_rows)
    a = ivs.select(
        F.col("iid").alias("ia"),
        F.col("k").alias("k"),
        F.col("lo").alias("lo_a"),
        F.col("hi").alias("hi_a"),
    )
    b = ivs.select(
        F.col("iid").alias("ib"),
        F.col("k").alias("kb"),
        F.col("lo").alias("lo_b"),
        F.col("hi").alias("hi_b"),
    )
    naive = sorted(
        (r.ia, r.ib)
        for r in a.join(
            b,
            (a.k == b.kb)
            & (a.ia < b.ib)
            & (F.col("lo_a") <= F.col("hi_b"))
            & (F.col("lo_b") <= F.col("hi_a")),
        ).collect()
    )
    assert naive, "fixture produced no overlaps — widen it"

    for bin_seconds in (60, 600, 100_000):
        got = sorted(
            (r.ia, r.ib)
            for r in interval_overlap_join(
                a,
                b.withColumnRenamed("kb", "k"),
                a_lo="lo_a",
                a_hi="hi_a",
                b_lo="lo_b",
                b_hi="hi_b",
                bin_seconds=bin_seconds,
                keys=["k"],
                extra_cond=F.col("ia") < F.col("ib"),
            ).collect()
        )
        # sorted LISTS, not sets: a pair emitted twice (broken
        # exactly-once guard) must fail, not be collapsed away
        assert got == naive, f"bin_seconds={bin_seconds}"


def test_interval_overlap_touching_endpoints_count(spark):
    # [0, 600] and [600, 1200] touch at exactly one instant (a bin edge)
    a = _intervals(spark, [(1, "a", float(BASE), float(BASE + 600))]).select(
        F.col("iid").alias("ia"), "k", F.col("lo").alias("lo_a"), F.col("hi").alias("hi_a")
    )
    b = _intervals(spark, [(2, "a", float(BASE + 600), float(BASE + 1200))]).select(
        F.col("iid").alias("ib"), F.col("k").alias("k"), F.col("lo").alias("lo_b"), F.col("hi").alias("hi_b")
    )
    rows = interval_overlap_join(
        a, b, a_lo="lo_a", a_hi="hi_a", b_lo="lo_b", b_hi="hi_b",
        bin_seconds=600, keys=["k"],
    ).collect()
    assert [(r.ia, r.ib) for r in rows] == [(1, 2)]


def test_point_in_interval_salted_matches_unsalted(spark):
    """num_salts scatters hot bins but must not change the answer —
    every (point, interval) pair still meets exactly once."""
    pts_rows, ivs_rows = _random_fixture(seed=23)
    pts, ivs = _points(spark, pts_rows), _intervals(spark, ivs_rows)
    base = sorted(
        (r.pid, r.iid)
        for r in point_in_interval_join(
            pts, ivs, point_ts="pt", lo="lo", hi="hi",
            bin_seconds=600, keys=["k"],
        ).collect()
    )
    assert base
    for num_salts in (2, 7):
        got = sorted(
            (r.pid, r.iid)
            for r in point_in_interval_join(
                pts, ivs, point_ts="pt", lo="lo", hi="hi",
                bin_seconds=600, keys=["k"], num_salts=num_salts,
            ).collect()
        )
        assert got == base, f"num_salts={num_salts}"


def test_auto_bin_seconds_tracks_interval_width(spark):
    from binance_data_ingestor_spark.operators.rangejoin import auto_bin_seconds

    ivs = _intervals(
        spark,
        [(i, "a", float(BASE + i * 10_000), float(BASE + i * 10_000 + 1800))
         for i in range(20)],
    )
    got = auto_bin_seconds(ivs, "lo", "hi")
    assert got == 1800
    empty = ivs.filter("iid < 0")
    assert auto_bin_seconds(empty, "lo", "hi") == 60  # floor on no data
