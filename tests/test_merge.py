"""CDC operators: latest_snapshot, scd2_intervals, upsert semantics."""

from __future__ import annotations

import pytest

from binance_data_ingestor_spark.operators.merge import (
    latest_snapshot,
    scd2_intervals,
    upsert,
)


def _events(spark):
    return spark.createDataFrame(
        [
            ("u1", 1, 10, "a"),
            ("u1", 2, 20, "b"),
            ("u1", 3, 20, "c"),   # ts tie with event 2 — id breaks it
            ("u2", 4, 5, "d"),
        ],
        "user string, eid long, ts long, payload string",
    )


def test_latest_snapshot_picks_max_order_tuple(spark):
    snap = {
        r.user: (r.eid, r.payload)
        for r in latest_snapshot(
            _events(spark), key="user", order_by=["ts", "eid"]
        ).collect()
    }
    assert snap == {"u1": (3, "c"), "u2": (4, "d")}


def test_latest_snapshot_schema_preserved(spark):
    out = latest_snapshot(_events(spark), key="user", order_by=["ts", "eid"])
    assert out.columns == _events(spark).columns


def test_scd2_intervals_cover_history(spark):
    rows = scd2_intervals(
        _events(spark), key="user", ts="ts", tie_break="eid"
    ).collect()
    by_eid = {r.eid: r for r in rows}
    # chain: each non-current row's valid_to == successor's valid_from
    assert by_eid[1].valid_to == by_eid[2].valid_from == 20
    assert by_eid[2].valid_to == 20 and not by_eid[2].is_current
    assert by_eid[3].valid_to is None and by_eid[3].is_current
    assert by_eid[4].valid_to is None and by_eid[4].is_current
    # exactly one current row per key
    assert sum(r.is_current for r in rows) == 2


def test_upsert_insert_update_keep(spark):
    base = spark.createDataFrame(
        [("u1", 1, 10, "old"), ("u2", 2, 50, "newer-than-change")],
        "user string, eid long, ts long, payload string",
    )
    changes = spark.createDataFrame(
        [
            ("u1", 5, 30, "upd"),        # updates u1
            ("u2", 6, 40, "stale"),      # older than base u2 — must lose
            ("u3", 7, 1, "ins-a"),       # insert, two versions in one batch
            ("u3", 8, 2, "ins-b"),
        ],
        "user string, eid long, ts long, payload string",
    )
    out = {
        r.user: r.payload
        for r in upsert(
            base, changes, key="user", order_by=["ts", "eid"]
        ).collect()
    }
    assert out == {"u1": "upd", "u2": "newer-than-change", "u3": "ins-b"}


def test_upsert_idempotent_under_replay(spark):
    base = spark.createDataFrame(
        [("u1", 1, 10, "x")], "user string, eid long, ts long, payload string"
    )
    changes = spark.createDataFrame(
        [("u1", 5, 30, "y")], "user string, eid long, ts long, payload string"
    )
    once = upsert(base, changes, key="user", order_by=["ts", "eid"])
    twice = upsert(once, changes, key="user", order_by=["ts", "eid"])
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


def test_upsert_schema_mismatch_rejected(spark):
    base = spark.createDataFrame([("u1", 1)], "user string, eid long")
    changes = spark.createDataFrame([("u1", 1.0)], "user string, other double")
    with pytest.raises(ValueError, match="schema"):
        upsert(base, changes, key="user", order_by="eid")


def test_latest_snapshot_plan_has_partial_agg(spark):
    """The scale contract: ONE exchange, map-side partial max_by (no
    window sort-shuffle of the full log)."""
    plan = latest_snapshot(
        _events(spark), key="user", order_by=["ts", "eid"]
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1
    assert "partial_max_by" in plan or "partial_maxby" in plan.lower()
    assert "Window" not in plan
