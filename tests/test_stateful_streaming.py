"""Custom stateful streaming: applyInPandasWithState sessions + dedup.

The sessionizer replays the sf0.001 events table as a file stream
(availableNow) with a far-future sentinel row that pushes the global
watermark past every real session, and the emitted sessions must match
the batch window-function sessionization (q24 semantics) exactly.
"""

import pytest
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from binance_data_ingestor_spark.queries.util import load
from binance_data_ingestor_spark.streaming.stateful import (
    dedup_stream,
    rolling_window_stream,
    sessionize_stream,
    sessionize_stream_tws,
)

SF_DIR = "/root/testdata/sf0.001"


def batch_sessions(ev):
    sec = F.floor(F.col("ts").cast("double")).cast("long")
    w = W.partitionBy("user_id").orderBy("ts")
    wcum = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    flagged = ev.select(
        "user_id",
        "ts",
        "value",
        F.when(sec - F.lag(sec).over(w) > 1800, 1)
        .otherwise(F.when(F.lag(sec).over(w).isNull(), 1).otherwise(0))
        .alias("new_sess"),
    )
    sessions = flagged.withColumn("session_id", F.sum("new_sess").over(wcum))
    return (
        sessions.groupBy("user_id", "session_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sess_value"),
            F.min("ts").alias("sess_start"),
            F.max("ts").alias("sess_end"),
        )
    )


@pytest.fixture(scope="module")
def replay_dir(spark, tmp_path_factory):
    """events + one sentinel row far in the future (watermark driver)."""
    path = str(tmp_path_factory.mktemp("events_replay"))
    ev = load(spark, SF_DIR, "events").select("user_id", "ts", "value")
    sentinel = spark.createDataFrame(
        [(int(-1), float(0.0))], "user_id long, value double"
    ).select(
        "user_id",
        (F.to_timestamp(F.lit("2031-01-01 00:00:00"))).alias("ts"),
        "value",
    )
    ev.unionByName(sentinel.select("user_id", "ts", "value")).coalesce(1).write.mode(
        "overwrite"
    ).parquet(path)
    return path


def test_sessionize_stream_matches_batch(spark, replay_dir, tmp_path):
    stream = (
        spark.readStream.schema("user_id long, ts timestamp, value double")
        .parquet(replay_dir)
    )
    out = sessionize_stream(stream, watermark="30 minutes")
    q = (
        out.writeStream.format("memory")
        .queryName("sessions_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    got = (
        spark.table("sessions_out")
        .filter(F.col("user_id") >= 0)
        .select(
            "user_id",
            "n_events",
            "sess_value",
            F.timestamp_micros(F.col("sess_start")).alias("sess_start"),
            F.timestamp_micros(F.col("sess_end")).alias("sess_end"),
        )
    )
    expected = batch_sessions(load(spark, SF_DIR, "events")).drop("session_id")

    g = {
        (r["user_id"], r["sess_start"]): (r["n_events"], r["sess_value"], r["sess_end"])
        for r in got.collect()
    }
    e = {
        (r["user_id"], r["sess_start"]): (r["n_events"], r["sess_value"], r["sess_end"])
        for r in expected.collect()
    }
    assert len(g) == len(e) > 0
    for k, (n, v, end) in e.items():
        gn, gv, gend = g[k]
        assert gn == n and gend == end
        assert abs(gv - v) < 1e-9


def _protobuf_usable() -> bool:
    # Spark's transformWithStateInPandas state protocol is protobuf-based;
    # this container ships a broken google.protobuf (no descriptor module)
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.mark.skipif(
    not _protobuf_usable(),
    reason="transformWithStateInPandas needs google.protobuf, unusable here",
)
def test_sessionize_tws_matches_batch(spark, replay_dir, tmp_path):
    """The transformWithStateInPandas implementation must produce the
    exact same session set as both the applyInPandasWithState one and
    the batch window-function sessionization.

    Skip justification (re-checked round 7, 2026-08-15): Spark's
    transformWithStateInPandas state protocol is protobuf-framed and
    this container ships NO `google` package at all (`import google`
    → ModuleNotFoundError; pip install is out of contract), so the
    twin cannot execute here. The operator surface it exercises is
    covered by test_sessionize_stream_matches_batch above — the
    applyInPandasWithState twin certifies the identical session set
    against the batch oracle every run. Re-check each round with
    `python -c "from google.protobuf import descriptor"`; if the
    image gains a working protobuf this test runs unmodified."""
    stream = (
        spark.readStream.schema("user_id long, ts timestamp, value double")
        .parquet(replay_dir)
    )
    out = sessionize_stream_tws(stream, watermark="30 minutes")
    q = (
        out.writeStream.format("memory")
        .queryName("sessions_tws_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_tws"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    got = (
        spark.table("sessions_tws_out")
        .filter(F.col("user_id") >= 0)
        .select(
            "user_id",
            "n_events",
            "sess_value",
            F.timestamp_micros(F.col("sess_start")).alias("sess_start"),
            F.timestamp_micros(F.col("sess_end")).alias("sess_end"),
        )
    )
    expected = batch_sessions(load(spark, SF_DIR, "events")).drop("session_id")

    g = {
        (r["user_id"], r["sess_start"]): (r["n_events"], r["sess_value"], r["sess_end"])
        for r in got.collect()
    }
    e = {
        (r["user_id"], r["sess_start"]): (r["n_events"], r["sess_value"], r["sess_end"])
        for r in expected.collect()
    }
    assert len(g) == len(e) > 0
    for k, (n, v, end) in e.items():
        gn, gv, gend = g[k]
        assert gn == n and gend == end
        assert abs(gv - v) < 1e-9


def test_dedup_stream(spark, tmp_path):
    path = str(tmp_path / "dups")
    rows = [
        (1, "2026-01-01 00:00:00", "a"),
        (1, "2026-01-01 00:05:00", "a"),  # dup of key 'a' within watermark
        (2, "2026-01-01 00:01:00", "b"),
        (3, "2026-01-01 00:02:00", "a"),  # same key col value, same dedup key
    ]
    (
        spark.createDataFrame(rows, "id long, ts_s string, k string")
        .select("id", F.to_timestamp("ts_s").alias("ts"), "k")
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(path)
    )
    stream = spark.readStream.schema("id long, ts timestamp, k string").parquet(path)
    out = dedup_stream(stream, ["k"], watermark="1 hour")
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    res = spark.table("dedup_out").collect()
    assert sorted(r["k"] for r in res) == ["a", "b"]


@pytest.fixture(scope="module")
def replay_dir_full(spark, tmp_path_factory):
    """Full event rows + far-future sentinel (for the transition op)."""
    path = str(tmp_path_factory.mktemp("events_replay_full"))
    ev = load(spark, SF_DIR, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    sentinel = spark.createDataFrame(
        [(-1, -1, "view")], "user_id long, event_id long, event_type string"
    ).select(
        "user_id",
        F.to_timestamp(F.lit("2031-01-01 00:00:00")).alias("ts"),
        "event_id",
        "event_type",
    )
    ev.unionByName(sentinel).coalesce(1).write.mode("overwrite").parquet(path)
    return path


def test_transition_stream_matches_batch_lag(spark, replay_dir_full, tmp_path):
    from binance_data_ingestor_spark.streaming.stateful import (
        transition_counts_stream,
    )

    stream = spark.readStream.schema(
        "user_id long, ts timestamp, event_id long, event_type string"
    ).parquet(replay_dir_full)
    out = transition_counts_stream(stream, watermark="30 minutes")
    q = (
        out.writeStream.format("memory")
        .queryName("transitions_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_trans"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    streamed = {
        ((r.user_id, r.prev_type, r.event_type)): r.n
        for r in spark.table("transitions_out")
        .filter(F.col("user_id") >= 0)
        .groupBy("user_id", "prev_type", "event_type")
        .agg(F.count("*").alias("n"))
        .collect()
    }

    ev = load(spark, SF_DIR, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    batch = {
        ((r.user_id, r.prev_type, r.event_type)): r.n
        for r in ev.select(
            "user_id",
            F.lag("event_type").over(w).alias("prev_type"),
            "event_type",
        )
        .filter(F.col("prev_type").isNotNull())
        .groupBy("user_id", "prev_type", "event_type")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert streamed == batch


def test_rolling_window_stream_matches_batch_multibatch(spark, tmp_path):
    """Streaming trailing-24h sum/count/max ≡ the batch RANGE window,
    under a 2-file replay split mid-range so most frames straddle the
    batch boundary (the context-retention path: rows already emitted
    must stay in state while future events still need them)."""
    ev = load(spark, SF_DIR, "events").select(
        "event_type", "ts", "event_id", "value"
    )
    lo, hi = ev.agg(F.min("ts").alias("lo"), F.max("ts").alias("hi")).collect()[0]
    mid = lo + (hi - lo) / 2
    path = str(tmp_path / "in")
    ev.filter(F.col("ts") < F.lit(mid)).coalesce(1).write.parquet(path)
    ev.filter(F.col("ts") >= F.lit(mid)).coalesce(1).write.mode(
        "append"
    ).parquet(path)
    sent = spark.createDataFrame([("__wm__",)], "event_type string").select(
        "event_type",
        F.to_timestamp(F.lit("2031-01-01")).alias("ts"),
        F.lit(-1).cast("long").alias("event_id"),
        F.lit(0.0).alias("value"),
    )
    sent.coalesce(1).write.mode("append").parquet(path)

    stream = (
        spark.readStream.schema(
            "event_type string, ts timestamp, event_id long, value double"
        )
        .option("maxFilesPerTrigger", "1")
        .parquet(path)
    )
    out = rolling_window_stream(
        stream, key_col="event_type", window_sec=86_400, watermark="30 minutes"
    )
    q = (
        out.writeStream.format("memory")
        .queryName("rolling_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)
    got = {
        r["event_id"]: (
            round(r["rolling_sum"], 2),
            r["rolling_n"],
            round(r["rolling_max"], 2),
        )
        for r in spark.table("rolling_out")
        .filter(F.col("key") != "__wm__")
        .collect()
    }
    w = (
        W.partitionBy("event_type")
        .orderBy(F.col("ts").cast("long"))
        .rangeBetween(-86_400, 0)
    )
    expected = {
        r["event_id"]: (r["s"], r["n"], r["m"])
        for r in ev.select(
            "event_id",
            F.round(F.sum("value").over(w), 2).alias("s"),
            F.count("*").over(w).alias("n"),
            F.round(F.max("value").over(w), 2).alias("m"),
        ).collect()
    }
    assert len(got) == len(expected) > 0
    assert got == expected
