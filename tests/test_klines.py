"""Native kline computation (A1): batch golden check + streaming parity."""

from __future__ import annotations

from pyspark.sql import functions as F

from binance_data_ingestor_spark.operators.klines import klines_from_trades
from binance_data_ingestor_spark.schemas import DEC

# minute window 60000..119999 for BTC; one trade in the next window
TRADES = [
    ("BTCUSDT", 60_000, "100.0", "1.0"),
    ("BTCUSDT", 70_000, "110.0", "2.0"),
    ("BTCUSDT", 80_000, "90.0", "0.5"),
    ("BTCUSDT", 119_999, "105.0", "1.0"),
    ("BTCUSDT", 120_000, "200.0", "1.0"),
    ("ETHUSDT", 65_000, "10.0", "3.0"),
]


def _trades_df(spark):
    df = spark.createDataFrame(
        TRADES, "symbol string, trade_time long, price string, quantity string"
    )
    return df.withColumn("price", F.col("price").cast(DEC)).withColumn(
        "quantity", F.col("quantity").cast(DEC)
    )


def test_batch_ohlcv_golden(spark):
    out = {
        (r.symbol, r.kline_start_time): r
        for r in klines_from_trades(_trades_df(spark), "1m", closed=True).collect()
    }
    k = out[("BTCUSDT", 60_000)]
    assert k.kline_close_time == 119_999
    assert float(k.open_price) == 100.0 and float(k.close_price) == 105.0
    assert float(k.high_price) == 110.0 and float(k.low_price) == 90.0
    assert k.number_of_trades == 4
    assert abs(k.base_asset_volume - 4.5) < 1e-9
    # 100*1 + 110*2 + 90*0.5 + 105*1 = 470
    assert abs(k.quote_asset_volume - 470.0) < 1e-9
    assert k.event_time == 119_999  # last trade in window
    assert k.is_kline_closed is True
    assert out[("BTCUSDT", 120_000)].number_of_trades == 1
    assert out[("ETHUSDT", 60_000)].number_of_trades == 1


def test_streaming_matches_batch(spark, tmp_path):
    src = str(tmp_path / "trades_src")
    ckpt = str(tmp_path / "ckpt")
    _trades_df(spark).write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    q = (
        klines_from_trades(stream, "1m", watermark="0 seconds", closed=False)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("kl_test")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r.symbol, r.kline_start_time): r.number_of_trades
            for r in spark.sql("SELECT * FROM kl_test").collect()
        }
    finally:
        q.stop()
    want = {
        (r.symbol, r.kline_start_time): r.number_of_trades
        for r in klines_from_trades(_trades_df(spark), "1m").collect()
    }
    assert got == want  # batch/stream unification: same transform, same answer


def test_update_mode_interim_corrections(spark, tmp_path):
    """A1 update-mode semantics (is_kline_closed=false analog): the
    in-progress candle is emitted per trigger, and an out-of-order trade
    that is still WITHIN the watermark updates the already-emitted
    window — the sink sees an interim emission first, then a corrected
    one. (Past the watermark the opposite holds: see
    test_late_data_dropped_past_watermark.)"""
    src = str(tmp_path / "ooo_src")
    ckpt = str(tmp_path / "ckpt_ooo")

    def write_batchfile(rows):
        df = spark.createDataFrame(
            rows, "symbol string, trade_time long, price string, quantity string"
        ).withColumn("price", F.col("price").cast(DEC)).withColumn(
            "quantity", F.col("quantity").cast(DEC)
        )
        df.coalesce(1).write.mode("append").parquet(src)

    # trigger 1: two trades in window [60s, 120s)
    write_batchfile(
        [
            ("BTCUSDT", 60_000, "100.0", "1.0"),
            ("BTCUSDT", 110_000, "105.0", "1.0"),
        ]
    )
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(src)
    )
    q = (
        klines_from_trades(stream, "1m", watermark="10 minutes", closed=False)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("kl_ooo")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        interim = [
            r for r in spark.sql("SELECT * FROM kl_ooo").collect()
            if r.kline_start_time == 60_000
        ]
        # trigger 2: an OUT-OF-ORDER trade for the same window (event
        # time 80s < max seen 110s) — inside the 10 min watermark, so it
        # must be folded in and the window re-emitted
        write_batchfile([("BTCUSDT", 80_000, "120.0", "2.0")])
        q.processAllAvailable()
        final = [
            r for r in spark.sql("SELECT * FROM kl_ooo").collect()
            if r.kline_start_time == 60_000
        ]
    finally:
        q.stop()

    assert len(interim) == 1 and interim[0].number_of_trades == 2
    assert float(interim[0].high_price) == 105.0
    # one additional emission for the same window, now with the
    # out-of-order trade merged: count 3, new high, volume 4
    assert len(final) == 2
    corrected = max(final, key=lambda r: r.number_of_trades)
    assert corrected.number_of_trades == 3
    assert float(corrected.high_price) == 120.0
    assert abs(corrected.base_asset_volume - 4.0) < 1e-9
    # close price is still the latest-by-event-time trade (110s), not
    # the late-arriving 80s one
    assert float(corrected.close_price) == 105.0


def test_late_data_dropped_past_watermark(spark, tmp_path):
    """T3: in append mode, a trade arriving after the watermark passed
    its window is dropped — the closed candle is immutable. The reference
    has no late-data story at all (SURVEY §2.6 T3: arrival order =
    processing order); this pins down the engine's upgrade."""
    src = str(tmp_path / "late_src")
    ckpt = str(tmp_path / "ckpt_late")

    def write_batchfile(rows):
        df = spark.createDataFrame(
            rows, "symbol string, trade_time long, price string, quantity string"
        ).withColumn("price", F.col("price").cast(DEC)).withColumn(
            "quantity", F.col("quantity").cast(DEC)
        )
        df.coalesce(1).write.mode("append").parquet(src)

    # batch 1: window [60s, 120s) gets 2 trades; a trade at 10 min
    # advances the watermark far past that window
    write_batchfile(
        [
            ("BTCUSDT", 60_000, "100.0", "1.0"),
            ("BTCUSDT", 70_000, "110.0", "1.0"),
            ("BTCUSDT", 600_000, "120.0", "1.0"),
        ]
    )
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(src)
    q = (
        klines_from_trades(stream, "1m", watermark="1 minute", closed=True)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("kl_late")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        # batch 2 arrives while the query runs: a LATE trade for the
        # already-closed [60s, 120s) window (watermark 600s - 60s = 540s
        # >> 120s) plus a fresh trade that closes more windows
        write_batchfile(
            [
                ("BTCUSDT", 80_000, "999.0", "9.0"),  # late -> dropped
                ("BTCUSDT", 660_000, "130.0", "1.0"),
            ]
        )
        q.processAllAvailable()
        rows = {
            r.kline_start_time: r
            for r in spark.sql("SELECT * FROM kl_late").collect()
        }
    finally:
        q.stop()

    # the 60s window closed with ONLY the 2 on-time trades; the late
    # 999-price trade neither reopened nor mutated it, and produced no
    # separate emission
    assert rows[60_000].number_of_trades == 2
    assert float(rows[60_000].high_price) == 110.0
    assert 80_000 not in rows
