"""Native kline (candlestick) computation from the trades stream.

The reference *consumes* exchange-computed klines (binance-di.py:56-67);
the engine computes them natively from trades (SURVEY §2.4 A1) with the
same 13-column output contract as the normalized kline record.

Batch and streaming share this transform: pass a batch DataFrame for
historical rebuilds, or a streaming one (with ``watermark=...``) for
live aggregation.  Streaming semantics map onto the exchange contract:
``outputMode("update")`` ≙ in-progress klines (is_kline_closed=False
interim emissions), ``outputMode("append")`` + watermark ≙ final closed
klines (is_kline_closed=True).

Scale: one shuffle on (window, symbol); min_by/max_by/sum/count are all
map-side combinable, so the shuffle carries one partial aggregate per
(symbol, window) per input partition — at 100 TB the shuffle volume is
O(symbols × windows), not O(trades).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_INTERVALS = {
    "1s": "1 second",
    "1m": "1 minute",
    "3m": "3 minutes",
    "5m": "5 minutes",
    "15m": "15 minutes",
    "30m": "30 minutes",
    "1h": "1 hour",
    "2h": "2 hours",
    "4h": "4 hours",
    "1d": "1 day",
}


def interval_duration(interval: str) -> str:
    """Binance interval code ('1m') → Spark window duration ('1 minute')."""
    return _INTERVALS[interval]


def klines_from_trades(
    trades: DataFrame,
    interval: str = "1m",
    *,
    watermark: str | None = None,
    closed: bool | None = None,
) -> DataFrame:
    """Aggregate typed trades into OHLCV klines.

    Input contract (typed trade record): ``symbol`` string,
    ``trade_time`` epoch-ms long, ``price`` / ``quantity`` decimal.

    `closed` stamps the is_kline_closed flag for batch rebuilds (batch
    windows over complete history are closed by construction); in
    streaming it is implied by the output mode and left to the caller.
    """
    duration = interval_duration(interval)
    t = trades.withColumn("__etime", F.timestamp_millis(F.col("trade_time")))
    if watermark is not None:
        t = t.withWatermark("__etime", watermark)
    price_d = F.col("price").cast("double")
    qty_d = F.col("quantity").cast("double")
    agg = (
        t.groupBy(F.window("__etime", duration).alias("__w"), "symbol")
        .agg(
            F.min_by("price", "trade_time").alias("open_price"),
            F.max("price").alias("high_price"),
            F.min("price").alias("low_price"),
            F.max_by("price", "trade_time").alias("close_price"),
            F.sum(qty_d).alias("base_asset_volume"),
            F.count("*").alias("number_of_trades"),
            F.sum(price_d * qty_d).alias("quote_asset_volume"),
            F.max("trade_time").alias("__last_trade"),
        )
    )
    out = agg.select(
        F.col("__last_trade").alias("event_time"),
        F.unix_millis("__w.start").alias("kline_start_time"),
        (F.unix_millis("__w.end") - 1).alias("kline_close_time"),
        "symbol",
        F.lit(interval).alias("interval"),
        "open_price",
        "close_price",
        "high_price",
        "low_price",
        "base_asset_volume",
        "number_of_trades",
        "quote_asset_volume",
    )
    if closed is not None:
        out = out.withColumn("is_kline_closed", F.lit(bool(closed)))
    return out
