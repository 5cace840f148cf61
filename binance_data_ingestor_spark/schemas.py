"""Explicit schemas for every stream type.

The reference keeps schemas implicit in its four projection functions
(reference binance-di.py:35-67) and lets pandas infer all-string Parquet
schemas at write time (binance-di.py:196-204).  The engine declares them
once, typed: DecimalType(38,18) for money (Binance 8-dp strings — never
Double for prices), TimestampType derivable from epoch-ms longs,
BooleanType for flags, ArrayType(Struct) for book sides instead of JSON
strings (SURVEY §1.3-1.4, FIXTURES.md).

Two layers per stream type:
  RAW_*    — the wire message (Binance short names), used by from_json.
  NORM_*   — the normalized record the engine's projections emit.
"""

from __future__ import annotations

from pyspark.sql import types as T

DEC = T.DecimalType(38, 18)

# price/qty level as it arrives on the wire: ["118050.00", "0.5"]
RAW_LEVEL = T.ArrayType(T.StringType())
# typed level the engine keeps internally
LEVEL = T.StructType(
    [
        T.StructField("price", DEC, True),
        T.StructField("qty", DEC, True),
    ]
)

# -- raw wire messages (field evidence: reference binance-di.py:35-67) --

RAW_TICKER = T.StructType(
    [
        T.StructField("e", T.StringType(), True),
        T.StructField("E", T.LongType(), True),
        T.StructField("s", T.StringType(), True),
        T.StructField("p", T.StringType(), True),
        T.StructField("P", T.StringType(), True),
        T.StructField("c", T.StringType(), True),
        T.StructField("h", T.StringType(), True),
        T.StructField("l", T.StringType(), True),
        T.StructField("v", T.StringType(), True),
        T.StructField("q", T.StringType(), True),
    ]
)

RAW_ORDER_BOOK = T.StructType(
    [
        T.StructField("e", T.StringType(), True),
        T.StructField("E", T.LongType(), True),
        T.StructField("s", T.StringType(), True),
        T.StructField("u", T.LongType(), True),
        T.StructField("b", T.ArrayType(RAW_LEVEL), True),
        T.StructField("a", T.ArrayType(RAW_LEVEL), True),
    ]
)

RAW_TRADE = T.StructType(
    [
        T.StructField("e", T.StringType(), True),
        T.StructField("E", T.LongType(), True),
        T.StructField("s", T.StringType(), True),
        T.StructField("p", T.StringType(), True),
        T.StructField("q", T.StringType(), True),
        T.StructField("T", T.LongType(), True),
        T.StructField("m", T.BooleanType(), True),
    ]
)

RAW_KLINE = T.StructType(
    [
        T.StructField("e", T.StringType(), True),
        T.StructField("E", T.LongType(), True),
        T.StructField("s", T.StringType(), True),
        T.StructField(
            "k",
            T.StructType(
                [
                    T.StructField("t", T.LongType(), True),
                    T.StructField("T", T.LongType(), True),
                    T.StructField("s", T.StringType(), True),
                    T.StructField("i", T.StringType(), True),
                    T.StructField("o", T.StringType(), True),
                    T.StructField("c", T.StringType(), True),
                    T.StructField("h", T.StringType(), True),
                    T.StructField("l", T.StringType(), True),
                    T.StructField("v", T.StringType(), True),
                    T.StructField("n", T.LongType(), True),
                    T.StructField("x", T.BooleanType(), True),
                    T.StructField("q", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

RAW_SCHEMAS = {
    "ticker": RAW_TICKER,
    "order-book": RAW_ORDER_BOOK,
    "trades": RAW_TRADE,
    "klines": RAW_KLINE,
}

# -- normalized records (dict keys at reference binance-di.py:35-67) --

NORM_TICKER = T.StructType(
    [
        T.StructField("price_change", T.StringType(), True),
        T.StructField("price_change_percent", T.StringType(), True),
        T.StructField("last_price", T.StringType(), True),
        T.StructField("high_price", T.StringType(), True),
        T.StructField("low_price", T.StringType(), True),
        T.StructField("total_volume_asset", T.StringType(), True),
        T.StructField("total_volume_quote", T.StringType(), True),
        T.StructField("event_time", T.LongType(), True),
    ]
)

NORM_ORDER_BOOK = T.StructType(
    [
        T.StructField("lastUpdateId", T.LongType(), True),
        T.StructField("bids", T.ArrayType(LEVEL), True),
        T.StructField("asks", T.ArrayType(LEVEL), True),
    ]
)

NORM_TRADE = T.StructType(
    [
        T.StructField("event_time", T.LongType(), True),
        T.StructField("price", T.StringType(), True),
        T.StructField("quantity", T.StringType(), True),
        T.StructField("trade_time", T.LongType(), True),
        T.StructField("is_buyer_maker", T.StringType(), True),
    ]
)

NORM_KLINE = T.StructType(
    [
        T.StructField("event_time", T.LongType(), True),
        T.StructField("kline_start_time", T.LongType(), True),
        T.StructField("kline_close_time", T.LongType(), True),
        T.StructField("symbol", T.StringType(), True),
        T.StructField("interval", T.StringType(), True),
        T.StructField("open_price", T.StringType(), True),
        T.StructField("close_price", T.StringType(), True),
        T.StructField("high_price", T.StringType(), True),
        T.StructField("low_price", T.StringType(), True),
        T.StructField("base_asset_volume", T.StringType(), True),
        T.StructField("number_of_trades", T.LongType(), True),
        T.StructField("is_kline_closed", T.StringType(), True),
        T.StructField("quote_asset_volume", T.StringType(), True),
    ]
)

STREAM_KEYS = ("ticker", "order-book", "trades", "klines")
