"""Golden byte-level sink parity (SURVEY §1.4, VERDICT r1 item 8).

The golden bytes are produced IN THIS TEST by the same stdlib calls the
reference makes — ``json.dumps(payload)`` per JSONL line
(binance-di.py:179-180) and ``csv.writer`` excel-dialect rows
(binance-di.py:175-178,181-184) — over payload dicts built exactly like
the reference's four ``process_*_payload`` functions (binance-di.py:35-67):
``.get()`` tolerance, ``json.dumps`` of raw book levels, ``str()`` of the
maker/closed flags. The engine side decodes the SAME raw wire frames
through parse_raw → normalize_* / book_wire_fields → wire_format line
builders, and every byte must match.
"""

from __future__ import annotations

import csv
import glob
import io
import json

import pytest
from pyspark.sql import functions as F

from binance_data_ingestor_spark.operators.projections import (
    normalize_klines,
    normalize_ticker,
    normalize_trades,
    parse_raw,
)
from binance_data_ingestor_spark.sinks.wire_format import (
    book_wire_fields,
    reference_csv_header,
    reference_csv_row,
    reference_jsonl_line,
    write_reference_jsonl,
)

# -- raw wire fixtures (one well-formed, one with missing fields) ----------

RAW_TICKER_MSGS = [
    {"e": "24hrTicker", "E": 1718000000123, "s": "BTCUSDT", "p": "-123.45000000",
     "P": "-0.205", "c": "59876.01000000", "h": "61000.00000000",
     "l": "59000.50000000", "v": "12345.67800000", "q": "740000000.12345678"},
    # missing p/P/h → reference .get() yields None → JSON null / CSV empty
    {"e": "24hrTicker", "E": 1718000060456, "s": "ETHUSDT",
     "c": "3456.78000000", "l": "3400.00000000", "v": "9876.54321000",
     "q": "34000000.00000000"},
]

RAW_BOOK_MSGS = [
    {"e": "depthUpdate", "E": 1718000000500, "s": "BTCUSDT", "u": 987654321,
     "b": [["59876.00000000", "1.50000000"], ["59875.99000000", "0.75000000"]],
     "a": [["59876.02000000", "0.10000000"]]},
    # empty/missing sides → json.dumps([]) == '[]'
    {"e": "depthUpdate", "E": 1718000001000, "s": "ETHUSDT", "u": 987654400,
     "b": []},
]

RAW_TRADE_MSGS = [
    {"e": "aggTrade", "E": 1718000000700, "s": "BTCUSDT", "p": "59876.01000000",
     "q": "0.00150000", "T": 1718000000699, "m": True},
    {"e": "aggTrade", "E": 1718000000800, "s": "BTCUSDT", "p": "59876.02000000",
     "q": "0.25000000", "T": 1718000000799, "m": False},
    # missing m → str(None) == 'None'
    {"e": "aggTrade", "E": 1718000000900, "s": "ETHUSDT", "p": "3456.79000000",
     "q": "1.00000000", "T": 1718000000899},
]

RAW_KLINE_MSGS = [
    {"e": "kline", "E": 1718000000950, "s": "BTCUSDT",
     "k": {"t": 1718000000000, "T": 1718000059999, "s": "BTCUSDT", "i": "1m",
           "o": "59870.00000000", "c": "59876.01000000", "h": "59880.00000000",
           "l": "59860.00000000", "v": "12.34567800", "n": 456, "x": False,
           "q": "739000.12345678"}},
]


# -- reference payload construction (re-expressed binance-di.py:35-67) -----

def ref_ticker(d):
    return {"price_change": d.get("p"), "price_change_percent": d.get("P"),
            "last_price": d.get("c"), "high_price": d.get("h"),
            "low_price": d.get("l"), "total_volume_asset": d.get("v"),
            "total_volume_quote": d.get("q"), "event_time": d.get("E")}


def ref_book(d):
    return {"lastUpdateId": d.get("u"), "bids": json.dumps(d.get("b", [])),
            "asks": json.dumps(d.get("a", []))}


def ref_trade(d):
    return {"event_time": d.get("E"), "price": d.get("p"),
            "quantity": d.get("q"), "trade_time": d.get("T"),
            "is_buyer_maker": str(d.get("m"))}


def ref_kline(d):
    k = d.get("k", {})
    return {"event_time": d.get("E"), "kline_start_time": k.get("t"),
            "kline_close_time": k.get("T"), "symbol": k.get("s"),
            "interval": k.get("i"), "open_price": k.get("o"),
            "close_price": k.get("c"), "high_price": k.get("h"),
            "low_price": k.get("l"), "base_asset_volume": k.get("v"),
            "number_of_trades": k.get("n"), "is_kline_closed": str(k.get("x")),
            "quote_asset_volume": k.get("q")}


CASES = [
    ("ticker", RAW_TICKER_MSGS, ref_ticker),
    ("order-book", RAW_BOOK_MSGS, ref_book),
    ("trades", RAW_TRADE_MSGS, ref_trade),
    ("klines", RAW_KLINE_MSGS, ref_kline),
]


def _engine_payload(spark, stream_key, msgs):
    raw = spark.createDataFrame(
        [(i, json.dumps(m)) for i, m in enumerate(msgs)], "idx long, value string"
    )
    parsed = parse_raw(raw, stream_key)
    if stream_key == "ticker":
        return normalize_ticker(parsed, keep=["idx"])
    if stream_key == "order-book":
        return parsed.select("idx", *book_wire_fields(parsed))
    if stream_key == "trades":
        return normalize_trades(parsed, keep=["idx"])
    return normalize_klines(parsed, keep=["idx"])


@pytest.mark.parametrize("stream_key,msgs,ref_fn", CASES,
                         ids=[c[0] for c in CASES])
def test_jsonl_lines_byte_identical(spark, stream_key, msgs, ref_fn):
    golden = [json.dumps(ref_fn(m)) for m in msgs]
    df = _engine_payload(spark, stream_key, msgs)
    payload = df.drop("idx")
    got = [
        r["line"]
        for r in df.select("idx", reference_jsonl_line(payload).alias("line"))
        .orderBy("idx")
        .collect()
    ]
    assert got == golden


@pytest.mark.parametrize("stream_key,msgs,ref_fn", CASES,
                         ids=[c[0] for c in CASES])
def test_csv_file_byte_identical(spark, stream_key, msgs, ref_fn):
    # golden file bytes: csv.writer(header from first payload, then rows)
    buf = io.StringIO(newline="")
    w = csv.writer(buf)
    header = list(ref_fn(msgs[0]).keys())
    w.writerow(header)
    for m in msgs:
        w.writerow([ref_fn(m).get(h) for h in header])
    golden_bytes = buf.getvalue()

    df = _engine_payload(spark, stream_key, msgs)
    payload = df.drop("idx")
    rows = [
        r["row"]
        for r in df.select("idx", reference_csv_row(payload).alias("row"))
        .orderBy("idx")
        .collect()
    ]
    got_bytes = "".join(
        line + "\r\n" for line in [reference_csv_header(payload.columns)] + rows
    )
    assert got_bytes == golden_bytes


def test_reference_jsonl_file_bytes(spark, tmp_path):
    # end-to-end: the text-sink file is the byte concatenation of
    # json.dumps lines — exactly what the reference's file contains
    msgs = RAW_TRADE_MSGS
    golden = "".join(json.dumps(ref_trade(m)) + "\n" for m in msgs)
    df = _engine_payload(spark, "trades", msgs).orderBy("idx").drop("idx")
    out = str(tmp_path / "jsonl")
    write_reference_jsonl(df.coalesce(1), out)
    [f] = glob.glob(f"{out}/part-*")
    with open(f, "rb") as fh:
        assert fh.read().decode() == golden


def test_book_quotes_escape_inside_payload_line(spark):
    # the embedded bids/asks JSON string must arrive backslash-escaped
    # inside the payload line, exactly as json.dumps re-escapes it
    df = _engine_payload(spark, "order-book", RAW_BOOK_MSGS[:1]).drop("idx")
    [r] = df.select(reference_jsonl_line(df).alias("line")).collect()
    assert '"bids": "[[\\"59876.00000000\\", \\"1.50000000\\"]' in r["line"]
    assert json.loads(r["line"])["bids"] == json.dumps(RAW_BOOK_MSGS[0]["b"])
