"""Order-book analytics (reference tests/test_redis-data*.py semantics)."""

from __future__ import annotations

import json

from binance_data_ingestor_spark.operators.orderbook import (
    book_metrics,
    top_k_levels,
)
from binance_data_ingestor_spark.operators.projections import (
    normalize_order_book,
    parse_raw,
)


def _book(spark, bids, asks, u=1):
    msg = json.dumps({"E": 1, "u": u, "b": bids, "a": asks})
    df = spark.createDataFrame([(msg,)], "value string")
    return normalize_order_book(parse_raw(df, "order-book"))


def test_mid_and_spread(spark):
    out = book_metrics(
        _book(spark, [["100.00", "1"], ["99.90", "2"]], [["100.10", "1"]])
    ).collect()[0]
    assert float(out.best_bid) == 100.0
    assert float(out.best_ask) == 100.1
    assert abs(out.mid_price - 100.05) < 1e-9
    assert abs(out.spread - 0.10) < 1e-9
    assert out.mid_price_2dp == "100.05"  # P14 2-dp display parity
    assert out.spread_2dp == "0.10"


def test_empty_guard_yields_nulls(spark):
    out = book_metrics(_book(spark, [], [["100.10", "1"]])).collect()[0]
    assert out.best_bid is None and out.mid_price is None and out.spread is None


def test_top_k_slice(spark):
    bids = [[f"{100 - i * 0.01:.2f}", "1"] for i in range(5)]
    out = top_k_levels(_book(spark, bids, bids), k=3).collect()[0]
    assert len(out.bids_top3) == 3
    assert float(out.bids_top3[0].price) == 100.0  # head of price-sorted book
