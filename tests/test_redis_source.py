"""Redis Streams scan source: round-trip through the sink's fake store."""

import json
import os

from pyspark.sql import functions as F

from binance_data_ingestor_spark.sources.redis_source import (
    binance_keys,
    read_redis_streams,
)


class FakeReadRedis:
    """XRANGE over the same file-backed store the sink fake writes
    (one file per (key, id), ids sorted lexicographically — fine for
    the fixed-width test ids)."""

    def __init__(self, root):
        self.root = root

    def xrange(self, key, min="-", max="+", count=None):
        d = os.path.join(self.root, key.replace(":", "_"))
        if not os.path.isdir(d):
            return []
        ids = sorted(os.listdir(d))
        lo_excl = isinstance(min, str) and min.startswith("(")
        lo = min[1:] if lo_excl else min
        out = []
        for rid in ids:
            if min != "-" and (rid < lo or (lo_excl and rid == lo)):
                continue
            if max != "+" and rid > max:
                continue
            out.append((rid, json.load(open(os.path.join(d, rid)))))
            if count and len(out) >= count:
                break
        return out


def _store(tmp_path, entries):
    root = str(tmp_path / "store")
    for key, rid, fields in entries:
        d = os.path.join(root, key.replace(":", "_"))
        os.makedirs(d, exist_ok=True)
        with open(os.path.join(d, rid), "w") as fh:
            json.dump(fields, fh)
    return root


def test_read_redis_streams_roundtrip(spark, tmp_path):
    root = _store(
        tmp_path,
        [
            ("binance:ticker:btcusdt", "1000-0", {"last_price": "1.0", "symbol": "BTCUSDT"}),
            ("binance:ticker:btcusdt", "1000-1", {"last_price": "1.1", "symbol": "BTCUSDT"}),
            ("binance:trades:ethusdt", "2000-0", {"price": "5.0", "symbol": "ETHUSDT"}),
        ],
    )
    keys = binance_keys(["ticker", "trades"], ["BTCUSDT", "ETHUSDT"])
    df = read_redis_streams(
        spark, keys, client_factory=lambda h, p, _r=root: FakeReadRedis(_r)
    )
    rows = df.collect()
    assert len(rows) == 3
    got = {(r["key"], r["id"]): r["fields"] for r in rows}
    assert got[("binance:ticker:btcusdt", "1000-1")]["last_price"] == "1.1"
    # empty keys contribute nothing (the reference's key-name skew would
    # surface here as an empty scan, not an error)
    assert {r["key"] for r in rows} == {
        "binance:ticker:btcusdt",
        "binance:trades:ethusdt",
    }


def test_read_redis_streams_offset_resume(spark, tmp_path):
    root = _store(
        tmp_path,
        [
            ("binance:ticker:btcusdt", "1000-0", {"v": "a"}),
            ("binance:ticker:btcusdt", "1000-1", {"v": "b"}),
            ("binance:ticker:btcusdt", "1000-2", {"v": "c"}),
        ],
    )
    df = read_redis_streams(
        spark,
        ["binance:ticker:btcusdt"],
        client_factory=lambda h, p, _r=root: FakeReadRedis(_r),
        start="1000-0",
        exclusive_start=True,
    )
    assert sorted(r["id"] for r in df.collect()) == ["1000-1", "1000-2"]


def test_read_redis_streams_paging(spark, tmp_path):
    entries = [
        ("binance:ticker:btcusdt", f"1000-{i}", {"v": str(i)}) for i in range(7)
    ]
    root = _store(tmp_path, entries)
    df = read_redis_streams(
        spark,
        ["binance:ticker:btcusdt"],
        client_factory=lambda h, p, _r=root: FakeReadRedis(_r),
        count=3,  # forces 3 pages
    )
    assert df.count() == 7
    # query composes: filter + projection over the map column
    v5 = df.filter(F.col("fields")["v"] == "5").collect()
    assert len(v5) == 1 and v5[0]["id"] == "1000-5"
