"""Redis Streams scan source (SURVEY §2.1 S12).

Reference parity: the consumer tests read one key
``binance:{stream}:{symbol}`` with ``XREAD`` and track ``last_id``
(`/root/reference/tests/test_redis-data.py:48-78`). The engine
generalizes that to a batch scan: a set of stream keys → one DataFrame,
one Spark partition per key (keys are Redis's sharding unit, so this is
the locality-aligned parallel scan — the manual "partition pruning" the
reference does by picking a single key becomes just passing fewer keys).

``last_id`` offset tracking maps to the ``start`` bound (XRANGE is
inclusive; pass ``exclusive_start=True`` to resume after a checkpointed
id). The ``redis`` package is not installed here, so the client
boundary is injectable exactly like the sink's.

This is one of the rare justified RDD uses: per-partition imperative
network IO against an external system, immediately lifted back into a
typed DataFrame.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable, Iterator

from pyspark.sql import DataFrame, SparkSession

ENTRY_SCHEMA = "key string, id string, fields map<string,string>"


def _default_client_factory(host: str, port: int):
    try:
        import redis  # type: ignore
    except ImportError as e:  # pragma: no cover - env without redis
        raise RuntimeError(
            "redis package not available; pass client_factory= to read_redis_streams"
        ) from e
    return redis.Redis(host=host, port=port, decode_responses=True)


def read_redis_streams(
    spark: SparkSession,
    keys: Iterable[str],
    *,
    host: str = "localhost",
    port: int = 31111,
    client_factory: Callable | None = None,
    start: str = "-",
    end: str = "+",
    exclusive_start: bool = False,
    count: int | None = None,
) -> DataFrame:
    """Scan Redis Stream keys into (key, id, fields) rows.

    One task per key; each task opens its own client and XRANGEs in
    ``count``-sized pages (the reference polls count=1 per round trip —
    paging is the batch-scan version of that loop).
    """
    factory = client_factory or _default_client_factory
    key_list = sorted(set(keys))
    page = count or 1000

    def fetch(part: Iterator[str]):
        client = factory(host, port)
        for key in part:
            lo = f"({start}" if exclusive_start and start not in ("-",) else start
            while True:
                entries = client.xrange(key, min=lo, max=end, count=page)
                for rid, fields in entries:
                    yield (key, rid, dict(fields))
                if len(entries) < page:
                    break
                lo = f"({entries[-1][0]}"  # resume exclusive of last id

    if not key_list:
        return spark.createDataFrame([], ENTRY_SCHEMA)
    rdd = spark.sparkContext.parallelize(key_list, len(key_list)).mapPartitions(fetch)
    return spark.createDataFrame(rdd, ENTRY_SCHEMA)


def binance_keys(streams: Iterable[str], symbols: Iterable[str]) -> list[str]:
    """The sink's key contract: binance:{stream}:{lower(symbol)}."""
    return [f"binance:{st}:{sym.lower()}" for st in streams for sym in symbols]
