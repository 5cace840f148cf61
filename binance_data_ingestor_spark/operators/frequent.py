"""Scalable exact heavy hitters: Misra-Gries partial summaries per
partition, then an exact recount of the (tiny) candidate set.

The naive plan — `groupBy(item).count()` then HAVING — shuffles the
FULL item-frequency table; at 100 TB of tokens that exchange is the
job. This operator never shuffles raw items: each partition streams
through a bounded Misra-Gries summary (mapInPandas, O(capacity)
memory), the union of summaries is a few-thousand-row candidate list
that broadcasts, and a second scan recounts ONLY candidates exactly
(map-side combinable groupBy over a broadcast-pruned stream).

Correctness certificate: Misra-Gries with ``capacity`` k on a
partition of n_p items retains every item whose partition count
exceeds n_p/(k+1). Any item with global share > 1/(k+1) therefore
exceeds that bound on at least one partition (averaging argument) and
survives into the candidate set; the recount pass then makes the
final counts exact, so with k ≥ ceil(1/min_share) the result equals
the naive plan's — verified against it in tests and by the q88 oracle.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def mg_ingest(counters: dict, items, capacity: int) -> tuple[int, int]:
    """Feed ``items`` through a Misra-Gries counter dict in place.

    Returns (n_ingested, n_decrements). The decrement count is the MG
    error certificate: for every item, true_count - counters.get(item,
    0) ∈ [0, n_decrements], and n_decrements ≤ n/(capacity+1). Shared
    by the batch per-partition summarizer below and the streaming
    per-key operator (streaming/stateful.heavy_hitters_stream).
    """
    n = dec = 0
    for item in items:
        n += 1
        if item in counters:
            counters[item] += 1
        elif len(counters) < capacity:
            counters[item] = 1
        else:
            dec += 1
            dead = [k for k, v in counters.items() if v == 1]
            for k in counters:
                counters[k] -= 1
            for k in dead:
                del counters[k]
    return n, dec


def mg_candidates(df: DataFrame, col: str, capacity: int) -> DataFrame:
    """Per-partition Misra-Gries summaries → distinct candidate items."""

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        for pdf in batches:
            mg_ingest(counters, pdf[col].dropna(), capacity)
        yield pd.DataFrame({col: pd.Series(list(counters), dtype="object")})

    return df.mapInPandas(summarize, schema=f"{col} string").distinct()


def heavy_hitters(df: DataFrame, col: str, min_share: float) -> DataFrame:
    """All items whose global frequency share is ≥ ``min_share``, with
    EXACT counts. Returns (col, cnt, share_r). Fully declarative — no
    driver-side actions; the total is a broadcast 1-row aggregate."""
    capacity = max(int(2.0 / min_share), 16)
    cands = mg_candidates(df, col, capacity)
    counts = (
        df.join(F.broadcast(cands), col)
        .groupBy(col)
        .agg(F.count("*").alias("cnt"))
    )
    total = df.agg(F.count(col).alias("tot"))
    return (
        counts.join(F.broadcast(total))
        .filter(F.col("cnt") >= F.col("tot") * min_share)
        .select(col, "cnt", F.round(F.col("cnt") / F.col("tot"), 6).alias("share_r"))
    )
