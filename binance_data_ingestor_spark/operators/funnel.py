"""Ordered-sequence (funnel) matching over an event log.

``funnel_steps`` finds, per key, the earliest completion time of each
step in an ordered predicate chain: step i counts only if it happens
at-or-after some completion of step i-1 (classic view→click→purchase
funnel). This is sequence matching the reference's downstream consumers
would do imperatively over a Redis tail
(`/root/reference/tests/test_redis-data.py:48-78` is the poll-decode-
inspect loop shape); here it is a declarative one-shuffle plan.

Scale design (100 TB): ONE shuffle on the key, one sort, then N
cascaded running-min window passes over the same sorted partition —
each step's Window node depends on the previous one so they stay
separate operators, but all share the single Exchange+Sort (the log is
shuffled and sorted once regardless of funnel depth), and the final
per-key aggregate is map-side-partial on the already-partitioned data.
No join, no applyInPandas, no per-user collect.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def funnel_steps(
    df: DataFrame,
    *,
    key: str,
    ts: str,
    steps: list[tuple[str, Column]],
    tie_break: str,
) -> DataFrame:
    """Return one row per `key` with ``{name}_ts`` = earliest time step
    `name` completed respecting funnel order (null = never), plus
    ``stage`` = number of consecutive completed steps.

    Within a key, rows are ordered by (`ts`, `tie_break`); a step at the
    same `ts` as its predecessor counts (at-or-after semantics).
    """
    w = (
        W.partitionBy(key)
        .orderBy(ts, tie_break)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    out = df
    cand_cols: list[str] = []
    prev_run: Column | None = None
    for name, pred in steps:
        # a row is a valid candidate for this step if its predicate holds
        # and (for steps >0) some earlier-or-equal row completed the
        # previous step — the running min is that completion time.
        cand = F.when(
            pred if prev_run is None else (pred & prev_run.isNotNull()),
            F.col(ts),
        )
        cand_col = f"__cand_{name}"
        out = out.withColumn(cand_col, cand)
        cand_cols.append(cand_col)
        prev_run = F.min(F.col(cand_col)).over(w)

    agg = out.groupBy(key).agg(
        *[
            F.min(c).alias(f"{n}_ts")
            for c, (n, _) in zip(cand_cols, steps)
        ]
    )
    # the chain is prefix-closed (step i non-null ⇒ step i-1 non-null),
    # so completed depth is just the count of non-null step times
    depth = sum(
        (F.col(f"{n}_ts").isNotNull().cast("int") for n, _ in steps),
        F.lit(0),
    )
    return agg.withColumn("stage", depth)
