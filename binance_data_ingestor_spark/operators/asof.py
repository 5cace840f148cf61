"""As-of (most-recent-match) join.

Spark has no native as-of join (reference parity note: SURVEY §2.5 J1 —
the reference's mid-price consumer is the use case a trades⨝book as-of
join would serve).  Implemented as union + last(ignorenulls) over a
partitioned window rather than ``pd.merge_asof`` in ``applyInPandas``:

- stays entirely JVM-side (whole-stage codegen, no Arrow transfer);
- costs exactly ONE shuffle on the `by` key — the same shuffle any
  per-key implementation needs — then a linear window scan;
- skew-safe under AQE because the window partition is the `by` key,
  same cardinality profile as the join key itself.

Tie semantics: a right row with the same `on` value as a left row IS
visible (matches DuckDB ``ASOF JOIN ... ON l.on >= r.on``), enforced by
sorting the right side before the left side within equal `on` values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

_SIDE = "__asof_side"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    by: list[str] | str,
    value_cols: list[str],
    prefix: str = "asof_",
) -> DataFrame:
    """For every left row, attach the latest right row with
    ``right.on <= left.on`` within the same `by` group.

    `value_cols` are taken from `right` and appear as ``{prefix}{col}``;
    left rows with no prior right row get nulls (left-join semantics).
    """
    by = [by] if isinstance(by, str) else list(by)
    renamed = {c: f"{prefix}{c}" for c in value_cols}

    r = right.select(
        *by, on, *[F.col(c).alias(renamed[c]) for c in value_cols]
    ).withColumn(_SIDE, F.lit(0))
    l = left.withColumn(_SIDE, F.lit(1))
    for c in renamed.values():
        l = l.withColumn(c, F.lit(None).cast(r.schema[c].dataType))

    unioned = l.unionByName(r, allowMissingColumns=True)
    w = (
        W.partitionBy(*by)
        .orderBy(F.col(on).asc(), F.col(_SIDE).asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    filled = unioned.select(
        *[
            F.last(c, ignorenulls=True).over(w).alias(c) if c in renamed.values() else F.col(c)
            for c in unioned.columns
        ]
    )
    return filled.filter(F.col(_SIDE) == 1).drop(_SIDE)
