"""As-of (most-recent-match) join, with tolerance and direction.

Spark has no native as-of join (reference parity note: SURVEY §2.5 J1 —
the reference's mid-price consumer is the use case a trades⨝book as-of
join would serve).  Implemented as union + last(ignorenulls) over a
partitioned window rather than ``pd.merge_asof`` in ``applyInPandas``:

- stays entirely JVM-side (whole-stage codegen, no Arrow transfer);
- costs exactly ONE shuffle on the `by` key — the same shuffle any
  per-key implementation needs — then a linear window scan (two scans
  for ``direction="nearest"``: one per direction, same Exchange);
- skew-safe under AQE because the window partition is the `by` key,
  same cardinality profile as the join key itself.

Tie semantics: a right row with the same `on` value as a left row IS
visible in every direction (matches DuckDB ``ASOF JOIN … ON l.on >=
r.on``), enforced by sorting the right side before the left side
within equal `on` values.  ``nearest`` breaks distance ties toward the
BACKWARD (earlier) match — documented, deterministic.

The ``merge_asof`` surface (tolerance / direction) is matched so a
pandas pipeline ports 1:1; semantics verified in tests/test_asof.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F
from pyspark.sql import types as T

_SIDE = "__asof_side"
_RON = "__asof_on"


def _gap(left_on: Column, right_on: Column, dtype) -> Column:
    """|left.on - right.on| in SECONDS for timestamps, raw units else."""
    if isinstance(dtype, (T.TimestampType, T.TimestampNTZType)):
        return F.abs(F.unix_millis(left_on) - F.unix_millis(right_on)) / 1000.0
    return F.abs(left_on - right_on)


def _one_pass(
    l: DataFrame,
    r: DataFrame,
    on: str,
    by: list[str],
    fill_cols: list[str],
    descending: bool,
) -> DataFrame:
    """Union + directional last-ignorenulls fill. ``descending=False``
    fills from the latest at-or-before right row (backward);
    ``descending=True`` from the earliest at-or-after (forward)."""
    unioned = l.unionByName(r, allowMissingColumns=True)
    order = F.col(on).desc() if descending else F.col(on).asc()
    w = (
        W.partitionBy(*by)
        .orderBy(order, F.col(_SIDE).asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return unioned.select(
        *[
            F.last(c, ignorenulls=True).over(w).alias(c)
            if c in fill_cols
            else F.col(c)
            for c in unioned.columns
        ]
    ).filter(F.col(_SIDE) == 1)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    by: list[str] | str,
    value_cols: list[str],
    prefix: str = "asof_",
    tolerance: float | None = None,
    direction: str = "backward",
) -> DataFrame:
    """For every left row, attach the matching right row's `value_cols`
    (as ``{prefix}{col}``) within the same `by` group.

    direction:
      * ``backward`` (default) — latest right row with ``r.on <= l.on``
      * ``forward`` — earliest right row with ``r.on >= l.on``
      * ``nearest`` — whichever of the two is closer in ``on``
        (distance tie → backward)

    tolerance: maximum |l.on − r.on| for a match to count — SECONDS
    when `on` is a timestamp, raw units otherwise. Stale matches
    become nulls (left-join semantics preserved).
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unsupported direction={direction!r}")
    by = [by] if isinstance(by, str) else list(by)
    renamed = {c: f"{prefix}{c}" for c in value_cols}
    need_ron = tolerance is not None or direction == "nearest"

    r = right.select(
        *by, on, *[F.col(c).alias(renamed[c]) for c in value_cols]
    ).withColumn(_SIDE, F.lit(0))
    if need_ron:
        r = r.withColumn(_RON, F.col(on))
    l = left.withColumn(_SIDE, F.lit(1))
    for c in renamed.values():
        l = l.withColumn(c, F.lit(None).cast(r.schema[c].dataType))
    if need_ron:
        l = l.withColumn(_RON, F.lit(None).cast(r.schema[_RON].dataType))
    fill = list(renamed.values()) + ([_RON] if need_ron else [])

    on_type = right.schema[on].dataType

    def _tol_nulled(df: DataFrame) -> DataFrame:
        if tolerance is None:
            return df
        stale = _gap(F.col(on), F.col(_RON), on_type) > tolerance
        out = df
        for c in fill:
            out = out.withColumn(c, F.when(~F.coalesce(stale, F.lit(True)), F.col(c)))
        return out

    if direction in ("backward", "forward"):
        out = _one_pass(l, r, on, by, fill, descending=(direction == "forward"))
        return _tol_nulled(out).drop(_SIDE, *([_RON] if need_ron else []))

    # nearest: one backward pass + one forward pass (same Exchange key,
    # two sorts), then pick the closer candidate per row. The two
    # passes re-meet on a synthetic row id — joining on the left
    # columns would mis-pair duplicate left rows. The id comes from a
    # row_number over the same (by, on) sort both windows already need,
    # so it is deterministic across the two evaluations of this lineage
    # (monotonically_increasing_id would depend on partition layout).
    rid = "__asof_id"
    wid = W.partitionBy(*by).orderBy(
        F.col(on).asc(), *[F.col(c).asc_nulls_first() for c in left.columns]
    )
    l = l.withColumn(rid, F.row_number().over(wid))
    bwd = _one_pass(l, r, on, by, fill, descending=False)
    b_cols = {c: f"__b_{c}" for c in fill}
    bwd = bwd.select(
        *left.columns,
        rid,
        *[F.col(c).alias(b_cols[c]) for c in fill],
    )
    fwd = _one_pass(l, r, on, by, fill, descending=True)
    f_cols = {c: f"__f_{c}" for c in fill}
    fwd = fwd.select(
        *by,
        rid,
        *[F.col(c).alias(f_cols[c]) for c in fill],
    )
    joined = bwd.join(fwd, [*by, rid]).drop(rid)
    bg = _gap(F.col(on), F.col(b_cols[_RON]), on_type)
    fg = _gap(F.col(on), F.col(f_cols[_RON]), on_type)
    # backward wins ties; a null candidate loses to a present one
    use_b = F.when(F.col(b_cols[_RON]).isNull(), F.lit(False)).otherwise(
        F.col(f_cols[_RON]).isNull() | (bg <= fg)
    )
    picked = joined.select(
        *left.columns,
        *[
            F.when(use_b, F.col(b_cols[c])).otherwise(F.col(f_cols[c])).alias(c)
            for c in fill
        ],
    )
    return _tol_nulled(picked).drop(_RON)
