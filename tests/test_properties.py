"""Property-based tests (hypothesis) for the algebraic core.

The reference repo has no automated tests at all (SURVEY §5); these
pin down the invariants our operators rely on:

- incremental session merging is batch-order-independent (the exact
  property the stateful streaming sessionizer depends on for
  cross-micro-batch correctness);
- the vectorized rolling-hash kernel equals the naive definition;
- native klines from random trades match an independent pandas oracle;
- the as-of join matches a naive per-row lookup.
"""

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings, strategies as st

from binance_data_ingestor_spark.operators.text import RH_BASE, RH_MOD
from binance_data_ingestor_spark.streaming.stateful import _merge

GAP = 1800


# --------------------------------------------------------------------------
# Session merge: splitting the event stream into arbitrary micro-batches
# and merging incrementally must equal one-shot merging (associativity
# over the session algebra).
# --------------------------------------------------------------------------
events_strategy = st.lists(
    st.integers(min_value=0, max_value=100_000), min_size=1, max_size=60
)


@given(events=events_strategy, data=st.data())
@settings(max_examples=200, deadline=None)
def test_session_merge_batch_order_independent(events, data):
    def to_sessions(secs):
        return [(s, s, 1, 1.0, s * 1_000_000, s * 1_000_000) for s in secs]

    one_shot = _merge(to_sessions(events), GAP)

    n_batches = data.draw(st.integers(min_value=1, max_value=5))
    # deterministic interleaved split (hypothesis controls count)
    batches = [events[i::n_batches] for i in range(n_batches)]
    acc = []
    for b in batches:
        acc = _merge(acc + to_sessions(b), GAP)

    assert acc == one_shot
    # sessions are disjoint and separated by more than GAP
    for (s1, e1, *_), (s2, _, *_) in zip(acc, acc[1:]):
        assert s2 - e1 > GAP
    assert sum(s[2] for s in acc) == len(events)


# --------------------------------------------------------------------------
# Rolling hash: vectorized sliding-window kernel == naive definition.
# --------------------------------------------------------------------------
@given(text=st.text(min_size=8, max_size=200))
@settings(max_examples=200, deadline=None)
def test_rolling_hash_kernel_matches_naive(text):
    from numpy.lib.stride_tricks import sliding_window_view

    w = 8
    pows = np.array([pow(RH_BASE, w - 1 - j, RH_MOD) for j in range(w)], dtype=np.int64)
    cps = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32).astype(np.int64)
    vectorized = (sliding_window_view(cps, w) * pows % RH_MOD).sum(axis=1) % RH_MOD

    naive = [
        sum(ord(text[k + j]) * int(pows[j]) for j in range(w)) % RH_MOD
        for k in range(len(text) - w + 1)
    ]
    assert vectorized.tolist() == naive


# --------------------------------------------------------------------------
# Klines: random trades → OHLCV must match an independent pandas oracle.
# --------------------------------------------------------------------------
trades_strategy = st.lists(
    st.tuples(
        st.sampled_from(["BTCUSDT", "ETHUSDT"]),
        st.integers(min_value=0, max_value=10 * 60_000 - 1),  # 10 one-min windows
        st.integers(min_value=1, max_value=9_999_999),  # price in 1e-4 units
        st.integers(min_value=1, max_value=99_999),  # qty in 1e-3 units
    ),
    min_size=1,
    max_size=80,
)


@pytest.mark.usefixtures("spark")
@given(trades=trades_strategy)
@settings(max_examples=8, deadline=None)
def test_klines_match_pandas_oracle(spark, trades):
    from binance_data_ingestor_spark.operators.klines import klines_from_trades

    # unique trade_time per symbol so open/close (min_by/max_by) are
    # well-defined — dedupe keeping the first occurrence
    seen, rows = set(), []
    for sym, t, p, q in trades:
        if (sym, t) in seen:
            continue
        seen.add((sym, t))
        rows.append((sym, t, f"{p / 1e4:.4f}", f"{q / 1e3:.3f}"))

    df = spark.createDataFrame(
        rows, "symbol string, trade_time long, price string, quantity string"
    ).selectExpr(
        "symbol",
        "trade_time",
        "cast(price as decimal(38,18)) price",
        "cast(quantity as decimal(38,18)) quantity",
    )
    got = {
        (r["symbol"], r["kline_start_time"]): r
        for r in klines_from_trades(df, "1m", closed=True).collect()
    }

    pdf = pd.DataFrame(rows, columns=["symbol", "trade_time", "price", "quantity"])
    pdf["pricef"] = pdf["price"].astype(float)
    pdf["qtyf"] = pdf["quantity"].astype(float)
    pdf["win"] = pdf["trade_time"] // 60_000 * 60_000
    for (sym, win), g in pdf.groupby(["symbol", "win"]):
        r = got[(sym, win)]
        g = g.sort_values("trade_time")
        assert float(r["open_price"]) == g.iloc[0]["pricef"]
        assert float(r["close_price"]) == g.iloc[-1]["pricef"]
        assert float(r["high_price"]) == g["pricef"].max()
        assert float(r["low_price"]) == g["pricef"].min()
        assert r["number_of_trades"] == len(g)
        assert abs(float(r["base_asset_volume"]) - g["qtyf"].sum()) < 1e-9
        assert r["kline_close_time"] == win + 59_999
        assert r["event_time"] == g["trade_time"].max()
    assert len(got) == pdf.groupby(["symbol", "win"]).ngroups


# --------------------------------------------------------------------------
# As-of join: matches a naive per-row "latest right <= left" lookup.
# --------------------------------------------------------------------------
asof_strategy = st.tuples(
    st.lists(  # left: (key, ts)
        st.tuples(st.integers(0, 3), st.integers(0, 1000)), min_size=1, max_size=40
    ),
    st.lists(  # right: (key, ts, value) — unique (key, ts)
        st.tuples(st.integers(0, 3), st.integers(0, 1000), st.integers(-100, 100)),
        min_size=0,
        max_size=40,
        unique_by=lambda r: (r[0], r[1]),
    ),
)


@pytest.mark.usefixtures("spark")
@given(data=asof_strategy)
@settings(max_examples=8, deadline=None)
def test_asof_join_matches_naive(spark, data):
    from binance_data_ingestor_spark.operators.asof import asof_join

    left_rows, right_rows = data
    left = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(left_rows)], "id long, k long, ts long"
    )
    right = spark.createDataFrame(right_rows, "k long, ts long, v long") if right_rows else (
        spark.createDataFrame([], "k long, ts long, v long")
    )
    got = {
        r["id"]: r["asof_v"]
        for r in asof_join(left, right, on="ts", by="k", value_cols=["v"]).collect()
    }
    for i, (k, t) in enumerate(left_rows):
        cands = [(rt, rv) for rk, rt, rv in right_rows if rk == k and rt <= t]
        expected = max(cands)[1] if cands else None
        assert got[i] == expected, (i, k, t)


# -- with_row_context ≡ global window (random keys, times, gaps) ------------

ctx_strategy = st.lists(
    st.tuples(
        st.sampled_from(["a", "b", "c"]),          # key
        st.integers(min_value=0, max_value=199),   # time
        st.integers(min_value=-50, max_value=50),  # value
    ),
    min_size=1,
    max_size=60,
)


@given(rows=ctx_strategy, data=st.data())
@settings(max_examples=12, deadline=None)
def test_with_row_context_equals_global_window(spark, rows, data):
    """Chunked window + boundary context must reproduce the global
    per-key window for lag/lead/rolling-N, for any chunk size and any
    gap pattern, whenever every INTERIOR (key, chunk) bucket holds ≥ N
    rows (the operator's documented precondition). Edge buckets — the
    first/last present chunk of a key — may be arbitrarily thin: the
    frame rows they fail to donate do not exist in the global stream
    either (round-8 ADVICE exemption), so the depth bound below is
    taken over interior buckets only, deliberately letting hypothesis
    generate thin stream edges."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from binance_data_ingestor_spark.operators.partitioning import (
        with_row_context,
    )

    # dedupe (key, t) so window order is total and results comparable
    uniq = {(k, t): v for k, t, v in rows}
    rows = [(k, t, float(v)) for (k, t), v in sorted(uniq.items())]
    chunk_size = data.draw(st.sampled_from([7, 23, 50]))
    df = spark.createDataFrame(rows, "k string, t long, v double")

    from collections import Counter

    occupancy = Counter((k, t // chunk_size) for k, t, _ in rows)
    chunks_per_key: dict[str, list[int]] = {}
    for k, c in occupancy:
        chunks_per_key.setdefault(k, []).append(c)
    interior = [
        occupancy[(k, c)]
        for k, cs in chunks_per_key.items()
        for c in cs
        if min(cs) < c < max(cs)
    ]
    max_n = min(min(interior, default=3), 3)

    wg = W.partitionBy("k").orderBy("t")
    for n in range(1, max_n + 1):
        expected = sorted(
            df.select(
                "k",
                "t",
                F.lag("v", n).over(wg).alias("lagn"),
                F.lead("v", n).over(wg).alias("leadn"),
                F.sum("v").over(wg.rowsBetween(-n, -1)).alias("roll"),
            ).collect()
        )
        dc = with_row_context(
            df,
            ["k"],
            ["t"],
            chunk=F.expr(f"t div {chunk_size}"),
            rows_before=n,
            rows_after=n,
        )
        wc = W.partitionBy("k", "chunk").orderBy("t")
        got = sorted(
            dc.select(
                "k",
                "t",
                "is_ctx",
                F.lag("v", n).over(wc).alias("lagn"),
                F.lead("v", n).over(wc).alias("leadn"),
                F.sum("v").over(wc.rowsBetween(-n, -1)).alias("roll"),
            )
            .filter(F.col("is_ctx") == 0)
            .drop("is_ctx")
            .collect()
        )
        assert got == expected, f"n={n} chunk={chunk_size}"


@given(rows=ctx_strategy)
@settings(max_examples=10, deadline=None)
def test_with_global_rank_equals_serial_row_number(spark, rows):
    """Bucket-offset distributed ranking must equal the serialized
    row_number() OVER (PARTITION BY key ORDER BY t) for any data/gaps,
    for any bucket granularity monotone in the order."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from binance_data_ingestor_spark.operators.partitioning import (
        with_global_rank,
    )

    uniq = {(k, t): v for k, t, v in rows}
    rows = [(k, t, float(v)) for (k, t), v in sorted(uniq.items())]
    df = spark.createDataFrame(rows, "k string, t long, v double")
    wg = W.partitionBy("k").orderBy("t")
    expected = sorted(
        df.select("k", "t", F.row_number().over(wg).alias("rank")).collect()
    )
    for bucket in (1, 13, 1000):
        got = sorted(
            with_global_rank(
                df, ["k"], ["t"], bucket=F.expr(f"t div {bucket}")
            )
            .select("k", "t", "rank")
            .collect()
        )
        assert got == expected, f"bucket={bucket}"


@given(rows=ctx_strategy)
@settings(max_examples=10, deadline=None)
def test_with_global_runmax_equals_serial_window(spark, rows):
    """Bucket-offset distributed running max must equal the serialized
    max(v) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING AND {1 PRECEDING |
    CURRENT ROW}) — keyed and keyless, any monotone bucket granularity,
    including the NULL first rows of the exclusive form."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from binance_data_ingestor_spark.operators.partitioning import (
        with_global_runmax,
    )

    uniq = {(k, t): v for k, t, v in rows}
    rows = [(k, t, float(v)) for (k, t), v in sorted(uniq.items())]
    df = spark.createDataFrame(rows, "k string, t long, v double")
    for keys in ([], ["k"]):
        for exclusive in (True, False):
            end = -1 if exclusive else W.currentRow
            wg = (
                W.partitionBy(*keys)
                .orderBy("t", "k")
                .rowsBetween(W.unboundedPreceding, end)
            )
            expected = sorted(
                df.select("k", "t", F.max("v").over(wg).alias("m")).collect(),
                key=str,
            )
            for bucket in (1, 13, 1000):
                got = sorted(
                    with_global_runmax(
                        df,
                        keys,
                        [F.asc("t"), F.asc("k")],
                        "v",
                        bucket=F.expr(f"t div {bucket}"),
                        out_col="m",
                        exclusive=exclusive,
                    )
                    .select("k", "t", "m")
                    .collect(),
                    key=str,
                )
                assert got == expected, (
                    f"keys={keys} exclusive={exclusive} bucket={bucket}"
                )


@given(rows=ctx_strategy)
@settings(max_examples=10, deadline=None)
def test_with_global_cumsum_multi_equals_serial_window(spark, rows):
    """The round-11 multi-column form of the bucket-offset cumsum must
    equal the serialized sum(v) OVER (... ROWS UNBOUNDED PRECEDING) for
    EVERY value column simultaneously, and the single-string form must
    stay exactly the list-of-one form — keyed and keyless, any monotone
    bucket granularity. Integer values so equality is exact."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from binance_data_ingestor_spark.operators.partitioning import (
        with_global_cumsum,
    )

    uniq = {(k, t): v for k, t, v in rows}
    rows = [(k, t, v, 2 * v - 7) for (k, t), v in sorted(uniq.items())]
    df = spark.createDataFrame(rows, "k string, t long, a long, b long")
    for keys in ([], ["k"]):
        wg = (
            W.partitionBy(*keys)
            .orderBy("t", "k")
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        )
        expected = sorted(
            df.select(
                "k",
                "t",
                F.sum("a").over(wg).alias("ca"),
                F.sum("b").over(wg).alias("cb"),
            ).collect(),
            key=str,
        )
        for bucket in (1, 13, 1000):
            got = sorted(
                with_global_cumsum(
                    df,
                    keys,
                    [F.asc("t"), F.asc("k")],
                    ["a", "b"],
                    bucket=F.expr(f"t div {bucket}"),
                    out_col=["ca", "cb"],
                )
                .select("k", "t", "ca", "cb")
                .collect(),
                key=str,
            )
            assert got == expected, f"keys={keys} bucket={bucket}"
            single = sorted(
                tuple(r)
                for r in with_global_cumsum(
                    df,
                    keys,
                    [F.asc("t"), F.asc("k")],
                    "a",
                    bucket=F.expr(f"t div {bucket}"),
                    out_col="ca",
                )
                .select("k", "t", "ca")
                .collect()
            )
            want = sorted((r["k"], r["t"], r["ca"]) for r in expected)
            assert single == want, f"single-form keys={keys} bucket={bucket}"
