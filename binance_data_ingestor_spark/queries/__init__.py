"""Query registry: every operator from SURVEY.md §2 as a (Spark, oracle-SQL) pair.

Each module exposes:
    QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]]
    ORACLES: dict[str, str]   # ANSI SQL for DuckDB; omit for non-SQL ops

``registry()`` merges them. Names are stable; the driver hash-compares
Spark output vs DuckDB output per name at sf0.01.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from .util import load  # noqa: F401  (re-export)


def _modules():
    from . import (
        analytics_ops,
        binance_ops,
        cdc_ops,
        cleaning_ops,
        graph_ops,
        ml_ops,
        multimodal_ops,
        profiling_ops,
        quality_ops,
        relational,
        similarity_ops,
        streaming_like,
        text_ops,
        timeseries_ops,
    )

    return [
        relational,
        streaming_like,
        binance_ops,
        text_ops,
        similarity_ops,
        multimodal_ops,
        cdc_ops,
        analytics_ops,
        cleaning_ops,
        graph_ops,
        timeseries_ops,
        profiling_ops,
        ml_ops,
        quality_ops,
    ]


# The driver scores registry entries FRONT-FIRST under a ~50-query budget.
# Round-5 rotation (after round 4's 50/50-green window brought
# cumulative certification to 174/189):
#   - 3 cross-family sentinels re-scored every round (q01/q21/q25);
#   - the 15 names never driver-scored in any round (q48/q55/q57/q59/
#     q61/q62/q99/q104/q113/q129/q144 deferred from earlier windows +
#     round 4's new q187-q190) — green here ⇒ cumulative 100%; they sit
#     directly after the sentinels, cheapest first, so a
#     runtime-budgeted cut cannot cost the round its goal (the
#     expensive streaming/iterative four — q99/q187/q188/q189 — close
#     the group). q129 enters with its new 4-digest weight derivation
#     (new weights ⇒ new oracle — it was never certified, so no
#     regression baseline moves);
#   - the remaining 32 slots are AGING RE-CERTIFICATION: the round-1
#     vintage names whose last green driver row is four rounds old,
#     oldest certificates first (q103 was also rewritten in round 4 —
#     de-windowed onto with_global_runmax — and has never been
#     re-scored since). q06_rollup is the one r01 name deferred to
#     round 6 (its A4 family stays covered in-window by q01/q05/q13).
# Round 5's new surface follows the "certify the round after it lands"
# convention → round-6 window, together with q06_rollup (the one
# deferred r01 re-cert); after that every name will have been
# driver-scored at least once. The round-6 slate is 30 names:
#   q191-q200 (the five streaming certifications, KMV sketch + its
#   streaming twin, KN perplexity, touch attribution, label-propagation
#   communities) and q201-q219 (BFS hub distance, sorted-neighborhood
#   linkage, SAX motifs, LOO target encoding, feature hashing, Markov
#   removal-effect attribution, quantile normalization, JL-projection
#   certificate, snapshot XOR digest + its streaming twin q211,
#   cross-source contamination, seasonal MAD outliers, coverage curve,
#   sequence support mining, Adamic-Adar link prediction, join-size
#   estimate, best-split finder, dedup yield, IVF cell audit) — all 29
#   new names pre-verified strict+stability+7-partition+vanilla green
#   this round. With the 3 sentinels that fills 33 of ~50 slots; spend
#   the rest on r02-vintage re-certification, oldest first.
PRIORITY = [
    "q01_pricing_summary",
    "q21_tumbling_ohlcv",
    "q25_asof_join",
    "q48_rolling_fingerprint",
    "q55_curation_pipeline",
    "q57_tfidf_retrieval",
    "q59_token_budget_mix",
    "q61_frame_sample",
    "q62_byte_histogram",
    "q104_rolling_corr",
    "q113_seasonal_backtest",
    "q129_poisson_bootstrap",
    "q144_dup_spans",
    "q190_quantile_sketch_certificate",
    "q99_pagerank",
    "q187_stream_heavy_hitters",
    "q188_bpe_train",
    "q189_bpe_encode",
    "q02_shipping_priority",
    "q03_regional_revenue",
    "q05_pivot_status",
    "q07_semi_anti",
    "q08_set_ops",
    "q09_distinct_agg",
    "q10_enrich_scalar",
    "q11_global_topk",
    "q12_percentiles",
    "q13_cube",
    "q14_salted_agg",
    "q15_local_supplier_revenue",
    "q16_approx_distinct",
    "q17_small_qty_revenue",
    "q18_big_orders",
    "q19_disjunctive_revenue",
    "q22_rolling_24h",
    "q23_lag_lead",
    "q28_range_join",
    "q29_multires_rollup",
    "q32_trades_normalize",
    "q33_klines_normalize",
    "q34_envelope_filter",
    "q37_realized_vol",
    "q103_skyline",
    "q109_recursive_hierarchy",
    "q122_nation_volume",
    "q123_market_share",
    "q125_grouping_sets",
    "q126_window_analytics",
    "q127_array_hof",
    "q135_depth_weighted_mid",
]


def registry() -> tuple[dict[str, Callable[[SparkSession, str], DataFrame]], dict[str, str]]:
    queries: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    oracles: dict[str, str] = {}
    for mod in _modules():
        for name, fn in mod.QUERIES.items():
            if name in queries:
                raise ValueError(f"duplicate query name: {name}")
            queries[name] = fn
        oracles.update(mod.ORACLES)
    missing = [n for n in PRIORITY if n not in queries]
    if missing:
        raise ValueError(f"PRIORITY names not in registry: {missing}")
    ordered = {n: queries[n] for n in PRIORITY}
    # Remainder after the window: every registry entry is oracle-backed
    # as of round 4 (q26 gained its batch-twin oracle), so the tail is
    # simply the not-in-window names in module order.
    ordered.update((n, f) for n, f in queries.items() if n not in ordered)
    return ordered, oracles
