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
# Round-11 rotation (after round 10's 50/50-green window brought cumulative
# certification to 269/281 — the r04 vintage retired):
#   - 3 cross-family sentinels re-scored every round (q01/q21/q25);
#   - the 43-name GOAL BLOCK, cheapest-first so a runtime-budgeted cut
#     cannot cost the round its goal: the 12 round-10-new names
#     (q272-q283 — never driver-scored; "certify the round after it
#     lands" convention) merged with ALL 31 remaining r05-vintage names
#     (green => the r05 vintage is RETIRED and cumulative certification
#     reaches 281/281 of the round-11-start registry);
#   - 4 re-cert slots: the cheapest r06-vintage names (oldest vintage
#     once r05 retires), cheapest-first.
#   Est. window cost 61.0 s of BENCH_DETAIL mins. The window carries
#   exactly TWO streaming certificates (q279 never-scored, q187
#   r05-retirement) — both goal-mandatory; the "don't stack streaming
#   certs" note is observed by keeping the rest out.
# Round-12 window plan: 3 sentinels + the 12 round-11-new names
# (q284-q295, never driver-scored — "certify the round after it lands")
# + the cheapest remaining r06-vintage names (the 4 re-certified below
# excluded) to begin retiring r06; q289 is that window's ONE new
# streaming certificate (don't stack more).
PRIORITY = [
    "q01_pricing_summary",
    "q21_tumbling_ohlcv",
    "q25_asof_join",
    "q280_dp_counts",
    "q10_enrich_scalar",
    "q08_set_ops",
    "q282_seasonal_strength",
    "q17_small_qty_revenue",
    "q13_cube",
    "q02_shipping_priority",
    "q18_big_orders",
    "q272_pii_census",
    "q275_embedding_drift",
    "q03_regional_revenue",
    "q274_bh_fdr",
    "q126_window_analytics",
    "q57_tfidf_retrieval",
    "q09_distinct_agg",
    "q33_klines_normalize",
    "q104_rolling_corr",
    "q103_skyline",
    "q122_nation_volume",
    "q127_array_hof",
    "q190_quantile_sketch_certificate",
    "q15_local_supplier_revenue",
    "q123_market_share",
    "q283_reciprocal_rank",
    "q109_recursive_hierarchy",
    "q129_poisson_bootstrap",
    "q34_envelope_filter",
    "q135_depth_weighted_mid",
    "q273_minhash_estimate",
    "q37_realized_vol",
    "q276_contamination_rate",
    "q281_modularity",
    "q16_approx_distinct",
    "q277_ad_drift",
    "q55_curation_pipeline",
    "q278_brown_forsythe",
    "q144_dup_spans",
    "q187_stream_heavy_hitters",
    "q188_bpe_train",
    "q22_rolling_24h",
    "q279_stream_wilson",
    "q189_bpe_encode",
    "q99_pagerank",
    "q44_ngram_jaccard",
    "q42_fingerprint",
    "q41_lang_id",
    "q80_text_scrub",
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
