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
# Round-7 rotation (after round 6's 50/50-green window brought cumulative
# certification to 218/218 of the round-6-start registry):
#   - 3 cross-family sentinels re-scored every round (q01/q21/q25);
#   - the 36-name GOAL BLOCK, cheapest-first so a runtime-budgeted cut
#     cannot cost the round its goal: the 7 round-6-new names
#     (q220-q225, q39 — never driver-scored; "certify the round after
#     it lands" convention; green ⇒ cumulative 225/225 of the
#     round-7-start registry) merged with the 29 r02-VINTAGE names
#     whose last green driver row is round 2 (four rounds old:
#     q105/q106/q118/q124/q149/q152/q153/q166/q167/q169/q170/q178/
#     q24/q30/q31/q35/q36/q38/q45/q52/q53/q54/q65/q74/q82/q83/q88/
#     q89/q91). The q225 streaming replay (4.8 s fixed cost) closes
#     the block;
#   - the remaining 11 slots are r03-VINTAGE RE-CERTIFICATION,
#     cheapest first (q60/q56/q72/q49/q108/q70/q131/q155/q173/q66/
#     q177).
# Round-8 window plan: 3 sentinels + the 10 round-7-new names
# (q226/q227/q228/q229/q230/q231/q232/q233/q234/q235 — certify the
# round after they land) + the remaining 34 r03-vintage names
# (q138/q142/q143/q145/q146/q150/q151/q154/q157/q158/q159/q160/q161/
# q163/q171/q174/q179/q180/q181/q182/q27/q46/q51/q63/q64/q67/q71/
# q75/q81/q90/q92/q93/q96/q110); that's 47 — if the budget is ~50,
# spend the spare slots on r04-vintage, cheapest first.
PRIORITY = [
    "q01_pricing_summary",
    "q21_tumbling_ohlcv",
    "q25_asof_join",
    "q74_scd2",
    "q118_semantic_dedup",
    "q36_orderflow_imbalance",
    "q24_sessionize",
    "q35_vwap",
    "q89_grouped_regression",
    "q167_kaplan_meier",
    "q106_copurchase_lift",
    "q88_heavy_hitters",
    "q91_constraint_audit",
    "q82_gapfill_locf",
    "q220_hamming_topk",
    "q221_js_divergence",
    "q65_media_phash",
    "q30_ticker_normalize",
    "q152_mixture_rebalance",
    "q54_neardup_clusters",
    "q222_interarrival_burstiness",
    "q170_gini_revenue",
    "q105_triangle_count",
    "q223_frequent_triples",
    "q52_lsh_topk",
    "q39_flow_autocorr",
    "q38_twap",
    "q124_product_profit",
    "q178_wav_roundtrip",
    "q31_orderbook_metrics",
    "q166_exact_median",
    "q45_minhash_lsh",
    "q53_ivf_topk",
    "q169_ks_drift",
    "q149_bloom_decontaminate",
    "q224_hist2d",
    "q153_incremental_neardup",
    "q83_rolling_zscore",
    "q225_stream_countmin",
    "q60_media_metadata",
    "q56_stratified_sample",
    "q72_chunking",
    "q49_tfidf_topterms",
    "q108_editdist_join",
    "q70_vocab",
    "q131_ab_test",
    "q155_dormant_capital",
    "q173_scd2_temporal_join",
    "q66_pq_topk",
    "q177_cusum",
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
