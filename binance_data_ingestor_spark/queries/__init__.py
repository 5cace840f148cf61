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
# Round-6 rotation (after round 5's 50/50-green window brought cumulative
# certification to 189/189 of the round-4 registry):
#   - 3 cross-family sentinels re-scored every round (q01/q21/q25);
#   - the 30-name GOAL BLOCK: q06_rollup (the one r01 name whose last
#     green driver row is round 1, deferred here by design) plus the 29
#     round-5 names never driver-scored (q191-q219, following the
#     "certify the round after it lands" convention). Green here ⇒
#     cumulative 218/218 — every registry name driver-scored at least
#     once. Ordered cheapest-first so a runtime-budgeted cut cannot
#     cost the round its goal; the five expensive streaming replays
#     (q193/q211/q195/q192/q199/q191) close the block. Three of the 30
#     enter with round-6 fixes certified fresh: q206 (channel domain =
#     oracle's ch CTE), q211 (digest AND count equality), q213 (fixed
#     tranche COUNT — bounded window; new tranche axis ⇒ new oracle,
#     fine because q213 was never driver-certified);
#   - the remaining 17 slots are r02-VINTAGE RE-CERTIFICATION: names
#     whose last green driver row is round 2 (three rounds old),
#     cheapest first to fit the budget.
# Round-7 window plan: the 7 round-6-new names (q220-q225, q39 — all
# strict+stability+7-partition+vanilla green this round, certify the
# round after they land) + the 29 remaining r02-vintage names
# (q105/q106/q118/q124/q149/q152/q153/q166/q167/q169/q170/q178/q24/
# q30/q31/q35/q36/q38/q45/q52/q53/q54/q65/q74/q82/q83/q88/q89/q91)
# + the 3 sentinels = 39 of ~50; spend the rest on r03-vintage,
# oldest first.
PRIORITY = [
    "q01_pricing_summary",
    "q21_tumbling_ohlcv",
    "q25_asof_join",
    "q06_rollup",
    "q209_source_digest",
    "q219_ivf_cell_audit",
    "q204_loo_target_encoding",
    "q216_join_size_estimate",
    "q201_bfs_hub_distance",
    "q214_sequence_support",
    "q215_link_prediction",
    "q217_best_split",
    "q205_feature_hashing",
    "q198_touch_attribution",
    "q207_quantile_normalize",
    "q202_sorted_neighborhood",
    "q218_dedup_yield",
    "q203_sax_motifs",
    "q196_kmv_set_sketch",
    "q194_stream_dedup",
    "q213_coverage_curve",
    "q206_markov_attribution",
    "q200_label_propagation",
    "q197_kn_surprisal",
    "q210_source_contamination",
    "q208_jl_certificate",
    "q212_seasonal_mad_outliers",
    "q193_stream_rolling_24h",
    "q211_stream_digest",
    "q195_stream_transitions",
    "q192_stream_klines",
    "q199_stream_kmv",
    "q191_stream_asof_enrich",
    "q44_ngram_jaccard",
    "q42_fingerprint",
    "q41_lang_id",
    "q20_json_decode_filter",
    "q80_text_scrub",
    "q47_bpe_token_count",
    "q165_int8_quantize",
    "q40_text_quality",
    "q43_dedup_exact",
    "q164_bpe_merge_step",
    "q77_cohort_retention",
    "q50_ann_brute_topk",
    "q73_latest_snapshot",
    "q147_error_window_attribution",
    "q04_topk_per_group",
    "q76_dau_new_returning",
    "q78_funnel",
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
