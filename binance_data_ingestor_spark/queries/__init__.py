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
# Round-9 rotation (after round 8's 50/50-green window brought cumulative
# certification to 235/235 of the round-8-start registry):
#   - 3 cross-family sentinels re-scored every round (q01/q21/q25);
#   - the 47-name GOAL BLOCK, cheapest-first so a runtime-budgeted cut
#     cannot cost the round its goal: the 16 round-8-new names
#     (q236-q251 — never driver-scored; "certify the round after it
#     lands" convention; green ⇒ cumulative 251/251 of the
#     round-9-start registry) merged with the 31 CHEAPEST of the 44
#     r04-VINTAGE names whose last green driver row is round 4
#     (five rounds old).
# Round-10 window plan: 3 sentinels + the 18 round-9-new names
# (q252-q255, q257, q259-q271 — certify the round after they land) +
# the remaining 13 r04-vintage names (q69/q130/q133/q186/q175/q98/
# q116/q117/q132/q148/q86/q184/q26, ~17.7 s total), retiring the r04
# vintage entirely = 34 names; the remaining ~16 slots go to the
# oldest r05-vintage names cheapest-first.
PRIORITY = [
    "q01_pricing_summary",
    "q21_tumbling_ohlcv",
    "q25_asof_join",
    "q168_benford_audit",
    "q128_k_anonymity",
    "q97_negative_sampling",
    "q112_max_drawdown",
    "q79_value_histogram",
    "q140_purge_audit",
    "q136_corr_matrix",
    "q185_hard_negatives",
    "q114_chi_square",
    "q245_assortativity",
    "q250_wilson_ci",
    "q85_equidepth_bins",
    "q237_amihud",
    "q120_transition_matrix",
    "q121_funnel_timing",
    "q176_woe_iv",
    "q111_ewma",
    "q107_rolling_distinct_users",
    "q115_snapshot_diff",
    "q101_token_entropy",
    "q156_windowed_funnel",
    "q100_token_mi",
    "q94_psi_drift",
    "q139_event_trigrams",
    "q95_winsorize",
    "q134_skew_report",
    "q119_incremental_agg",
    "q87_grouped_split",
    "q84_block_dedup_reconstruct",
    "q141_d7_retention",
    "q183_epoch_shuffle",
    "q137_session_entry_exit",
    "q68_decontaminate",
    "q162_multi_touch_attribution",
    "q249_term_burstiness",
    "q246_ar1_halflife",
    "q247_nucleus_vocab",
    "q240_rendezvous_shards",
    "q241_haar_energy",
    "q236_vpin",
    "q243_edge_support",
    "q248_cvm_drift",
    "q244_variance_ratio",
    "q239_weighted_percentiles",
    "q242_conformal",
    "q238_spearman",
    "q251_stream_vpin",
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
