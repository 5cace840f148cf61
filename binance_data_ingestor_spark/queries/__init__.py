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
# Round-8 rotation (after round 7's 50/50-green window brought cumulative
# certification to 225/225 of the round-7-start registry):
#   - 3 cross-family sentinels re-scored every round (q01/q21/q25);
#   - the 44-name GOAL BLOCK, cheapest-first so a runtime-budgeted cut
#     cannot cost the round its goal: the 10 round-7-new names
#     (q226-q235 — never driver-scored; "certify the round after it
#     lands" convention; green ⇒ cumulative 235/235 of the
#     round-8-start registry) merged with the 34 r03-VINTAGE names
#     whose last green driver row is round 3 (five rounds old:
#     q110/q138/q142/q143/q145/q146/q150/q151/q154/q157/q158/q159/
#     q160/q161/q163/q171/q174/q179/q180/q181/q182/q27/q46/q51/q63/
#     q64/q67/q71/q75/q81/q90/q92/q93/q96);
#   - the remaining 3 slots are r04-VINTAGE RE-CERTIFICATION,
#     cheapest first (q58/q102/q172).
# Round-9 window plan: 3 sentinels + the 15 round-8-new names
# (q236-q245 + q246-q250 — certify the round after they land) + the
# 32 cheapest r04-vintage names = 50; round 10 takes the remaining
# 15 r04-vintage plus whatever lands in round 9, retiring r04 fully.
PRIORITY = [
    "q01_pricing_summary",
    "q21_tumbling_ohlcv",
    "q25_asof_join",
    "q232_diversity_indices",
    "q157_asof_tolerance",
    "q174_purged_tscv",
    "q154_top_supplier",
    "q227_calibration",
    "q81_pii_mask",
    "q146_order_count_distribution",
    "q90_pit_features",
    "q63_decode_media",
    "q64_resize_raster",
    "q75_upsert_audit",
    "q181_rank_transform",
    "q158_kcore",
    "q171_rolling_hll",
    "q96_rrf_fusion",
    "q71_length_buckets",
    "q92_embedding_covariance",
    "q234_effective_rank",
    "q150_token_balanced_shards",
    "q46_simhash",
    "q228_zipf_slope",
    "q51_cosine_neardup",
    "q110_peak_concurrency",
    "q160_rolling_median",
    "q161_quality_representative",
    "q230_kyle_lambda",
    "q179_ppm_roundtrip",
    "q67_pq_kmeans_train",
    "q145_waiting_suppliers",
    "q142_abc_classification",
    "q93_bm25_retrieval",
    "q138_skipgram_pmi",
    "q231_roll_spread",
    "q235_vocab_growth",
    "q182_ivfpq_topk",
    "q229_ngram_containment",
    "q143_dsir_weights",
    "q163_rfm_segments",
    "q180_json_schema_profile",
    "q151_lsh_recall_certificate",
    "q27_series_topk",
    "q226_hits",
    "q159_prefix_jaccard",
    "q233_containment_prefix",
    "q58_pack_chunks",
    "q102_weighted_sample",
    "q172_label_kappa",
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
