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
# Round-3 rotation: rounds 1+2 certified 85 distinct queries; 44 of the
# round-2 window's 50 slots held names already green in a prior round.
# This window converts local strict-sweep claims into driver-certified
# fact for 45 FIRST-TIME names (driver-certified coverage 85 → ~130 of
# 180) while keeping regression signal:
#   - 3 cross-family sentinels re-scored every round (q01/q21/q25);
#   - q142/q27 re-certify this round's plan rewrites of already-green
#     queries (two-pass cumsum, projection-bound closest pairs);
#   - q71/q132/q133/q163/q63/q159/q177 are both first-time AND changed
#     this round (two-pass ntile/rank, real-codec decode, positional
#     prefix filter, view-free CUSUM);
#   - q67 enters with its new µ-grid Lloyd oracle (first iterative-
#     training query to be hash-certified);
#   - q182 is this round's new composed IVF-PQ operator (certify new
#     surface immediately rather than a round later).
# Expensive driver-loop queries (q26 streaming — the only remaining
# rows-only entry — q99 pagerank, q129 bootstrap, q144 dup-spans) stay
# out of the window so a runtime-budgeted cut still reaches 50; slower
# in-window entries sit at the tail for the same reason. Every family
# keeps ≥1 in-window representative (the round-2 reps it displaced are
# all driver-green in CORRECTNESS_r01/r02).
PRIORITY = [
    "q01_pricing_summary",
    "q21_tumbling_ohlcv",
    "q25_asof_join",
    "q142_abc_classification",
    "q27_series_topk",
    "q71_length_buckets",
    "q132_decile_lift",
    "q133_auc_ranksum",
    "q163_rfm_segments",
    "q63_decode_media",
    "q159_prefix_jaccard",
    "q177_cusum",
    "q145_waiting_suppliers",
    "q146_order_count_distribution",
    "q154_top_supplier",
    "q155_dormant_capital",
    "q157_asof_tolerance",
    "q46_simhash",
    "q49_tfidf_topterms",
    "q70_vocab",
    "q72_chunking",
    "q138_skipgram_pmi",
    "q143_dsir_weights",
    "q150_token_balanced_shards",
    "q161_quality_representative",
    "q93_bm25_retrieval",
    "q96_rrf_fusion",
    "q131_ab_test",
    "q174_purged_tscv",
    "q90_pit_features",
    "q51_cosine_neardup",
    "q66_pq_topk",
    "q151_lsh_recall_certificate",
    "q181_rank_transform",
    "q92_embedding_covariance",
    "q108_editdist_join",
    "q60_media_metadata",
    "q64_resize_raster",
    "q179_ppm_roundtrip",
    "q75_upsert_audit",
    "q173_scd2_temporal_join",
    "q110_peak_concurrency",
    "q171_rolling_hll",
    "q56_stratified_sample",
    "q81_pii_mask",
    "q67_pq_kmeans_train",
    "q158_kcore",
    "q160_rolling_median",
    "q182_ivfpq_topk",
    "q180_json_schema_profile",
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
    # Remainder: oracle-backed queries first (hash-checkable); q26 —
    # since q67's µ-grid oracle landed, the registry's ONLY rows-only
    # entry, and a slow streaming replay — dead last, so a driver that
    # scores past 50 entries keeps landing on hard-checkable, fast
    # queries.
    ordered.update(
        (n, f) for n, f in queries.items() if n not in ordered and n in oracles
    )
    ordered.update((n, f) for n, f in queries.items() if n not in ordered)
    return ordered, oracles
