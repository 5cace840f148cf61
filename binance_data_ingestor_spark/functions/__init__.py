"""Public column-function registry.

The engine's reusable column expressions in one import, grouped the way
`pyspark.sql.functions` groups built-ins. Everything here is a Column →
Column (or DataFrame → DataFrame) transform usable in both batch and
streaming plans; none of it creates shuffles on its own.

>>> from binance_data_ingestor_spark import functions as EF
>>> df.select(EF.cosine("vec_a", "vec_b"))
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# vector math (similarity search)
from ..operators.similarity import (  # noqa: F401
    cosine,
    dot,
    hamming_topk,
    hyperplanes,
    pca_project,
    sign_lsh_bucket,
    sign_signature,
)

# text analysis
from ..operators.text import (  # noqa: F401
    BPE_SPLIT_PATTERN,
    fingerprint,
    lang_guess,
    normalized_text,
    token_count,
    tokens,
)

# dedup primitives
from ..operators.dedup import minhash_signature, with_shingles  # noqa: F401

# distributed ordering primitives (DataFrame → DataFrame, one keyed
# shuffle each — exposed here because they replace the single-partition
# global window, the most common hand-rolled scale bug)
from ..operators.partitioning import (  # noqa: F401
    with_global_cumsum,
    with_global_ntile,
    with_global_rank,
    with_global_runmax,
    with_range_bucket,
)

# frequency sketching (batch MG summaries + the shared ingest kernel
# the streaming per-key operator builds on)
from ..operators.frequent import heavy_hitters, mg_ingest  # noqa: F401

# distinct/set-operation sketching — batch KMV build + the streaming
# twin (O(k) keyed state; final snapshot equals the batch sketch
# EXACTLY — order-independent k-minimum set, certified by q199)
from ..operators.kmv import kmv_sketch, u60  # noqa: F401
from ..streaming.stateful import kmv_stream, xor_digest_stream  # noqa: F401

# iterative graph propagation (DataFrame → DataFrame; each round
# shuffles only the O(nodes) state vector against a once-checkpointed
# src-partitioned edge list — see operators/graph.py)
from ..operators.graph import (  # noqa: F401
    bfs_hops,
    k_core,
    label_propagation,
    pagerank,
    triangle_stats,
)

# as-of enrichment — batch (full merge_asof surface) and its streaming
# twin (watermarked keyed-state backward as-of; see
# streaming/asof_enrich.py for the semantics contract)
from ..operators.asof import asof_join  # noqa: F401
from ..streaming.asof_enrich import asof_enrich_stream  # noqa: F401

# order-book / market data
from ..sinks.redis_sink import redis_key  # noqa: F401


def best_level(side: Column | str, field: str = "price") -> Column:
    """First (best) level of a bids/asks array-of-structs column."""
    c = F.col(side) if isinstance(side, str) else side
    return F.element_at(c, 1).getField(field)


def mid_price(best_bid: Column, best_ask: Column) -> Column:
    return (best_bid + best_ask) / 2


def spread(best_bid: Column, best_ask: Column) -> Column:
    return best_ask - best_bid


def epoch_ms(ts: Column | str) -> Column:
    """Timestamp → Binance-style epoch milliseconds."""
    return F.unix_millis(F.col(ts) if isinstance(ts, str) else ts)
