"""Distributed graph propagation operators (PageRank-style).

Complements ``operators/dedup.connected_components`` (the other
iterative-graph op in this engine): CC converges a label fixpoint,
PageRank runs a FIXED number of damped propagation rounds, so the
result is deterministic and DuckDB-oracle-checkable by unrolling the
iterations as chained CTEs.

Scale design (100 TB / 1000 executors):
- The edge list is the big side. It is hash-partitioned by ``src``
  ONCE and localCheckpoint'ed; every round's edges⨝ranks join then
  reuses that partitioning (LogicalRDD preserves outputPartitioning),
  so each iteration shuffles only the rank vector (O(nodes), small),
  never the edges (O(edges), huge).
- Out-degrees are folded into the edge list up front
  (``weight = 1/outdeg``), so the per-round join is a single
  equi-join + groupBy — two narrow stages per round.
- Ranks are localCheckpoint'ed every ``checkpoint_interval`` rounds,
  NOT every round: each round's output feeds exactly one consumer, so
  a lazy chain evaluates each stage once in a single job — eager
  per-round checkpoints would serialize the run into one job per
  round (measured 2-3× slower at 3 iterations). The periodic
  checkpoint only bounds plan/lineage depth for large iteration
  counts (the connected-components lesson applies there).

The reference never computes graph metrics; this is a north-star
addition (SURVEY §2.9) for corpus curation — rank domains/hosts by
link structure before sampling training data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    iterations: int = 3,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
    partitions: int | None = None,
    checkpoint_interval: int = 5,
) -> DataFrame:
    """Fixed-iteration PageRank on a directed edge list.

    Every node is assumed to have out-degree ≥ 1 (symmetrize the edge
    list for undirected graphs — then dangling-mass redistribution is
    unnecessary and the formula stays the portable
    ``r' = (1-d) + d * Σ_in r/outdeg``). Returns (node, rank).
    """
    n_part = partitions or edges.sparkSession.conf.get(
        "spark.sql.shuffle.partitions"
    )
    deg = edges.groupBy(src).agg(F.count("*").alias("outdeg"))
    # fold 1/outdeg into the edges once; repartition by src so each
    # round's join reuses this layout instead of re-shuffling edges
    weighted = (
        edges.join(deg, src)
        .select(
            F.col(src).alias("src"),
            F.col(dst).alias("dst"),
            (F.lit(1.0) / F.col("outdeg")).alias("w"),
        )
        .repartition(int(n_part), "src")
        .localCheckpoint(eager=True)
    )
    ranks = deg.select(F.col(src).alias("node"), F.lit(1.0).alias("rank"))
    for i in range(1, iterations + 1):
        contribs = weighted.join(
            ranks, weighted["src"] == ranks["node"], "inner"
        ).select("dst", (F.col("rank") * F.col("w")).alias("contrib"))
        ranks = (
            contribs.groupBy("dst")
            .agg(
                (
                    F.lit(1.0 - damping) + F.lit(damping) * F.sum("contrib")
                ).alias("rank")
            )
            .select(F.col("dst").alias("node"), "rank")
        )
        if i % checkpoint_interval == 0 and i < iterations:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks
