"""Graph-propagation queries: PageRank over the customer–supplier
bipartite graph.

The reference has no graph surface; this is a north-star curation
operator (SURVEY §2.9 — rank hosts/domains by link structure before
drawing training data). The fixed iteration count makes the result
deterministic, so the DuckDB oracle simply unrolls the rounds as
chained CTEs — the strongest check an iterative algorithm can get
(connected components q54 only gets rows-only checks for its
data-dependent round count; here every rank value is hash-compared).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.graph import pagerank, triangle_stats
from .util import copurchase_pairs, load

_ITERS = 3
_SUPP_BASE = 1_000_000  # supplier node ids offset above customer keys


# --------------------------------------------------------------------------
# q99 — 3-round damped PageRank on the (customer)—(supplier) graph
# induced by orders⨝lineitem, symmetrized. Edge construction is two
# shuffles (join + distinct); each round then shuffles only the
# O(nodes) rank vector against the src-partitioned checkpointed edge
# list (see operators/graph.py). Output: per-supplier rank.
# --------------------------------------------------------------------------
def q99_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    pairs = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .select("o_custkey", "l_suppkey")
        .distinct()
    )
    fwd = pairs.select(
        F.col("o_custkey").alias("src"),
        (F.lit(_SUPP_BASE) + F.col("l_suppkey")).alias("dst"),
    )
    edges = fwd.unionAll(
        fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    ranks = pagerank(edges, iterations=_ITERS)
    return ranks.filter(F.col("node") >= _SUPP_BASE).select(
        (F.col("node") - _SUPP_BASE).alias("suppkey"),
        F.round("rank", 6).alias("rank_r"),
    )


def _sql_round(i: int) -> str:
    return (
        f"r{i} AS (SELECT e.dst AS node,\n"
        f"              0.15 + 0.85 * sum(p.r * (1.0 / d.outdeg)) AS r\n"
        f"       FROM e JOIN r{i - 1} p ON e.src = p.node\n"
        f"              JOIN deg d ON e.src = d.src\n"
        f"       GROUP BY e.dst)"
    )


Q99_SQL = (
    f"""
WITH p AS (SELECT DISTINCT o_custkey AS c, l_suppkey AS s
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
e AS (SELECT c AS src, {_SUPP_BASE} + s AS dst FROM p
      UNION ALL SELECT {_SUPP_BASE} + s AS src, c AS dst FROM p),
deg AS (SELECT src, count(*) AS outdeg FROM e GROUP BY src),
r0 AS (SELECT src AS node, 1.0 AS r FROM deg),
"""
    + ",\n".join(_sql_round(i) for i in range(1, _ITERS + 1))
    + f"""
SELECT node - {_SUPP_BASE} AS suppkey, round(r, 6) AS rank_r
FROM r{_ITERS} WHERE node >= {_SUPP_BASE}
"""
)


# --------------------------------------------------------------------------
# q105 — triangle census of the part co-purchase graph. Nodes are
# parts; an undirected edge connects two parts that appear together in
# ≥2 distinct orders (the weight floor sparsifies away one-off
# co-occurrence noise, the same move a 100 TB run needs to keep the
# wedge space bounded). The operator enumerates wedges on a
# degree-ordered orientation (operators/graph.triangle_stats) so hub
# parts can't blow up the intermediate; the DuckDB oracle uses the
# naive key-ordered 3-way join — triangle count is
# orientation-invariant, which is exactly what makes it checkable.
# --------------------------------------------------------------------------
def q105_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    # edge list shared with q106 (util.copurchase_pairs): the distinct
    # basket set and pair counts are localCheckpoint'ed once per session,
    # so running the census and the lift query costs one edge build
    _, pairs = copurchase_pairs(spark, sf_dir)
    return triangle_stats(pairs.select("u", "v"))


Q105_SQL = """
WITH pr AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
e AS (SELECT a.l_partkey AS u, b.l_partkey AS v
      FROM pr a JOIN pr b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING count(*) >= 2),
deg AS (SELECT n, count(*) AS deg FROM
          (SELECT u AS n FROM e UNION ALL SELECT v AS n FROM e)
        GROUP BY n),
tri AS (SELECT count(*) AS n_triangles
        FROM e e1 JOIN e e2 ON e2.u = e1.v
                  JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v)
SELECT CAST(sum(deg) / 2 AS BIGINT) AS n_edges,
       CAST(sum(deg * (deg - 1) / 2) AS BIGINT) AS n_wedges,
       (SELECT n_triangles FROM tri) AS n_triangles,
       round(3.0 * (SELECT n_triangles FROM tri)
             / sum(deg * (deg - 1) / 2), 6) AS global_cc
FROM deg
"""


# --------------------------------------------------------------------------
# q158 — k-core decomposition of the co-purchase graph (iterative
# peel): nodes surviving repeated removal of degree < K vertices, with
# their in-core degree. The peel FIXPOINT is deterministic, so — like
# q99's unrolled PageRank — the DuckDB oracle chains the rounds as
# CTEs; Spark iterates to the fixpoint with a monotone edge-count
# certificate (operators/graph.k_core), and the oracle unrolls MORE
# rounds than any fixture needs (20; sf0.01 converges in 11), which is
# equivalent because peeling is idempotent at the fixpoint. Edge list
# shared with q105/q106 via the session artifact.
# --------------------------------------------------------------------------
KCORE_K = 3
_KCORE_ORACLE_ROUNDS = 20


def q158_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import k_core

    _, pairs = copurchase_pairs(spark, sf_dir)
    return k_core(pairs.select("u", "v"), KCORE_K)


def _kcore_sql(k: int, rounds: int) -> str:
    parts = [
        """WITH pr AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
e0 AS MATERIALIZED (SELECT a.l_partkey AS u, b.l_partkey AS v
       FROM pr a JOIN pr b
         ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
       GROUP BY 1, 2 HAVING count(*) >= 2)"""
    ]
    for i in range(rounds):
        parts.append(
            f""",
keep{i} AS MATERIALIZED (SELECT n FROM (SELECT u AS n FROM e{i} UNION ALL SELECT v AS n FROM e{i})
            GROUP BY n HAVING count(*) >= {k}),
e{i + 1} AS MATERIALIZED (SELECT * FROM e{i}
             WHERE u IN (SELECT n FROM keep{i}) AND v IN (SELECT n FROM keep{i}))"""
        )
    parts.append(
        f"""
SELECT n, CAST(count(*) AS BIGINT) AS core_deg
FROM (SELECT u AS n FROM e{rounds} UNION ALL SELECT v AS n FROM e{rounds})
GROUP BY n"""
    )
    return "".join(parts)


Q158_SQL = _kcore_sql(KCORE_K, _KCORE_ORACLE_ROUNDS)


# --------------------------------------------------------------------------
# q200 — deterministic synchronous label-propagation communities on the
# co-purchase graph (the 4th iterative-graph pattern: PageRank = fixed
# damped rounds, k-core = monotone peel, connected components = min
# fixpoint, LPA = majority fixpoint). Each node adopts its neighbors'
# MAJORITY label per round, ties to the smallest label — that
# determinism is what lets the DuckDB oracle unroll the same rounds as
# chained CTEs and hash-compare every final assignment. Edge list
# shared with q105/q106/q158 via the session artifact; per round the
# only shuffles are the O(nodes) label vector join + two partially
# aggregable group-bys.
# --------------------------------------------------------------------------
_LPA_ROUNDS = 4


def q200_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import label_propagation

    _, pairs = copurchase_pairs(spark, sf_dir)
    return label_propagation(pairs.select("u", "v"), _LPA_ROUNDS).select(
        F.col("node").alias("part"), "community"
    )


def _lpa_sql(rounds: int) -> str:
    return (
        f"WITH {_lpa_ctes(rounds)}"
        f"\nSELECT node AS part, lab AS community FROM l{rounds}"
    )


def _lpa_ctes(rounds: int) -> str:
    """CTE chain ending in ``l{rounds} (node, lab)`` — shared by
    Q200_SQL and Q281_SQL so the modularity oracle scores exactly
    q200's communities."""
    parts = [
        """pr AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
p AS MATERIALIZED (SELECT a.l_partkey AS u, b.l_partkey AS v
       FROM pr a JOIN pr b
         ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
       GROUP BY 1, 2 HAVING count(*) >= 2),
e AS MATERIALIZED (SELECT u AS src, v AS dst FROM p
      UNION ALL SELECT v AS src, u AS dst FROM p),
l0 AS (SELECT DISTINCT src AS node, src AS lab FROM e)"""
    ]
    for i in range(1, rounds + 1):
        parts.append(
            f""",
c{i} AS (SELECT e.dst, l.lab, count(*) AS cnt
       FROM e JOIN l{i - 1} l ON e.src = l.node GROUP BY 1, 2),
m{i} AS (SELECT dst, max(cnt) AS mc FROM c{i} GROUP BY dst),
l{i} AS MATERIALIZED (SELECT c.dst AS node, min(c.lab) AS lab
       FROM c{i} c JOIN m{i} m ON c.dst = m.dst AND c.cnt = m.mc
       GROUP BY 1)"""
        )
    return "".join(parts)


Q200_SQL = _lpa_sql(_LPA_ROUNDS)


# --------------------------------------------------------------------------
# q281 — MODULARITY certificate for the q200 label-propagation
# communities: Newman's Q = Σ_c [ e_c/m − (d_c/2m)² ] over the same
# co-purchase graph — the number that says whether the community
# structure LPA found is real (Q ≫ 0) or no better than the degree-
# preserving null model (Q ≈ 0). Every clustering the pipeline ships
# should carry this score; it is the q151/q273 certificate discipline
# applied to graph partitions. Exactness: e_c (intra-community
# edges), d_c (total degree) and m are exact int64 from equi-joins on
# the checkpointed edge list; each community's term is one IEEE chain
# over identical ints, and the global Q folds the community terms in
# PINNED community-id order (q268 discipline). The oracle rebuilds the
# SAME communities via the shared _lpa_ctes chain, so the driver
# compare certifies LPA determinism AND the modularity arithmetic.
# Scale: degrees and intra-edge counts are one shuffle each on the
# edge list; the community summary is communities-sized; m and the
# fold are 1-row broadcast crossings (census-adjudicated).
# --------------------------------------------------------------------------
def q281_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import label_propagation

    _, pairs = copurchase_pairs(spark, sf_dir)
    edges = pairs.select("u", "v")
    comm = label_propagation(edges, _LPA_ROUNDS)  # (node, community)
    deg = (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
    )
    cstats = (
        comm.join(deg, "node")
        .groupBy("community")
        .agg(F.count("*").alias("n_nodes"), F.sum("deg").alias("d_tot"))
    )
    cu = comm.select(F.col("node").alias("u"), F.col("community").alias("cu"))
    cv = comm.select(F.col("node").alias("v"), F.col("community").alias("cv"))
    intra = (
        edges.join(cu, "u")
        .join(cv, "v")
        .filter(F.col("cu") == F.col("cv"))
        .groupBy(F.col("cu").alias("community"))
        .agg(F.count("*").alias("e_intra"))
    )
    m1 = edges.agg(F.count("*").alias("m"))
    base = (
        cstats.join(intra, "community", "left")
        .na.fill({"e_intra": 0})
        .crossJoin(F.broadcast(m1))
    )
    md = F.col("m").cast("double")
    qc = F.col("e_intra").cast("double") / md - (
        F.col("d_tot").cast("double") / (F.lit(2.0) * md)
    ) * (F.col("d_tot").cast("double") / (F.lit(2.0) * md))
    terms = base.select(
        "community", "n_nodes", "d_tot", "e_intra", "m", qc.alias("qc")
    ).localCheckpoint(eager=False)  # feeds the fold + the output rows
    fold = terms.agg(
        F.aggregate(
            F.array_sort(
                F.collect_list(
                    F.struct(F.col("community"), F.col("qc").alias("p"))
                )
            ),
            F.lit(0.0),
            lambda acc, x: acc + x["p"],
        ).alias("q_mod")
    )
    return (
        terms.crossJoin(F.broadcast(fold))
        .select(
            "community", "n_nodes", "d_tot", "e_intra", "m", "qc", "q_mod"
        )
    )


Q281_SQL = f"""
WITH {_lpa_ctes(_LPA_ROUNDS)},
comm AS (SELECT node, lab AS community FROM l{_LPA_ROUNDS}),
deg AS (SELECT src AS node, count(*) AS deg FROM e GROUP BY 1),
cstats AS (SELECT community, CAST(count(*) AS BIGINT) AS n_nodes,
                  CAST(sum(deg) AS BIGINT) AS d_tot
           FROM comm JOIN deg USING (node) GROUP BY 1),
intra AS (SELECT a.community, CAST(count(*) AS BIGINT) AS e_intra
          FROM p
          JOIN comm a ON a.node = p.u
          JOIN comm b ON b.node = p.v AND b.community = a.community
          GROUP BY 1),
mtot AS (SELECT CAST(count(*) AS BIGINT) AS m FROM p),
terms AS (
  SELECT community, n_nodes, d_tot, coalesce(e_intra, 0) AS e_intra, m,
         CAST(coalesce(e_intra, 0) AS DOUBLE) / CAST(m AS DOUBLE)
           - (CAST(d_tot AS DOUBLE) / (2.0 * CAST(m AS DOUBLE)))
             * (CAST(d_tot AS DOUBLE) / (2.0 * CAST(m AS DOUBLE))) AS qc
  FROM cstats LEFT JOIN intra USING (community) CROSS JOIN mtot),
fold AS (SELECT list_reduce(list(qc ORDER BY community), (x, y) -> x + y)
           AS q_mod FROM terms)
SELECT community, n_nodes, d_tot, e_intra, m, qc,
       (SELECT q_mod FROM fold) AS q_mod
FROM terms
"""


# --------------------------------------------------------------------------
# q201 — multi-source BFS hop distance to the nearest co-purchase HUB
# (degree ≥ 8 in the symmetrized pc≥2 graph): the curation move of
# scoring every item by its graph proximity to high-connectivity
# anchors (hub-distance is the classic crawl-frontier / seed-expansion
# metric). 5th iterative-graph pattern: frontier expansion. The Spark
# operator joins only the per-round FRONTIER against the once-
# checkpointed src-partitioned edge list (O(wave) shuffles); the
# oracle full-relaxes every settled node per round — a deliberately
# different evaluation order that provably computes the same min-hop
# function, so the hash-compare certifies iteration-order independence
# too. Nodes unreachable from any hub within 3 hops are absent (the
# operator contract).
# --------------------------------------------------------------------------
_BFS_HUB_DEG = 8
_BFS_HOPS = 3


def q201_bfs_hub_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import bfs_hops

    _, pairs = copurchase_pairs(spark, sf_dir)
    fwd = pairs.select(F.col("u").alias("src"), F.col("v").alias("dst"))
    edges = fwd.unionAll(
        fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    hubs = (
        edges.groupBy("src")
        .agg(F.count("*").alias("d"))
        .filter(F.col("d") >= _BFS_HUB_DEG)
        .select(F.col("src").alias("node"))
    )
    return bfs_hops(edges, hubs, _BFS_HOPS).select(
        F.col("node").alias("part"), "hop"
    )


def _bfs_sql(hub_deg: int, hops: int) -> str:
    parts = [
        f"""WITH pr AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
p AS (SELECT a.l_partkey AS u, b.l_partkey AS v
       FROM pr a JOIN pr b
         ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
       GROUP BY 1, 2 HAVING count(*) >= 2),
e AS MATERIALIZED (SELECT u AS src, v AS dst FROM p
      UNION ALL SELECT v AS src, u AS dst FROM p),
deg AS (SELECT src, count(*) AS d FROM e GROUP BY src),
d0 AS (SELECT src AS node, 0 AS hop FROM deg WHERE d >= {hub_deg})"""
    ]
    for i in range(1, hops + 1):
        parts.append(
            f""",
d{i} AS MATERIALIZED (SELECT node, min(h) AS hop FROM (
         SELECT node, hop AS h FROM d{i - 1}
         UNION ALL
         SELECT e.dst AS node, p.hop + 1 AS h
         FROM e JOIN d{i - 1} p ON e.src = p.node) GROUP BY node)"""
        )
    parts.append(
        f"""
SELECT node AS part, CAST(hop AS INT) AS hop FROM d{hops}"""
    )
    return "".join(parts)


Q201_SQL = _bfs_sql(_BFS_HUB_DEG, _BFS_HOPS)


# --------------------------------------------------------------------------
# q215 — link prediction on the co-purchase graph via Adamic–Adar: for
# every non-adjacent part pair at distance 2, score
# Σ_w 1/ln(deg(w)) over common neighbors w, and emit the top-50
# predicted links — the classic "products likely to be co-bought next"
# recommender readout, and the 6th graph pattern in the engine
# (propagation/peel/fixpoint/majority/frontier/now WEDGE SCORING).
# Scale shape: wedges enumerate at their CENTER w, so per-center work
# is deg(w)² — the deliberate _AA_MAX_DEG hub cap bounds it (the same
# move production link predictors make: sample or drop mega-hub
# neighborhoods, which only suppresses scores every candidate pair
# shares); existing edges drop via one anti-join; the top-50 is a
# TakeOrderedAndProject on (rounded score, u, v) — fully tie-broken,
# never a global sort. ln() parity: scores round to 6 dp AFTER the
# sum (the engine's ln-sum rule).
# --------------------------------------------------------------------------
_AA_MAX_DEG = 64
_AA_TOPK = 50


def q215_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    _, pairs = copurchase_pairs(spark, sf_dir)
    fwd = pairs.select(F.col("u").alias("src"), F.col("v").alias("dst"))
    sym = fwd.unionAll(
        fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint(eager=True)  # feeds degrees + both wedge legs
    deg = sym.groupBy("src").agg(F.count("*").alias("deg"))
    centers = deg.filter(
        (F.col("deg") >= 2) & (F.col("deg") <= _AA_MAX_DEG)
    ).withColumn(
        "w_inv", F.lit(1.0) / F.log(F.col("deg").cast("double"))
    )
    e = sym.join(F.broadcast(centers), "src").select(
        F.col("src").alias("w"), F.col("dst").alias("n"), "w_inv"
    )
    a, b = e.alias("a"), e.alias("b")
    cand = (
        a.join(b, "w")
        .filter(F.col("a.n") < F.col("b.n"))
        .groupBy(F.col("a.n").alias("u"), F.col("b.n").alias("v"))
        .agg(F.round(F.sum(F.col("a.w_inv")), 6).alias("aa_score_r"))
    )
    preds = cand.join(pairs.select("u", "v"), ["u", "v"], "left_anti")
    return preds.orderBy(
        F.desc("aa_score_r"), F.asc("u"), F.asc("v")
    ).limit(_AA_TOPK)


Q215_SQL = f"""
WITH pr AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
p AS MATERIALIZED (SELECT a.l_partkey AS u, b.l_partkey AS v
       FROM pr a JOIN pr b
         ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
       GROUP BY 1, 2 HAVING count(*) >= 2),
e AS MATERIALIZED (SELECT u AS src, v AS dst FROM p
      UNION ALL SELECT v AS src, u AS dst FROM p),
deg AS (SELECT src, count(*) AS deg FROM e GROUP BY src),
c AS (SELECT src AS w, dst AS n, 1.0 / ln(CAST(deg AS DOUBLE)) AS w_inv
      FROM e JOIN deg USING (src)
      WHERE deg >= 2 AND deg <= {_AA_MAX_DEG}),
cand AS (SELECT a.n AS u, b.n AS v, round(sum(a.w_inv), 6) AS aa_score_r
         FROM c a JOIN c b ON a.w = b.w AND a.n < b.n
         GROUP BY 1, 2),
preds AS (SELECT cand.* FROM cand
          LEFT JOIN p ON cand.u = p.u AND cand.v = p.v
          WHERE p.u IS NULL)
SELECT u, v, aa_score_r FROM preds
ORDER BY aa_score_r DESC, u ASC, v ASC
LIMIT {_AA_TOPK}
"""


# --------------------------------------------------------------------------
# q226 — HITS hubs & authorities on the customer→part purchase
# bipartite graph (Kleinberg's link-analysis twin to PageRank —
# authorities are parts bought by well-connected customers, hubs are
# customers who buy authoritative parts; the readout a marketplace
# uses to separate influential buyers from popular items). Exactness:
# with h0 ≡ 1 every unrolled iteration is a pure INTEGER sum —
# a1 = indegree, h1 = Σ a1 over a customer's parts, a2 = Σ h1,
# h2 = Σ a2 — so the scores are exact int64 on both engines (no FP
# accumulation-order issue at all, unlike double-weighted PageRank);
# the only floats are the final score/max divisions (single IEEE op
# over exact ints). Scale shape: each iteration is one equi-join of
# the edge list with a node-sized score table + a map-side-combinable
# groupBy — O(E) shuffle per round, the edge list localCheckpointed
# once; the two 1-ROW max aggregates broadcast (BNLJ adjudicated in
# plans_census); top-20 per side is TakeOrderedAndProject-bounded.
# Magnitude bound: a2 ≤ E·max_deg² — at 10^12 edges with deg ≤ 10^4
# still < 2^63 (documented domain bound, same class as q203's Σcents²).
# --------------------------------------------------------------------------
_HITS_TOPK = 20


def q226_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    # no checkpoint: the four iteration joins share the IDENTICAL
    # distinct subplan, so Spark reuses the one shuffle exchange
    # (ReusedExchange) — measured faster than materializing (5.4 s vs
    # 11.9 s cold at sf0.1; warm equal)
    edges = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .select(F.col("o_custkey").alias("c"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    a1 = edges.groupBy("p").agg(F.count("*").alias("a1"))
    h1 = (
        edges.join(a1, "p").groupBy("c").agg(F.sum("a1").alias("h1"))
    )
    a2 = (
        edges.join(h1, "c").groupBy("p").agg(F.sum("h1").alias("a2"))
    )
    h2 = (
        edges.join(a2, "p").groupBy("c").agg(F.sum("a2").alias("h2"))
    )

    def top(side: str, scores: DataFrame, id_col: str, s_col: str) -> DataFrame:
        from ..operators.partitioning import bounded_ordered_window

        mx = scores.agg(F.max(s_col).alias("mx"))
        # bounded window: the preceding limit() caps the frame at
        # _HITS_TOPK rows (TakeOrderedAndProject), so the single
        # partition is by construction, not degradation
        w = bounded_ordered_window(id_col, F.desc(s_col), F.asc(id_col))
        return (
            scores.orderBy(F.desc(s_col), F.asc(id_col))
            .limit(_HITS_TOPK)
            .withColumn("rank", F.row_number().over(w))
            .crossJoin(F.broadcast(mx))
            .select(
                F.lit(side).alias("side"),
                F.col(id_col).cast("long").alias("node_id"),
                "rank",
                F.col(s_col).cast("long").alias("score"),
                (F.col(s_col) / F.col("mx").cast("double")).alias("score_n"),
            )
        )

    return top("auth", a2, "p", "a2").unionByName(top("hub", h2, "c", "h2"))


Q226_SQL = f"""
WITH e AS (SELECT DISTINCT o_custkey AS c, l_partkey AS p
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
a1 AS (SELECT p, count(*) AS s FROM e GROUP BY p),
h1 AS (SELECT c, sum(s) AS s FROM e JOIN a1 USING (p) GROUP BY c),
a2 AS (SELECT p, CAST(sum(s) AS BIGINT) AS s FROM e JOIN h1 USING (c) GROUP BY p),
h2 AS (SELECT c, CAST(sum(s) AS BIGINT) AS s FROM e JOIN a2 USING (p) GROUP BY c),
ta AS (SELECT 'auth' AS side, p AS node_id, s,
              row_number() OVER (ORDER BY s DESC, p ASC) AS rank
       FROM a2),
th AS (SELECT 'hub' AS side, c AS node_id, s,
              row_number() OVER (ORDER BY s DESC, c ASC) AS rank
       FROM h2),
u AS (SELECT * FROM ta WHERE rank <= {_HITS_TOPK}
      UNION ALL SELECT * FROM th WHERE rank <= {_HITS_TOPK})
SELECT side, node_id, rank, s AS score,
       s / CAST((SELECT max(s) FROM a2) AS DOUBLE) AS score_n
FROM u WHERE side = 'auth'
UNION ALL
SELECT side, node_id, rank, s AS score,
       s / CAST((SELECT max(s) FROM h2) AS DOUBLE) AS score_n
FROM u WHERE side = 'hub'
"""


# --------------------------------------------------------------------------
# q243 — edge-support census (the k-truss primitive) of the
# co-purchase graph: support(e) = #triangles containing e, computed by
# operators/graph.edge_support on the degree-ordered orientation (the
# q105 wedge machinery, hub-proof at 100 TB), then rolled up into the
# support HISTOGRAM with a descending cumulative — n_edges_ge(s) =
# edges with support ≥ s, the upper bound on every (s+2)-truss's edge
# set (peeling only removes support). The cumulative window runs over
# the histogram (≤ max-support rows — support-bounded, never
# edge-sized). Exact integers end to end; the oracle enumerates
# triangles with the naive key-ordered 3-way join — per-edge support
# is orientation-invariant, which is what makes the census checkable.
# Edge list shared with q105/q106/q158/q226 via the session artifact.
# --------------------------------------------------------------------------
def q243_edge_support(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import edge_support
    from ..operators.partitioning import with_global_cumsum, with_range_bucket

    _, pairs = copurchase_pairs(spark, sf_dir)
    sup = edge_support(pairs.select("u", "v"))
    # the cumulative runs over the HISTOGRAM (≤ max-support rows), but
    # even there the keyless two-pass cumsum is used instead of a
    # partition-less window — same no-single-partition-WindowExec
    # doctrine as _bucket_offsets (the bucket summary is collected
    # driver-side; the per-bucket windows stay partitioned)
    hist = (
        sup.groupBy("support")
        .agg(F.count("*").alias("n_edges"))
        .localCheckpoint(eager=False)  # span agg + cumsum + join
    )
    b = with_range_bucket(hist, -F.col("support"), bucket_col="__rb")
    return with_global_cumsum(
        b,
        [],
        [F.desc("support")],
        "n_edges",
        bucket=F.col("__rb"),
        out_col="n_edges_ge",
    ).select("support", "n_edges", "n_edges_ge")


Q243_SQL = """
WITH pr AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
e AS MATERIALIZED (SELECT a.l_partkey AS u, b.l_partkey AS v
      FROM pr a JOIN pr b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING count(*) >= 2),
tri AS (SELECT e1.u AS a, e1.v AS b, e2.v AS c
        FROM e e1 JOIN e e2 ON e2.u = e1.v
                  JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v),
te AS (SELECT a AS u, b AS v FROM tri
       UNION ALL SELECT b, c FROM tri
       UNION ALL SELECT a, c FROM tri),
sup AS (SELECT e.u, e.v, count(te.u) AS support
        FROM e LEFT JOIN te ON te.u = e.u AND te.v = e.v
        GROUP BY 1, 2),
hist AS (SELECT support, count(*) AS n_edges FROM sup GROUP BY 1)
SELECT CAST(support AS BIGINT) AS support,
       CAST(n_edges AS BIGINT) AS n_edges,
       CAST(sum(n_edges) OVER (ORDER BY support DESC
                               ROWS UNBOUNDED PRECEDING) AS BIGINT)
         AS n_edges_ge
FROM hist
"""


# --------------------------------------------------------------------------
# q245 — degree assortativity of the co-purchase graph (Newman 2002):
# the Pearson correlation of endpoint degrees over the DIRECTED edge
# multiset (each undirected edge counted in both orientations — the
# standard convention, which makes Σx = Σy and var_x = var_y so one
# pair of sums serves both axes). r < 0 = hubs attach to leaves
# (disassortative, typical of co-occurrence graphs), r > 0 = rich
# club. Everything reduces to five exact int64 sums computed in ONE
# pass over the edges⨝degrees join — per edge the both-orientation
# contributions are du+dv, du²+dv², 2·du·dv, so the edge list is never
# duplicated. r is one fixed-order IEEE expression over the exact
# sums (products in DOUBLE — the q230 overflow note), nullif on the
# regular-graph degenerate (all degrees equal → var 0 → NULL on both
# engines). Edge list shared via the session artifact.
# --------------------------------------------------------------------------
def q245_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    _, pairs = copurchase_pairs(spark, sf_dir)
    edges = pairs.select("u", "v")
    deg = (
        edges.select(F.col("u").alias("n"))
        .unionAll(edges.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count("*").alias("deg"))
    )
    j = edges.join(
        deg.withColumnRenamed("n", "u").withColumnRenamed("deg", "du"), "u"
    ).join(deg.withColumnRenamed("n", "v").withColumnRenamed("deg", "dv"), "v")
    agg = j.agg(
        (F.count("*") * 2).alias("m_ends"),
        F.sum(F.col("du") + F.col("dv")).alias("sum_d"),
        F.sum(F.col("du") * F.col("du") + F.col("dv") * F.col("dv")).alias(
            "sum_d2"
        ),
        (F.sum(F.col("du") * F.col("dv")) * 2).alias("sum_prod"),
    )
    m = F.col("m_ends").cast("double")
    sd = F.col("sum_d").cast("double")
    return agg.select(
        "m_ends",
        "sum_d",
        "sum_d2",
        "sum_prod",
        (
            (m * F.col("sum_prod").cast("double") - sd * sd)
            / F.nullif(m * F.col("sum_d2").cast("double") - sd * sd, F.lit(0.0))
        ).alias("assortativity_r"),
    )


Q245_SQL = """
WITH pr AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
e AS (SELECT a.l_partkey AS u, b.l_partkey AS v
      FROM pr a JOIN pr b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING count(*) >= 2),
deg AS (SELECT n, count(*) AS deg FROM
          (SELECT u AS n FROM e UNION ALL SELECT v AS n FROM e)
        GROUP BY n),
a AS (SELECT count(*) * 2 AS m_ends,
             sum(du.deg + dv.deg) AS sum_d,
             sum(du.deg * du.deg + dv.deg * dv.deg) AS sum_d2,
             sum(du.deg * dv.deg) * 2 AS sum_prod
      FROM e JOIN deg du ON du.n = e.u JOIN deg dv ON dv.n = e.v)
SELECT CAST(m_ends AS BIGINT) AS m_ends,
       CAST(sum_d AS BIGINT) AS sum_d,
       CAST(sum_d2 AS BIGINT) AS sum_d2,
       CAST(sum_prod AS BIGINT) AS sum_prod,
       (CAST(m_ends AS DOUBLE) * CAST(sum_prod AS DOUBLE)
          - CAST(sum_d AS DOUBLE) * CAST(sum_d AS DOUBLE))
         / nullif(CAST(m_ends AS DOUBLE) * CAST(sum_d2 AS DOUBLE)
                    - CAST(sum_d AS DOUBLE) * CAST(sum_d AS DOUBLE),
                  0.0) AS assortativity_r
FROM a
"""


QUERIES = {
    "q99_pagerank": q99_pagerank,
    "q105_triangle_count": q105_triangle_count,
    "q158_kcore": q158_kcore,
    "q200_label_propagation": q200_label_propagation,
    "q281_modularity": q281_modularity,
    "q201_bfs_hub_distance": q201_bfs_hub_distance,
    "q215_link_prediction": q215_link_prediction,
    "q226_hits": q226_hits,
    "q243_edge_support": q243_edge_support,
    "q245_assortativity": q245_assortativity,
}

ORACLES = {
    "q99_pagerank": Q99_SQL,
    "q105_triangle_count": Q105_SQL,
    "q158_kcore": Q158_SQL,
    "q200_label_propagation": Q200_SQL,
    "q281_modularity": Q281_SQL,
    "q201_bfs_hub_distance": Q201_SQL,
    "q215_link_prediction": Q215_SQL,
    "q226_hits": Q226_SQL,
    "q243_edge_support": Q243_SQL,
    "q245_assortativity": Q245_SQL,
}
