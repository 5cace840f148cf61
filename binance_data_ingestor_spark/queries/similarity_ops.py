"""Similarity-search queries over the `embeddings` table.

Brute-force cosine top-k (exact baseline), embedding-cosine near-dup
pairs, and the sign-LSH bucketed approximate variant — the first two
oracle-checked against DuckDB's list_inner_product; the LSH variant is
oracle-checked too, with the deterministic hyperplane literals shared
between both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.similarity import (
    brute_force_topk,
    centroids,
    semantic_dedup,
    codebooks,
    cosine_neardup_pairs,
    hyperplanes,
    ivf_topk,
    lsh_topk,
    pq_topk,
)
from .util import load

N_QUERIES = 8
K = 5
DIM = 64
N_PLANES = 4


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "embeddings")


# --------------------------------------------------------------------------
# q50 — exact brute-force cosine top-k for a broadcast query set.
# --------------------------------------------------------------------------
def q50_ann_brute_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    return brute_force_topk(emb, emb.filter(F.col("vec_id") < N_QUERIES), k=K)


_COS = (
    "list_inner_product(qv, cv) / "
    "(sqrt(list_inner_product(qv, qv)) * sqrt(list_inner_product(cv, cv)))"
)

Q50_SQL = f"""
WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
           FROM embeddings WHERE vec_id < {N_QUERIES}),
c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv FROM embeddings),
scored AS (
  SELECT query_id, neighbor_id, {_COS} AS cos
  FROM c CROSS JOIN q WHERE neighbor_id != query_id
),
ranked AS (
  SELECT query_id, neighbor_id, cos,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, rank, round(cos, 6) AS cos_sim
FROM ranked WHERE rank <= {K}
"""


# --------------------------------------------------------------------------
# q51 — embedding-cosine near-duplicate pairs.
# --------------------------------------------------------------------------
def q51_cosine_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cosine_neardup_pairs(_emb(spark, sf_dir), threshold=0.4)


Q51_SQL = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(list_inner_product(a.v, b.v) /
             (sqrt(list_inner_product(a.v, a.v)) * sqrt(list_inner_product(b.v, b.v))), 6)
         AS cos_sim
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE round(list_inner_product(a.v, b.v) /
            (sqrt(list_inner_product(a.v, a.v)) * sqrt(list_inner_product(b.v, b.v))), 6)
      >= 0.4
"""


# --------------------------------------------------------------------------
# q52 — sign-LSH bucketed approximate top-k. Same deterministic
# hyperplanes embedded as literals in the oracle SQL.
# --------------------------------------------------------------------------
def q52_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    return lsh_topk(
        emb,
        emb.filter(F.col("vec_id") < N_QUERIES),
        k=K,
        n_planes=N_PLANES,
        dim=DIM,
        seed=42,
    )


def _lsh_sql() -> str:
    planes = hyperplanes(DIM, N_PLANES, seed=42)
    plane_lits = ", ".join(
        "[" + ", ".join(repr(x) for x in p) + "]::DOUBLE[]" for p in planes
    )
    bucket = " || ".join(
        f"(CASE WHEN list_inner_product(v, p[{i + 1}]) >= 0 THEN '1' ELSE '0' END)"
        for i in range(N_PLANES)
    )
    return f"""
WITH planes AS (SELECT [{plane_lits}] AS p),
e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
bucketed AS (
  SELECT vec_id, v, {bucket} AS bucket FROM e CROSS JOIN planes
),
q AS (SELECT vec_id AS query_id, v AS qv, bucket FROM bucketed
      WHERE vec_id < {N_QUERIES}),
c AS (SELECT vec_id AS neighbor_id, v AS cv, bucket FROM bucketed),
scored AS (
  SELECT query_id, neighbor_id,
         list_inner_product(qv, cv) /
         (sqrt(list_inner_product(qv, qv)) * sqrt(list_inner_product(cv, cv))) AS cos
  FROM c JOIN q USING (bucket) WHERE neighbor_id != query_id
),
ranked AS (
  SELECT query_id, neighbor_id, cos,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, rank, round(cos, 6) AS cos_sim
FROM ranked WHERE rank <= {K}
"""


Q52_SQL = _lsh_sql()


# --------------------------------------------------------------------------
# q53 — IVF-bucketed approximate top-k: nearest-centroid cells, probe
# the top-2 cells per query, exact rerank inside probed cells. Same
# deterministic centroid literals embedded in the oracle SQL.
# --------------------------------------------------------------------------
N_CENTROIDS = 8
N_PROBE = 2


def q53_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    return ivf_topk(
        emb,
        emb.filter(F.col("vec_id") < N_QUERIES),
        k=K,
        n_centroids=N_CENTROIDS,
        n_probe=N_PROBE,
        dim=DIM,
        seed=7,
    )


def _ivf_sql() -> str:
    cents = centroids(DIM, N_CENTROIDS, seed=7)
    cent_lits = ", ".join(
        "[" + ", ".join(repr(x) for x in c) + "]::DOUBLE[]" for c in cents
    )
    return f"""
WITH cents AS (SELECT [{cent_lits}] AS cl),
e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
sims AS (
  SELECT vec_id, v,
         list_transform(cl, c -> round(list_inner_product(v, c) /
             (sqrt(list_inner_product(v, v)) * sqrt(list_inner_product(c, c))), 6)) AS s
  FROM e CROSS JOIN cents
),
assigned AS (
  SELECT vec_id AS neighbor_id, v AS cv,
         list_position(s, list_max(s)) - 1 AS cell
  FROM sims
),
qcells AS (
  SELECT vec_id AS query_id, v AS qv, j - 1 AS cell,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY s[j] DESC, j ASC) AS pr
  FROM (SELECT vec_id, v, s, unnest(range(1, {N_CENTROIDS + 1})) AS j
        FROM sims WHERE vec_id < {N_QUERIES}) t
),
probes AS (SELECT query_id, qv, cell FROM qcells WHERE pr <= {N_PROBE}),
scored AS (
  SELECT query_id, neighbor_id, {_COS} AS cos
  FROM assigned JOIN probes USING (cell)
  WHERE neighbor_id != query_id
),
ranked AS (
  SELECT query_id, neighbor_id, cos,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, rank, round(cos, 6) AS cos_sim
FROM ranked WHERE rank <= {K}
"""


Q53_SQL = _ivf_sql()


# --------------------------------------------------------------------------
# q66 — product-quantization approximate top-k (ADC): 8 subspaces × 16
# codes over the 64-dim embeddings (8-byte codes, 32× smaller than the
# raw float32 vectors — the scan reads codes, never embeddings). Same
# deterministic codebook literals embedded in the oracle SQL; approx
# distance = sum of per-subspace query→centroid squared-L2 lookups,
# quantized to integer micro-units (PQ ties are structural, and float
# SUM order is engine-specific — integer ADC is exact and orderless).
# --------------------------------------------------------------------------
PQ_M = 8
PQ_CODES = 16


def q66_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    return pq_topk(
        emb,
        emb.filter(F.col("vec_id") < N_QUERIES),
        k=K,
        m=PQ_M,
        n_codes=PQ_CODES,
        dim=DIM,
        seed=11,
    )


def _pq_sql() -> str:
    books = codebooks(DIM, PQ_M, PQ_CODES, seed=11)
    ds = DIM // PQ_M
    rows = ", ".join(
        f"({j}, {c}, [" + ", ".join(repr(x) for x in books[j][c]) + "]::DOUBLE[])"
        for j in range(PQ_M)
        for c in range(PQ_CODES)
    )
    d2 = (
        "list_inner_product(s, s) - 2 * list_inner_product(s, cent)"
        " + list_inner_product(cent, cent)"
    )
    return f"""
WITH cb AS (SELECT * FROM (VALUES {rows}) AS t(subspace, code, cent)),
e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
dist AS (
  SELECT vec_id, subspace, code, {d2} AS d2
  FROM (SELECT vec_id, subspace, code, cent,
               list_slice(v, subspace * {ds} + 1, subspace * {ds} + {ds}) AS s
        FROM e CROSS JOIN cb) t
),
codes AS (
  SELECT vec_id, subspace, code
  FROM (SELECT vec_id, subspace, code,
               row_number() OVER (PARTITION BY vec_id, subspace
                                  ORDER BY d2 ASC, code ASC) AS rn
        FROM dist) t
  WHERE rn = 1
),
qd AS (SELECT vec_id AS query_id, subspace, code,
              CAST(floor(d2 * 1000000 + 0.5) AS BIGINT) AS d2u
       FROM dist WHERE vec_id < {N_QUERIES}),
adc AS (
  SELECT q.query_id, c.vec_id AS neighbor_id, sum(q.d2u) AS adc_micro
  FROM codes c JOIN qd q USING (subspace, code)
  WHERE c.vec_id != q.query_id
  GROUP BY 1, 2
),
ranked AS (
  SELECT query_id, neighbor_id, adc_micro,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY adc_micro ASC, neighbor_id ASC) AS rank
  FROM adc
)
SELECT query_id, neighbor_id, rank, CAST(adc_micro AS BIGINT) AS adc_micro
FROM ranked WHERE rank <= {K}
"""


Q66_SQL = _pq_sql()


# --------------------------------------------------------------------------
# q67 — PQ codebook training: 4 rounds of distributed per-subspace
# k-means (Lloyd's) over the embeddings, then the trained-codebook
# quantization profile: per (subspace, code) the assigned-vector count
# and exact integer quantization error. Training runs on the µ-grid
# (similarity.pq_fit_micro): embeddings and centroids are exact
# integer µunits, distances exact int64, and the only float op per
# update is one IEEE division per coordinate — so the DuckDB oracle
# UNROLLS all four Lloyd rounds in SQL and matches hash-exactly.
# Iterative training thereby graduates from the rows-only policy;
# q26 (stateful streaming) is now the registry's only rows-only entry.
# inertia_sq_micro is Σ‖z−c‖² in (µunit)² — int64 holds it to ~1e8
# training vectors at these magnitudes (a trainer samples long before
# that).
# --------------------------------------------------------------------------
def q67_pq_kmeans_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    from ..operators.similarity import _matrix, pq_fit_micro, quantize_micro

    emb = _emb(spark, sf_dir)
    books = pq_fit_micro(emb, m=PQ_M, n_codes=PQ_CODES, dim=DIM, iters=4, seed=11)
    B = [np.asarray(b, dtype=np.int64) for b in books]
    ds = DIM // PQ_M

    def stats(batches):
        n = np.zeros((PQ_M, PQ_CODES), dtype=np.int64)
        err = np.zeros((PQ_M, PQ_CODES), dtype=np.int64)
        for pdf in batches:
            Z = quantize_micro(_matrix(pdf["vec"]))
            for j in range(PQ_M):
                S = Z[:, j * ds : (j + 1) * ds]
                d2 = (
                    (S * S).sum(axis=1)[:, None]
                    - 2 * (S @ B[j].T)
                    + (B[j] * B[j]).sum(axis=1)[None, :]
                )
                a = d2.argmin(axis=1)
                np.add.at(n[j], a, 1)
                np.add.at(err[j], a, d2[np.arange(len(a)), a])
        out = [
            (j, c, int(n[j, c]), int(err[j, c]))
            for j in range(PQ_M)
            for c in range(PQ_CODES)
            if n[j, c] > 0
        ]
        yield pd.DataFrame(
            out, columns=["subspace", "code", "n_vectors", "inertia_sq_micro"]
        )

    return (
        emb.select(F.col("embedding").alias("vec"))
        .mapInPandas(
            stats,
            "subspace int, code int, n_vectors long, inertia_sq_micro long",
        )
        .groupBy("subspace", "code")
        .agg(
            F.sum("n_vectors").alias("n_vectors"),
            F.sum("inertia_sq_micro").alias("inertia_sq_micro"),
        )
    )


def _q67_sql() -> str:
    """Unrolled DuckDB replay of the µ-grid Lloyd training: the seeded
    initial codebook is embedded as µ-quantized literals, each of the
    4 rounds is an (assign → per-dim integer sums → re-gridded means)
    CTE chain, and the final SELECT profiles assignments under the
    trained books — every arithmetic step mirrors pq_fit_micro
    bit-for-bit (int64 distances, ties to lowest code,
    floor(sum/n + 0.5) updates)."""
    import math

    ds = DIM // PQ_M
    rows = []
    for j, book in enumerate(codebooks(DIM, PQ_M, PQ_CODES, seed=11)):
        for c, cent in enumerate(book):
            vals = ", ".join(
                str(int(math.floor(v * 1e6 + 0.5))) for v in cent
            )
            rows.append(f"({j}, {c}, [{vals}]::BIGINT[])")
    cb0 = ",\n    ".join(rows)
    dist = (
        "CAST(list_sum(list_transform(range(1, %d), "
        "k -> (z.zv[k] - cb.c[k]) * (z.zv[k] - cb.c[k]))) AS BIGINT)" % (ds + 1)
    )
    parts = [
        f"""
WITH z AS (
  SELECT vec_id, s.s AS subspace,
         list_transform(range(1, {ds + 1}),
           k -> CAST(floor(CAST(embedding[s.s * {ds} + k] AS DOUBLE) * 1000000
                           + 0.5) AS BIGINT)) AS zv
  FROM embeddings, range(0, {PQ_M}) s(s)
),
cb0(subspace, code, c) AS (VALUES
    {cb0}
)"""
    ]
    prev = "cb0"
    for i in range(1, 5):
        parts.append(
            f""",
a{i} AS (
  SELECT z.vec_id, z.subspace, cb.code
  FROM z JOIN {prev} cb USING (subspace)
  QUALIFY row_number() OVER (PARTITION BY z.vec_id, z.subspace
                             ORDER BY {dist} ASC, cb.code ASC) = 1
),
u{i} AS (
  SELECT subspace, code,
         list(CAST(floor(CAST(sk AS DOUBLE) / CAST(n AS DOUBLE) + 0.5)
                   AS BIGINT) ORDER BY k) AS c
  FROM (
    SELECT a.subspace, a.code, r.k,
           CAST(sum(z.zv[r.k]) AS BIGINT) AS sk, count(*) AS n
    FROM a{i} a
    JOIN z ON z.vec_id = a.vec_id AND z.subspace = a.subspace,
         range(1, {ds + 1}) r(k)
    GROUP BY 1, 2, 3
  ) GROUP BY 1, 2
),
cb{i} AS (
  SELECT p.subspace, p.code, coalesce(u.c, p.c) AS c
  FROM {prev} p LEFT JOIN u{i} u USING (subspace, code)
)"""
        )
        prev = f"cb{i}"
    parts.append(
        f""",
final AS (
  SELECT z.vec_id, z.subspace, cb.code, {dist} AS d2
  FROM z JOIN {prev} cb USING (subspace)
  QUALIFY row_number() OVER (PARTITION BY z.vec_id, z.subspace
                             ORDER BY {dist} ASC, cb.code ASC) = 1
)
SELECT subspace, code,
       CAST(count(*) AS BIGINT) AS n_vectors,
       CAST(sum(d2) AS BIGINT) AS inertia_sq_micro
FROM final GROUP BY 1, 2"""
    )
    return "".join(parts)


Q67_SQL = _q67_sql()


# --------------------------------------------------------------------------
# q96 — reciprocal-rank fusion: rank candidates per query under TWO
# metrics (cosine and squared-L2) computed from ONE scored pair set
# (dot + per-side norms, no recomputation), then fuse with
# RRF(r) = Σ 1/(60 + r). The standard hybrid-retrieval combiner; here
# both rankers share the candidate pass so fusion costs one extra
# window, not a second scoring pipeline. Per-side norms are computed
# once per vector BEFORE pairing (8 query rows + N candidate rows),
# never per pair. Squared L2 ranks identically to L2 — the sqrt (and
# its cross-engine ulp risk) is skipped.
# --------------------------------------------------------------------------
RRF_K = 60


def q96_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from ..operators.similarity import _as_double, dot

    emb = _emb(spark, sf_dir).select(
        "vec_id", _as_double("embedding").alias("v")
    )
    emb = emb.withColumn("n2", dot("v", "v"))
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("n2").alias("qn2"),
    )
    pairs = (
        emb.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            dot("qv", "v").alias("d"),
            "qn2",
            "n2",
        )
        .select(
            "query_id",
            "neighbor_id",
            # nullif: zero-norm vector → DuckDB NULL, Spark ANSI raise
            # (q57 convention; both engines then rank NULL cos last
            # under DESC). Unchanged bit-for-bit on nonzero norms.
            (
                F.col("d")
                / F.nullif(F.sqrt(F.col("qn2") * F.col("n2")), F.lit(0.0))
            ).alias("cos"),
            (F.col("qn2") + F.col("n2") - 2 * F.col("d")).alias("l2sq"),
        )
    )
    by_cos = W.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    by_l2 = W.partitionBy("query_id").orderBy(F.asc("l2sq"), F.asc("neighbor_id"))
    ranked = pairs.select(
        "query_id",
        "neighbor_id",
        F.row_number().over(by_cos).alias("rank_cos"),
        F.row_number().over(by_l2).alias("rank_l2"),
    ).withColumn(
        "rrf",
        1.0 / (RRF_K + F.col("rank_cos")) + 1.0 / (RRF_K + F.col("rank_l2")),
    )
    fused = W.partitionBy("query_id").orderBy(F.desc("rrf"), F.asc("neighbor_id"))
    return (
        ranked.withColumn("fused_rank", F.row_number().over(fused))
        .filter(F.col("fused_rank") <= K)
        .select(
            "query_id",
            "neighbor_id",
            "fused_rank",
            "rank_cos",
            "rank_l2",
            F.round("rrf", 6).alias("rrf_r"),
        )
    )


Q96_SQL = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v,
                  list_inner_product(embedding::DOUBLE[],
                                     embedding::DOUBLE[]) AS n2
           FROM embeddings),
q AS (SELECT vec_id AS query_id, v AS qv, n2 AS qn2
      FROM e WHERE vec_id < {N_QUERIES}),
pairs AS (
  SELECT query_id, e.vec_id AS neighbor_id,
         list_inner_product(qv, v) / sqrt(qn2 * e.n2) AS cos,
         qn2 + e.n2 - 2 * list_inner_product(qv, v) AS l2sq
  FROM e CROSS JOIN q WHERE e.vec_id <> query_id
),
ranked AS (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos DESC, neighbor_id ASC) AS rank_cos,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY l2sq ASC, neighbor_id ASC) AS rank_l2
  FROM pairs
),
fused AS (
  SELECT query_id, neighbor_id, rank_cos, rank_l2,
         1.0 / ({RRF_K} + rank_cos) + 1.0 / ({RRF_K} + rank_l2) AS rrf,
         row_number() OVER (
           PARTITION BY query_id
           ORDER BY 1.0 / ({RRF_K} + rank_cos)
                    + 1.0 / ({RRF_K} + rank_l2) DESC,
                    neighbor_id ASC) AS fused_rank
  FROM ranked
)
SELECT query_id, neighbor_id, fused_rank, rank_cos, rank_l2,
       round(rrf, 6) AS rrf_r
FROM fused WHERE fused_rank <= {K}
"""


# --------------------------------------------------------------------------
# q108 — blocked edit-distance similarity self-join (entity-resolution
# style). Blocking key = 12-char text prefix: candidate generation is
# an equi-join on the block (one shuffle, pairs only form inside a
# block), then the verifier is Spark's codegen'd bounded levenshtein
# (threshold arg → early-exit DP, returns -1 past the bound) on
# 40-char prefixes. This is the standard scale shape for string
# similarity joins: cheap blocking bounds the candidate set, the
# expensive distance only runs inside blocks. At 100 TB you'd salt
# giant blocks; block sizes here are single-digit.
# --------------------------------------------------------------------------
_ED_MAX = 8


def q108_editdist_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.substring("text", 1, 40).alias("p"),
        F.substring("text", 1, 12).alias("blk"),
    )
    a, b = docs.alias("a"), docs.alias("b")
    return (
        a.join(b, "blk")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.levenshtein(F.col("a.p"), F.col("b.p"), _ED_MAX).alias("dist"),
        )
        .filter(F.col("dist") >= 0)
    )


Q108_SQL = f"""
WITH dd AS (SELECT doc_id, substr(text, 1, 40) AS p,
                   substr(text, 1, 12) AS blk FROM documents)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       levenshtein(a.p, b.p) AS dist
FROM dd a JOIN dd b ON a.blk = b.blk AND a.doc_id < b.doc_id
WHERE levenshtein(a.p, b.p) <= {_ED_MAX}
"""


# --------------------------------------------------------------------------
# q118 — SemDeDup-style semantic deduplication: coarse IVF cells
# (same deterministic centroids as q53), then inside each cell prune
# every vector with a lower-id near-duplicate at rounded cosine ≥
# 0.4, keeping the smallest id as the representative. The quadratic
# similarity never crosses cells (one GEMM per cell via
# applyInPandas; the only shuffle is groupBy(cell)), which is what
# makes embedding-level dedup tractable at corpus scale. Output =
# the pruned rows with their witness (smallest qualifying lower id).
# --------------------------------------------------------------------------
SEMDEDUP_T = 0.4


def q118_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return semantic_dedup(
        _emb(spark, sf_dir),
        threshold=SEMDEDUP_T,
        n_centroids=N_CENTROIDS,
        dim=DIM,
        seed=7,
    )


def _semdedup_sql() -> str:
    cents = centroids(DIM, N_CENTROIDS, seed=7)
    cent_lits = ", ".join(
        "[" + ", ".join(repr(x) for x in c) + "]::DOUBLE[]" for c in cents
    )
    return f"""
WITH cents AS (SELECT [{cent_lits}] AS cl),
e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
sims AS (
  SELECT vec_id, v,
         list_transform(cl, c -> round(list_inner_product(v, c) /
             (sqrt(list_inner_product(v, v)) * sqrt(list_inner_product(c, c))), 6)) AS s
  FROM e CROSS JOIN cents
),
assigned AS (
  SELECT vec_id, v, list_position(s, list_max(s)) - 1 AS cell FROM sims
),
pairs AS (
  SELECT a.cell AS cell, a.vec_id AS a, b.vec_id AS b,
         round(list_inner_product(a.v, b.v) /
               (sqrt(list_inner_product(a.v, a.v))
                * sqrt(list_inner_product(b.v, b.v))), 6) AS cos_r
  FROM assigned a JOIN assigned b
    ON a.cell = b.cell AND a.vec_id < b.vec_id
)
SELECT b AS vec_id, cell, min(a) AS witness_id,
       arg_min(cos_r, a) AS witness_cos_r,
       count(*) AS n_witnesses
FROM pairs WHERE cos_r >= {SEMDEDUP_T}
GROUP BY b, cell
"""


Q118_SQL = _semdedup_sql()


# --------------------------------------------------------------------------
# q165 — symmetric per-vector int8 quantization of the embedding table
# with an exact error certificate (scale, max reconstruction error,
# code checksum). Row-local expression work only: zero shuffle, zero
# Python — the compression step that runs ahead of an ANN index build
# and shrinks the scan 4× vs float32. Parity is by construction:
# scale is one IEEE division, codes are floor(x/scale + 0.5) of
# identically-computed doubles, max is order-free, the checksum is an
# exact integer.
# --------------------------------------------------------------------------
def q165_int8_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import int8_quantize

    return int8_quantize(load(spark, sf_dir, "embeddings"))


Q165_SQL = """
WITH s AS (
  SELECT vec_id,
         len(embedding) AS n_dims,
         nullif(list_max(list_transform(embedding,
                                        x -> abs(CAST(x AS DOUBLE)))) / 127.0,
                0.0) AS scale,
         embedding
  FROM embeddings),
c AS (
  SELECT vec_id, n_dims, scale, embedding,
         list_transform(embedding,
                        x -> CAST(floor(CAST(x AS DOUBLE) / scale + 0.5)
                                  AS BIGINT)) AS codes
  FROM s)
SELECT vec_id, n_dims, scale,
       CAST(list_sum(codes) AS BIGINT) AS sum_codes,
       list_max(list_transform(generate_series(1, n_dims),
                i -> abs(codes[i] * scale - CAST(embedding[i] AS DOUBLE))))
         AS max_abs_err
FROM c
"""


# --------------------------------------------------------------------------
# q181 — per-dimension rank transform (percentile feature scaling) of
# the embedding table: every value is replaced by its rank within its
# dimension — the outlier-robust normalization that precedes distance
# computations when feature scales are incomparable. The explode keys
# the shuffle on dim (embarrassingly parallel across dimensions); the
# within-dim ranking uses the bucket-offset two-pass
# (partitioning.with_global_rank, bucket = the value's coarse
# quantization — monotone in the order), so no dimension's rows ever
# serialize into one task. Ties break on vec_id identically on both
# engines; output is the exact integer rank checksum per vector plus
# its mean percentile as one IEEE division.
# --------------------------------------------------------------------------
RT_DIMS = 16  # rank-transform the first 16 dimensions


def q181_rank_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.partitioning import with_global_rank

    emb = load(spark, sf_dir, "embeddings")
    ex = emb.select(
        "vec_id",
        F.posexplode(F.slice("embedding", 1, RT_DIMS)).alias("dim", "v"),
    ).withColumn("v", F.col("v").cast("double"))
    ranked = with_global_rank(
        ex,
        ["dim"],
        ["v", "vec_id"],
        bucket=F.expr("CAST(floor(v * 4) AS BIGINT)"),
    )
    n = emb.agg(F.count("*").alias("n_vecs"))
    return (
        ranked.groupBy("vec_id")
        .agg(F.sum("rank").cast("long").alias("sum_rank"))
        .crossJoin(F.broadcast(n))
        .select(
            "vec_id",
            "sum_rank",
            (
                F.col("sum_rank").cast("double")
                / (F.col("n_vecs") * RT_DIMS).cast("double")
            ).alias("mean_percentile"),
        )
    )


Q181_SQL = f"""
WITH ex AS (
  SELECT vec_id, i - 1 AS dim, CAST(embedding[i] AS DOUBLE) AS v
  FROM embeddings, unnest(generate_series(1, {RT_DIMS})) AS t(i)),
r AS (
  SELECT vec_id,
         row_number() OVER (PARTITION BY dim ORDER BY v, vec_id) AS rank
  FROM ex),
n AS (SELECT count(*) AS n_vecs FROM embeddings)
SELECT vec_id,
       CAST(sum(rank) AS BIGINT) AS sum_rank,
       CAST(CAST(sum(rank) AS BIGINT) AS DOUBLE)
         / CAST(n_vecs * {RT_DIMS} AS DOUBLE) AS mean_percentile
FROM r, n GROUP BY vec_id, n_vecs
"""


# --------------------------------------------------------------------------
# q182 — composed IVF-PQ top-k (FAISS "IVF8,PQ8" shape): the coarse
# quantizer restricts each query to its N_PROBE best cells AND the scan
# over those cells ranks by integer-µ ADC over 8-byte PQ codes — the
# production ANN configuration where q53 (IVF, exact rerank) and q66
# (PQ, full scan) are the two halves. The oracle composes the same two
# certified literal artifacts (seed-7 centroids, seed-11 codebooks):
# cell assignment + probe ranking from q53's SQL, code assignment + ADC
# from q66's, joined per (query, cell). Scale: index row = (id, cell,
# codes) ≈ 12 bytes/vector; per-query scan cost O(N·m·n_probe/n_cells);
# shuffle carries per-task top-k remainders only.
# --------------------------------------------------------------------------
def q182_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import ivfpq_topk

    emb = _emb(spark, sf_dir)
    return ivfpq_topk(
        emb,
        emb.filter(F.col("vec_id") < N_QUERIES),
        k=K,
        n_centroids=N_CENTROIDS,
        n_probe=N_PROBE,
        m=PQ_M,
        n_codes=PQ_CODES,
        dim=DIM,
        cent_seed=7,
        pq_seed=11,
    )


def _ivfpq_sql() -> str:
    cents = centroids(DIM, N_CENTROIDS, seed=7)
    cent_lits = ", ".join(
        "[" + ", ".join(repr(x) for x in c) + "]::DOUBLE[]" for c in cents
    )
    books = codebooks(DIM, PQ_M, PQ_CODES, seed=11)
    ds = DIM // PQ_M
    cb_rows = ", ".join(
        f"({j}, {c}, [" + ", ".join(repr(x) for x in books[j][c]) + "]::DOUBLE[])"
        for j in range(PQ_M)
        for c in range(PQ_CODES)
    )
    d2 = (
        "list_inner_product(s, s) - 2 * list_inner_product(s, cent)"
        " + list_inner_product(cent, cent)"
    )
    return f"""
WITH cents AS (SELECT [{cent_lits}] AS cl),
e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
sims AS (
  SELECT vec_id, v,
         list_transform(cl, c -> round(list_inner_product(v, c) /
             (sqrt(list_inner_product(v, v)) * sqrt(list_inner_product(c, c))), 6)) AS s
  FROM e CROSS JOIN cents
),
assigned AS (
  SELECT vec_id, list_position(s, list_max(s)) - 1 AS cell
  FROM sims
),
qcells AS (
  SELECT vec_id AS query_id, j - 1 AS cell,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY s[j] DESC, j ASC) AS pr
  FROM (SELECT vec_id, s, unnest(range(1, {N_CENTROIDS + 1})) AS j
        FROM sims WHERE vec_id < {N_QUERIES}) t
),
probes AS (SELECT query_id, cell FROM qcells WHERE pr <= {N_PROBE}),
cb AS (SELECT * FROM (VALUES {cb_rows}) AS t(subspace, code, cent)),
dist AS (
  SELECT vec_id, subspace, code, {d2} AS d2
  FROM (SELECT vec_id, subspace, code, cent,
               list_slice(v, subspace * {ds} + 1, subspace * {ds} + {ds}) AS s
        FROM e CROSS JOIN cb) t
),
codes AS (
  SELECT vec_id, subspace, code
  FROM (SELECT vec_id, subspace, code,
               row_number() OVER (PARTITION BY vec_id, subspace
                                  ORDER BY d2 ASC, code ASC) AS rn
        FROM dist) t
  WHERE rn = 1
),
qd AS (SELECT vec_id AS query_id, subspace, code,
              CAST(floor(d2 * 1000000 + 0.5) AS BIGINT) AS d2u
       FROM dist WHERE vec_id < {N_QUERIES}),
adc AS (
  SELECT q.query_id, c.vec_id AS neighbor_id, CAST(sum(q.d2u) AS BIGINT) AS adc_micro
  FROM codes c
  JOIN assigned a ON a.vec_id = c.vec_id
  JOIN probes p ON p.cell = a.cell
  JOIN qd q ON q.subspace = c.subspace AND q.code = c.code
           AND q.query_id = p.query_id
  WHERE c.vec_id != q.query_id
  GROUP BY 1, 2
),
ranked AS (
  SELECT query_id, neighbor_id, adc_micro,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY adc_micro ASC, neighbor_id ASC) AS rank
  FROM adc
)
SELECT query_id, neighbor_id, rank, adc_micro
FROM ranked WHERE rank <= {K}
"""


Q182_SQL = _ivfpq_sql()



# --------------------------------------------------------------------------
# q185 — hard-negative mining for contrastive training: for each of the
# broadcast anchor vectors, the top-5 most-similar candidates with a
# DIFFERENT label (the negatives that actually teach the margin — the
# standard batch-mining pass of embedding-model training). Execution is
# the q50 brute-force shape with the label-mismatch mask applied inside
# the Arrow kernel, so excluded positives never leave the task; the
# shuffle carries per-task top-k remainders only. The IVF/LSH bucketing
# (q52/q53/q182) is the documented prune when exact mining stops
# fitting.
# --------------------------------------------------------------------------
def q185_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import hard_negative_topk

    emb = _emb(spark, sf_dir)
    return hard_negative_topk(
        emb, emb.filter(F.col("vec_id") < N_QUERIES), k=K
    )


Q185_SQL = f"""
WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv,
                  label AS q_label
           FROM embeddings WHERE vec_id < {N_QUERIES}),
c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv,
             CAST(label AS INTEGER) AS neg_label
      FROM embeddings),
scored AS (
  -- rank on the 6-dp-ROUNDED cosine (mirrors the operator's in-kernel
  -- np.round-before-selection — the repo GEMM convention)
  SELECT query_id, neighbor_id, neg_label, round({_COS}, 6) AS cos
  FROM c CROSS JOIN q
  WHERE neighbor_id != query_id AND neg_label != q_label
),
ranked AS (
  SELECT query_id, neighbor_id, neg_label, cos,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, neg_label, rank, round(cos, 6) AS cos_sim
FROM ranked WHERE rank <= {K}
"""


# --------------------------------------------------------------------------
# q186 — leave-one-out kNN label accuracy, IVF-cell-restricted: the
# embedding-quality probe a pipeline runs before trusting vectors for
# retrieval or dedup. Every vector is classified by the majority label
# of its 5 nearest cell-mates (cosine, deterministic (count DESC,
# label ASC) vote tie-break, (cos DESC, id ASC) rank tie-break); output
# is per-true-label accuracy. The cell restriction is the SCALE
# contract: the O(n²) similarity never crosses cells — each cell is ONE
# applyInPandas group running a single float64 GEMM and emitting only
# ≤K rows per vector (operators/similarity.cell_loo_knn, same kernel
# shape as q118's SemDeDup), so total work is Σ|cell|² flops and the
# post-cell shuffle carries n·K rows, never the n·|cell| pair table a
# pair-join + window would move (the round-3 form — 10.8 s at sf0.1 —
# did exactly that; this kernel runs it in ~1 s). Ranking is on
# 6-dp-ROUNDED cosine (repo-wide GEMM convention), which the oracle
# mirrors; it replays the same centroid literals, so the hash compare
# certifies the restricted semantics, not an approximation of full
# kNN. Vectors alone in their cell are excluded on both engines.
# --------------------------------------------------------------------------
def q186_knn_label_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from ..operators.similarity import assign_cells, cell_loo_knn

    emb = _emb(spark, sf_dir)
    cells = assign_cells(
        emb, centroids(DIM, N_CENTROIDS, seed=7)
    ).join(emb.select("vec_id", F.col("label").cast("int").alias("label")), "vec_id")
    knn = cell_loo_knn(cells, k=K)
    votes = knn.groupBy("aid", "a_label", "b_label").agg(F.count("*").alias("c"))
    wv = W.partitionBy("aid").orderBy(F.desc("c"), F.asc("b_label"))
    pred = (
        votes.withColumn("vr", F.row_number().over(wv))
        .filter(F.col("vr") == 1)
        .select("aid", "a_label", F.col("b_label").alias("pred"))
    )
    return pred.groupBy(F.col("a_label").alias("label")).agg(
        F.count("*").alias("n_eval"),
        F.sum((F.col("pred") == F.col("a_label")).cast("long")).alias("n_correct"),
        F.round(
            F.sum((F.col("pred") == F.col("a_label")).cast("long"))
            / F.count("*"),
            6,
        ).alias("loo_accuracy_r"),
    )


def _knn_eval_sql() -> str:
    cents = centroids(DIM, N_CENTROIDS, seed=7)
    cent_lits = ", ".join(
        "[" + ", ".join(repr(x) for x in c) + "]::DOUBLE[]" for c in cents
    )
    return f"""
WITH cents AS (SELECT [{cent_lits}] AS cl),
e AS (SELECT vec_id, embedding::DOUBLE[] AS v, CAST(label AS INTEGER) AS label
      FROM embeddings),
sims AS (
  SELECT vec_id, v, label,
         list_transform(cl, c -> round(list_inner_product(v, c) /
             (sqrt(list_inner_product(v, v)) * sqrt(list_inner_product(c, c))), 6)) AS s
  FROM e CROSS JOIN cents
),
assigned AS (
  SELECT vec_id, v, label, list_position(s, list_max(s)) - 1 AS cell
  FROM sims
),
pairs AS (
  SELECT a.vec_id AS aid, a.label AS a_label, b.vec_id AS bid,
         b.label AS b_label,
         round(list_inner_product(a.v, b.v) /
               (sqrt(list_inner_product(a.v, a.v))
                * sqrt(list_inner_product(b.v, b.v))), 6) AS cos
  FROM assigned a JOIN assigned b
    ON a.cell = b.cell AND a.vec_id != b.vec_id
),
knn AS (
  SELECT aid, a_label, b_label
  FROM pairs
  QUALIFY row_number() OVER (PARTITION BY aid ORDER BY cos DESC, bid ASC) <= {K}
),
votes AS (SELECT aid, a_label, b_label, count(*) AS c
          FROM knn GROUP BY 1, 2, 3),
pred AS (
  SELECT aid, a_label, b_label AS pred
  FROM votes
  QUALIFY row_number() OVER (PARTITION BY aid ORDER BY c DESC, b_label ASC) = 1
)
SELECT a_label AS label,
       CAST(count(*) AS BIGINT) AS n_eval,
       CAST(sum(CASE WHEN pred = a_label THEN 1 ELSE 0 END) AS BIGINT)
         AS n_correct,
       round(sum(CASE WHEN pred = a_label THEN 1 ELSE 0 END)
             / CAST(count(*) AS DOUBLE), 6) AS loo_accuracy_r
FROM pred GROUP BY 1
"""


Q186_SQL = _knn_eval_sql()


# --------------------------------------------------------------------------
# q208 — Johnson–Lindenstrauss random projection with a
# distance-preservation certificate: embeddings project 64-d → 16-d
# through a deterministic ±1 Achlioptas matrix (sign = parity of the
# 5th md5 hex digit of "d:j" — the engine's feature-hashing sign
# family, materialized ONCE in Python and embedded as the same literal
# matrix in both the Spark plan and the DuckDB oracle). For every
# (even, odd) vec_id pair the query emits ‖Δx‖², ‖Δy‖², and their
# ratio — the per-pair distortion JL bounds in expectation
# (E‖Δy‖² = ‖Δx‖², σ ≈ √(2/k)) — the audit run before swapping the
# full vectors for projected ones in an ANN index. Float determinism
# is TOTAL here: every inner product is the sequential left-fold
# (operators/similarity.dot ≡ list_inner_product), the projection is
# 16 such folds against literal rows, and ‖Δx‖² composes three folds
# with a fixed formula — both engines produce bit-identical doubles
# before the 6-dp round. Scale: per-row expressions only (no shuffle
# past the pair join); the matrix is a plan literal, never a join.
# --------------------------------------------------------------------------
_JL_D = 64
_JL_K = 16


def _jl_rows() -> list[list[float]]:
    """R[j][d] ∈ {+1,-1} from md5("d:j")'s 5th hex digit parity —
    one Python generator feeds both dialects (hash_sign_sql family)."""
    import hashlib

    return [
        [
            1.0
            if int(hashlib.md5(f"{d}:{j}".encode()).hexdigest()[4], 16) % 2 == 0
            else -1.0
            for d in range(1, _JL_D + 1)
        ]
        for j in range(1, _JL_K + 1)
    ]


def q208_jl_certificate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import dot

    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    a = emb.filter(F.col("vec_id") % 2 == 0).select(
        F.col("vec_id").alias("vec_a"), F.col("v").alias("va")
    )
    b = emb.filter(F.col("vec_id") % 2 == 1).select(
        (F.col("vec_id") - 1).alias("vec_a"),
        F.col("vec_id").alias("vec_b"),
        F.col("v").alias("vb"),
    )
    pairs = a.join(b, "vec_a")
    rows = [
        F.array(*[F.lit(x) for x in row]) for row in _jl_rows()
    ]
    scale = F.lit(float(_JL_K) ** 0.5)
    dy = F.array(
        *[(dot(F.col("va"), r) - dot(F.col("vb"), r)) / scale for r in rows]
    )
    d2p = dot(dy, dy)
    d2o = (
        dot(F.col("va"), F.col("va"))
        - 2 * dot(F.col("va"), F.col("vb"))
        + dot(F.col("vb"), F.col("vb"))
    )
    return pairs.select(
        "vec_a",
        "vec_b",
        F.round(d2o, 6).alias("d2_orig_r"),
        F.round(d2p, 6).alias("d2_proj_r"),
        F.round(d2p / d2o, 6).alias("ratio_r"),
    ).filter(F.col("d2_orig_r") > 0)


def _q208_sql() -> str:
    lits = [
        "[" + ", ".join(f"{x:.1f}" for x in row) + "]" for row in _jl_rows()
    ]
    dy = ", ".join(
        f"(list_inner_product(va, {r}) - list_inner_product(vb, {r}))"
        f" / sqrt({float(_JL_K)})"
        for r in lits
    )
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
a AS (SELECT vec_id AS vec_a, v AS va FROM e WHERE vec_id % 2 = 0),
b AS (SELECT vec_id - 1 AS vec_a, vec_id AS vec_b, v AS vb FROM e
      WHERE vec_id % 2 = 1),
p AS (SELECT vec_a, vec_b, va, vb FROM a JOIN b USING (vec_a)),
c AS (SELECT vec_a, vec_b,
             list_inner_product(va, va) - 2 * list_inner_product(va, vb)
               + list_inner_product(vb, vb) AS d2o,
             list_inner_product([{dy}], [{dy}]) AS d2p
      FROM p)
SELECT vec_a, vec_b,
       round(d2o, 6) AS d2_orig_r,
       round(d2p, 6) AS d2_proj_r,
       round(d2p / d2o, 6) AS ratio_r
FROM c WHERE round(d2o, 6) > 0
"""


Q208_SQL = _q208_sql()


# --------------------------------------------------------------------------
# q219 — ANN index build audit: the per-cell occupancy report an IVF
# index build emits before serving (the partition-balance check that
# predicts probe latency — a hot cell makes every probe touching it a
# straggler, exactly like a skewed shuffle key). Reuses q53's
# deterministic centroid family and 6-dp-rounded argmax assignment;
# per cell: occupancy, corpus share, and load factor (occupancy ×
# n_cells / corpus — 1.0 = perfectly balanced). Counts are exact
# integers; the two ratios are single IEEE divisions. One Arrow GEMM
# pass + one tiny groupBy — the audit costs one scan of the vectors.
# --------------------------------------------------------------------------
def q219_ivf_cell_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import assign_cells, centroids

    emb = _emb(spark, sf_dir)
    cells = assign_cells(emb, centroids(DIM, N_CENTROIDS, seed=7))
    occ = cells.groupBy("cell").agg(F.count("*").alias("n_vecs"))
    tot = occ.agg(F.sum("n_vecs").alias("n_total"))
    return occ.crossJoin(F.broadcast(tot)).select(
        "cell",
        "n_vecs",
        F.round(F.col("n_vecs") / F.col("n_total"), 6).alias("share_r"),
        F.round(
            F.col("n_vecs") * F.lit(N_CENTROIDS) / F.col("n_total"), 6
        ).alias("load_factor_r"),
    )


def _q219_sql() -> str:
    cents = centroids(DIM, N_CENTROIDS, seed=7)
    cent_lits = ", ".join(
        "[" + ", ".join(repr(x) for x in c) + "]::DOUBLE[]" for c in cents
    )
    return f"""
WITH cents AS (SELECT [{cent_lits}] AS cl),
e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
sims AS (
  SELECT vec_id,
         list_transform(cl, c -> round(list_inner_product(v, c) /
             (sqrt(list_inner_product(v, v)) * sqrt(list_inner_product(c, c))), 6)) AS s
  FROM e CROSS JOIN cents
),
assigned AS (SELECT vec_id, list_position(s, list_max(s)) - 1 AS cell
             FROM sims),
occ AS (SELECT cell, CAST(count(*) AS BIGINT) AS n_vecs
        FROM assigned GROUP BY cell),
tot AS (SELECT CAST(sum(n_vecs) AS BIGINT) AS n_total FROM occ)
SELECT cell, n_vecs,
       round(n_vecs * 1.0 / n_total, 6) AS share_r,
       round(n_vecs * {N_CENTROIDS} * 1.0 / n_total, 6) AS load_factor_r
FROM occ CROSS JOIN tot
"""


Q219_SQL = _q219_sql()


# --------------------------------------------------------------------------
# q220 — binary-signature Hamming top-k: sign-quantize every embedding
# to a 64-bit signature (two 32-bit words — see operators/similarity.
# sign_signature for why two words) and rank each probe's nearest
# neighbors by XOR-popcount distance. This is the binary-ANN path
# retrieval stacks use when float GEMM is too expensive: 16 bytes per
# vector, distance = 2 popcounts, everything in whole-stage codegen.
# Scale shape: probes explode as a literal array (Generate — the big
# side never joins or shuffles); the top-k prune exploits the 65-value
# distance domain via a partially-aggregable (query, hd) histogram +
# per-query k-th-distance threshold, so the final exact-rank window
# sees ~k+ties rows per probe instead of N. Integer-only output — the
# cross-engine compare has no float anywhere.
# --------------------------------------------------------------------------
def q220_hamming_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import hamming_topk

    emb = _emb(spark, sf_dir)
    return hamming_topk(emb, emb.filter(F.col("vec_id") < N_QUERIES), k=K)


_SIG_SQL = """
WITH s AS (SELECT vec_id,
  CAST(list_sum(list_transform(range(0, 32), i ->
       CASE WHEN embedding[i + 1] > 0 THEN (1::BIGINT << i)
            ELSE 0::BIGINT END)) AS BIGINT) AS lo,
  CAST(list_sum(list_transform(range(32, 64), i ->
       CASE WHEN embedding[i + 1] > 0 THEN (1::BIGINT << (i - 32))
            ELSE 0::BIGINT END)) AS BIGINT) AS hi
  FROM embeddings)"""

Q220_SQL = f"""
{_SIG_SQL},
q AS (SELECT vec_id AS query_id, lo AS qlo, hi AS qhi FROM s
      WHERE vec_id < {N_QUERIES}),
d AS (SELECT query_id, s.vec_id AS neighbor_id,
             CAST(bit_count(xor(s.lo, qlo)) + bit_count(xor(s.hi, qhi))
                  AS BIGINT) AS hd
      FROM s CROSS JOIN q WHERE s.vec_id <> query_id),
r AS (SELECT query_id, neighbor_id, hd,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY hd, neighbor_id) AS rank
      FROM d)
SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank, hd
FROM r WHERE rank <= {K}
"""


# --------------------------------------------------------------------------
# q268 — per-label silhouette-lite over the embedding table: cluster
# cohesion a_l (mean squared distance of a label's vectors to their
# own centroid) vs separation b_l (min over other labels of the mean
# squared distance to THAT label's centroid), s = (b−a)/max(a,b) — the
# label-quality readout before trusting labels for training splits.
# True silhouette is all-pairs; this is the sufficient-statistics
# form: with c_l = E_l[x], every mean distance collapses to
# E_l||x||² − 2·c_l·c_m + ||c_m||², so ONE explode + label-grid
# arithmetic replaces any pairwise pass (labels², not vectors²).
# Cross-engine FP: per-label per-dim centroids and E||x||² are sums
# of doubles whose order differs between engines, so both round 6 dp
# FIRST (the q92 covariance convention) and the label-grid arithmetic
# runs on identical rounded values — deterministic end to end.
# --------------------------------------------------------------------------
EMB_DIMS = 64


def q268_label_silhouette(spark: SparkSession, sf_dir: str) -> DataFrame:
    ex = _emb(spark, sf_dir).select(
        "vec_id",
        "label",
        F.posexplode(F.col("embedding").cast("array<double>")).alias(
            "dim", "v"
        ),
    )
    cent = ex.groupBy("label", "dim").agg(
        F.round(F.sum("v") / F.count("*"), 6).alias("c")
    )
    m2 = ex.groupBy("label").agg(
        (F.count("*") / F.lit(EMB_DIMS)).cast("long").alias("n"),
        F.round(
            F.sum(F.col("v") * F.col("v"))
            / (F.count("*") / F.lit(EMB_DIMS)),
            6,
        ).alias("m2"),
    )
    a = cent.alias("a")
    b = cent.alias("b")
    # label-grid dot products over the rounded centroids, folded in
    # PINNED dim order (round-9 ADVICE): the per-dim products are
    # identical rounded doubles on both engines, but a free-order
    # 64-term sum can land a knife-edge value on a .5e-9 boundary that
    # the 9-dp round then flips. sort_array over (dim, product)
    # structs + a left fold from 0.0 makes the addition order
    # dim 0..63 on BOTH engines (DuckDB: list(... ORDER BY dim) +
    # list_reduce), matching the repo's fixed-order-IEEE discipline.
    dots = (
        a.join(b, F.col("a.dim") == F.col("b.dim"))
        .groupBy(
            F.col("a.label").alias("l"), F.col("b.label").alias("m")
        )
        .agg(
            F.round(
                F.aggregate(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                F.col("a.dim").alias("dim"),
                                (F.col("a.c") * F.col("b.c")).alias("p"),
                            )
                        )
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x["p"],
                ),
                9,
            ).alias("dot")
        )
    )
    self_dots = dots.filter(F.col("l") == F.col("m")).select(
        F.col("m").alias("m_self"), F.col("dot").alias("cm2")
    )
    d = (
        m2.select(F.col("label").alias("l"), "n", "m2")
        .join(dots, "l")
        .join(self_dots, F.col("m") == F.col("m_self"))
        .select(
            "l",
            "m",
            "n",
            (F.col("m2") - 2 * F.col("dot") + F.col("cm2")).alias("dist"),
        )
    )
    own = d.filter(F.col("l") == F.col("m")).select(
        "l", "n", F.col("dist").alias("a_val")
    )
    other = d.filter(F.col("l") != F.col("m")).groupBy("l").agg(
        F.min("dist").alias("b_val")
    )
    return (
        own.join(other, "l")
        .select(
            F.col("l").alias("label"),
            "n",
            F.round("a_val", 6).alias("a_r"),
            F.round("b_val", 6).alias("b_r"),
            F.round(
                (F.col("b_val") - F.col("a_val"))
                / F.nullif(F.greatest("a_val", "b_val"), F.lit(0.0)),
                6,
            ).alias("sil_r"),
        )
    )


Q268_SQL = f"""
WITH ex AS (
  SELECT vec_id, label, i - 1 AS dim, CAST(embedding[i] AS DOUBLE) AS v
  FROM embeddings, unnest(generate_series(1, {EMB_DIMS})) AS t(i)),
cent AS (SELECT label, dim, round(sum(v) / count(*), 6) AS c
         FROM ex GROUP BY 1, 2),
m2 AS (SELECT label, CAST(count(*) // {EMB_DIMS} AS BIGINT) AS n,
              round(sum(v * v) / (count(*) // {EMB_DIMS}), 6) AS m2
       FROM ex GROUP BY 1),
dots AS (SELECT a.label AS l, b.label AS m,
                round(list_reduce(list(a.c * b.c ORDER BY a.dim),
                                  (x, y) -> x + y), 9) AS dot
         FROM cent a JOIN cent b USING (dim) GROUP BY 1, 2),
d AS (SELECT m2.label AS l, dots.m, m2.n,
             m2.m2 - 2 * dots.dot + self.dot AS dist
      FROM m2
      JOIN dots ON dots.l = m2.label
      JOIN dots self ON self.l = dots.m AND self.m = dots.m),
own AS (SELECT l, n, dist AS a_val FROM d WHERE l = m),
oth AS (SELECT l, min(dist) AS b_val FROM d WHERE l <> m GROUP BY 1)
SELECT own.l AS label, n, round(a_val, 6) AS a_r, round(b_val, 6) AS b_r,
       round((b_val - a_val) / nullif(greatest(a_val, b_val), 0.0), 6)
         AS sil_r
FROM own JOIN oth USING (l)
"""


# --------------------------------------------------------------------------
# q275 — per-dimension embedding BATCH-DRIFT census (linear-kernel
# MMD): split the embedding table into two deterministic md5
# hash-batches of vec_id (the reproducible stand-in for "yesterday's
# ingestion vs today's"), and report, per dimension, the two batch
# means, their gap, the gap's squared contribution, and the total
# linear-kernel MMD² = ‖μ_A − μ_B‖² with each dim's share — the
# embedding-space analogue of q94's PSI: WHICH dimensions moved, not
# just whether the batch moved. Sufficient statistics only (per-dim
# sums — the vectors never pair up); means round 6 dp FIRST (q92
# convention) so the downstream arithmetic runs on identical doubles,
# and MMD² folds the 64 per-dim contributions in PINNED dim order
# (q268's sort_array + left-fold discipline; DuckDB list_reduce over
# list(... ORDER BY dim)) — deterministic with NO terminal rounding.
# Scale: one explode + a 64-row summary; the MMD² total is a 1-row
# broadcast crossing (census-adjudicated).
# --------------------------------------------------------------------------
def q275_embedding_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import hash_bucket_sql

    ex = _emb(spark, sf_dir).select(
        F.expr(hash_bucket_sql("spark", "vec_id", 2)).alias("b"),
        F.posexplode(F.col("embedding").cast("array<double>")).alias(
            "dim", "v"
        ),
    )
    d = ex.groupBy("dim").agg(
        F.count_if(F.col("b") == 0).alias("cnt_a"),
        F.count_if(F.col("b") == 1).alias("cnt_b"),
        F.round(
            F.sum(F.when(F.col("b") == 0, F.col("v")))
            / F.count_if(F.col("b") == 0),
            6,
        ).alias("mu_a_r"),
        F.round(
            F.sum(F.when(F.col("b") == 1, F.col("v")))
            / F.count_if(F.col("b") == 1),
            6,
        ).alias("mu_b_r"),
    )
    c = d.select(
        "dim",
        F.col("cnt_a").alias("n_a"),
        F.col("cnt_b").alias("n_b"),
        "mu_a_r",
        "mu_b_r",
        (F.col("mu_a_r") - F.col("mu_b_r")).alias("delta"),
        (
            (F.col("mu_a_r") - F.col("mu_b_r"))
            * (F.col("mu_a_r") - F.col("mu_b_r"))
        ).alias("contrib"),
    ).localCheckpoint(eager=False)  # feeds the 1-row fold + the output
    tot = c.agg(
        F.aggregate(
            F.array_sort(
                F.collect_list(F.struct(F.col("dim"), F.col("contrib").alias("p")))
            ),
            F.lit(0.0),
            lambda acc, x: acc + x["p"],
        ).alias("mmd2")
    )
    return c.crossJoin(F.broadcast(tot)).select(
        "dim",
        "n_a",
        "n_b",
        "mu_a_r",
        "mu_b_r",
        "delta",
        "contrib",
        "mmd2",
        F.round(F.col("contrib") / F.col("mmd2"), 6).alias("share_r"),
    )


def _q275_sql() -> str:
    from ..operators.text import hash_bucket_sql

    return f"""
WITH ex AS (
  SELECT {hash_bucket_sql("duckdb", "vec_id", 2)} AS b, i - 1 AS dim,
         CAST(embedding[i] AS DOUBLE) AS v
  FROM embeddings, unnest(generate_series(1, {DIM})) AS t(i)),
d AS (SELECT dim,
             CAST(count(*) FILTER (WHERE b = 0) AS BIGINT) AS n_a,
             CAST(count(*) FILTER (WHERE b = 1) AS BIGINT) AS n_b,
             round(sum(v) FILTER (WHERE b = 0)
                   / count(*) FILTER (WHERE b = 0), 6) AS mu_a_r,
             round(sum(v) FILTER (WHERE b = 1)
                   / count(*) FILTER (WHERE b = 1), 6) AS mu_b_r
      FROM ex GROUP BY 1),
c AS (SELECT dim, n_a, n_b, mu_a_r, mu_b_r,
             mu_a_r - mu_b_r AS delta,
             (mu_a_r - mu_b_r) * (mu_a_r - mu_b_r) AS contrib
      FROM d),
m AS (SELECT list_reduce(list(contrib ORDER BY dim), (x, y) -> x + y)
        AS mmd2 FROM c)
SELECT dim, n_a, n_b, mu_a_r, mu_b_r, delta, contrib,
       (SELECT mmd2 FROM m) AS mmd2,
       round(contrib / (SELECT mmd2 FROM m), 6) AS share_r
FROM c
"""


Q275_SQL = _q275_sql()


# --------------------------------------------------------------------------
# q286 — cross-corpus ANN retrieval join with a per-query recall
# certificate: corpus A (a 10% md5-hash slice of vec_ids — the "query"
# corpus) retrieves from corpus B (the disjoint remainder — the
# "index" corpus) through B's IVF cells, and every query ships its own
# recall@k against the exact brute-force top-k over the same index.
# This is q153's incremental-dedup shape generalized to retrieval: the
# query corpus NEVER self-joins and never compares against itself —
# only against B's probed cells. Scale shape: the index side is
# assigned to cells once (batched GEMM against the tiny seed-13
# centroid table — at 100 TB the cell is the partition key); each
# query probes its 2 best cells, so retrieval touches n_probe/n_cells
# of B. The benched form runs ONE bounded query batch — the
# md5-first-64 of corpus A (a TakeOrderedAndProject, deterministic
# across engines/partitionings) — because per-batch probe cost is
# |batch|·N/n_probe_share: production drains A in such batches and
# grows n_centroids ~√N so per-cell rerank stays bounded (a
# PROPORTIONAL query corpus at fixed nlist is quadratic at scale —
# measured: the unbatched form DNF'd at sf1). The exact branch
# (operators/similarity.brute_force_topk: one GEMM pass, per-task
# running top-k, |partitions|·|Q|·k shuffle rows) is the certificate —
# production drops it once recall is pinned (q171/q190 stance). Cos
# scores round 6 dp (q50/q53 convention); top-1 gap is a difference of
# the rounded values.
# --------------------------------------------------------------------------
XC_QUERY_PCT = 10  # hash bucket < this → query corpus A
XC_BATCH = 64  # md5-first batch of A actually retrieved per run
XC_K = 5
XC_SEED = 13


def q286_cross_corpus_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import hash_bucket_sql

    emb = _emb(spark, sf_dir).withColumn(
        "hb", F.expr(hash_bucket_sql("spark", "vec_id", 100))
    )
    qs = (
        emb.filter(F.col("hb") < XC_QUERY_PCT)
        .orderBy(F.md5(F.col("vec_id").cast("string")), F.col("vec_id"))
        .limit(XC_BATCH)
        .select("vec_id", "embedding")
    )
    idx = emb.filter(F.col("hb") >= XC_QUERY_PCT).select("vec_id", "embedding")
    ann = ivf_topk(
        idx, qs, k=XC_K, n_centroids=8, n_probe=2, dim=DIM, seed=XC_SEED
    ).localCheckpoint(eager=False)  # two consumers: hits + top-1
    exact = brute_force_topk(idx, qs, k=XC_K).localCheckpoint(eager=False)
    hits = (
        exact.join(ann, ["query_id", "neighbor_id"], "left_semi")
        .groupBy("query_id")
        .agg(F.count("*").alias("n_hit"))
    )
    top1e = exact.filter(F.col("rank") == 1).select(
        "query_id",
        F.col("neighbor_id").alias("top1_exact"),
        F.col("cos_sim").alias("ec"),
    )
    top1a = ann.filter(F.col("rank") == 1).select(
        "query_id",
        F.col("neighbor_id").alias("top1_ann"),
        F.col("cos_sim").alias("ac"),
    )
    return (
        top1e.join(top1a, "query_id", "left")
        .join(hits, "query_id", "left")
        .select(
            "query_id",
            F.coalesce(F.col("n_hit"), F.lit(0)).cast("long").alias("n_hit"),
            F.round(
                F.coalesce(F.col("n_hit"), F.lit(0)).cast("double")
                / F.lit(float(XC_K)),
                6,
            ).alias("recall_r"),
            "top1_exact",
            "top1_ann",
            F.round(F.col("ec") - F.col("ac"), 6).alias("top1_gap_r"),
        )
    )


def _q286_sql() -> str:
    from ..operators.text import hash_bucket_sql

    cents = centroids(DIM, 8, seed=XC_SEED)
    cent_lits = ", ".join(
        "[" + ", ".join(repr(x) for x in c) + "]::DOUBLE[]" for c in cents
    )
    def rcos(v: str) -> str:
        return (
            f"round(list_inner_product({v}, c) /"
            f" (sqrt(list_inner_product({v}, {v}))"
            f" * sqrt(list_inner_product(c, c))), 6)"
        )
    return f"""
WITH cents AS (SELECT [{cent_lits}] AS cl),
e AS (SELECT vec_id, embedding::DOUBLE[] AS v,
             {hash_bucket_sql("duckdb", "vec_id", 100)} AS hb
      FROM embeddings),
q AS (SELECT vec_id AS query_id, v AS qv
      FROM (SELECT vec_id, v,
                   row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)),
                                      vec_id) AS qr
            FROM e WHERE hb < {XC_QUERY_PCT}) t
      WHERE qr <= {XC_BATCH}),
idx AS (SELECT vec_id AS neighbor_id, v AS cv FROM e
        WHERE hb >= {XC_QUERY_PCT}),
escored AS (
  SELECT query_id, neighbor_id, {_COS} AS cos FROM idx CROSS JOIN q),
eranked AS (
  SELECT query_id, neighbor_id, cos,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos DESC, neighbor_id ASC) AS rank
  FROM escored),
etop AS (SELECT * FROM eranked WHERE rank <= {XC_K}),
isims AS (SELECT neighbor_id, cv,
                 list_transform(cl, c -> {rcos('cv')}) AS s
          FROM idx CROSS JOIN cents),
assigned AS (
  SELECT neighbor_id, cv, list_position(s, list_max(s)) - 1 AS cell
  FROM isims),
qsims AS (SELECT query_id, qv,
                 list_transform(cl, c -> {rcos('qv')}) AS s
          FROM q CROSS JOIN cents),
qcells AS (
  SELECT query_id, qv, j - 1 AS cell,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY s[j] DESC, j ASC) AS pr
  FROM (SELECT query_id, qv, s, unnest(range(1, 9)) AS j FROM qsims) t),
probes AS (SELECT query_id, qv, cell FROM qcells WHERE pr <= 2),
ascored AS (
  SELECT query_id, neighbor_id, {_COS} AS cos
  FROM assigned JOIN probes USING (cell)),
aranked AS (
  SELECT query_id, neighbor_id, cos,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos DESC, neighbor_id ASC) AS rank
  FROM ascored),
atop AS (SELECT * FROM aranked WHERE rank <= {XC_K}),
hits AS (SELECT e.query_id, CAST(count(*) AS BIGINT) AS n_hit
         FROM etop e JOIN atop a USING (query_id, neighbor_id)
         GROUP BY 1)
SELECT e.query_id,
       coalesce(h.n_hit, 0) AS n_hit,
       round(CAST(coalesce(h.n_hit, 0) AS DOUBLE) / {XC_K}.0, 6) AS recall_r,
       e.neighbor_id AS top1_exact,
       a.neighbor_id AS top1_ann,
       round(round(e.cos, 6) - round(a.cos, 6), 6) AS top1_gap_r
FROM etop e
LEFT JOIN (SELECT * FROM atop WHERE rank = 1) a USING (query_id)
LEFT JOIN hits h USING (query_id)
WHERE e.rank = 1
"""


Q286_SQL = _q286_sql()


QUERIES = {
    "q268_label_silhouette": q268_label_silhouette,
    "q286_cross_corpus_ann": q286_cross_corpus_ann,
    "q275_embedding_drift": q275_embedding_drift,
    "q208_jl_certificate": q208_jl_certificate,
    "q220_hamming_topk": q220_hamming_topk,
    "q219_ivf_cell_audit": q219_ivf_cell_audit,
    "q185_hard_negatives": q185_hard_negatives,
    "q186_knn_label_eval": q186_knn_label_eval,
    "q50_ann_brute_topk": q50_ann_brute_topk,
    "q51_cosine_neardup": q51_cosine_neardup,
    "q52_lsh_topk": q52_lsh_topk,
    "q53_ivf_topk": q53_ivf_topk,
    "q66_pq_topk": q66_pq_topk,
    "q67_pq_kmeans_train": q67_pq_kmeans_train,
    "q96_rrf_fusion": q96_rrf_fusion,
    "q108_editdist_join": q108_editdist_join,
    "q118_semantic_dedup": q118_semantic_dedup,
    "q165_int8_quantize": q165_int8_quantize,
    "q181_rank_transform": q181_rank_transform,
    "q182_ivfpq_topk": q182_ivfpq_topk,
}

ORACLES = {
    "q208_jl_certificate": Q208_SQL,
    "q286_cross_corpus_ann": Q286_SQL,
    "q220_hamming_topk": Q220_SQL,
    "q219_ivf_cell_audit": Q219_SQL,
    "q185_hard_negatives": Q185_SQL,
    "q186_knn_label_eval": Q186_SQL,
    "q50_ann_brute_topk": Q50_SQL,
    "q67_pq_kmeans_train": Q67_SQL,
    "q51_cosine_neardup": Q51_SQL,
    "q52_lsh_topk": Q52_SQL,
    "q53_ivf_topk": Q53_SQL,
    "q66_pq_topk": Q66_SQL,
    "q96_rrf_fusion": Q96_SQL,
    "q108_editdist_join": Q108_SQL,
    "q118_semantic_dedup": Q118_SQL,
    "q165_int8_quantize": Q165_SQL,
    "q181_rank_transform": Q181_SQL,
    "q182_ivfpq_topk": Q182_SQL,
    "q268_label_silhouette": Q268_SQL,
    "q275_embedding_drift": Q275_SQL,
}
