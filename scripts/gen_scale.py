"""Synthesize a larger scale factor from the driver's sf0.1 fixtures —
the data side of the sf1 scaling study (SCALING.md).

No driver-generated sf1 exists, so this derives one that preserves the
fixtures' SHAPE while actually growing the entity dimensions the scale
arguments hinge on:

- **Relational tables** (customer/supplier/part/orders/lineitem,
  events): replicated FACTOR× with disjoint key ranges — every key
  column (and its foreign-key references) is offset by
  ``copy * (max_key + 1)`` consistently across tables, so join
  fan-outs and per-key row counts stay EXACTLY the base distribution
  while key cardinalities scale linearly (the "bigger catalog, same
  density" axis: 10× parts, 10× customers, 10× users). region/nation
  stay fixed — they are bounded dims at any SF.
- **documents**: originals + fresh synthetic docs sampled from the
  base corpus' empirical vocabulary (unigram frequencies) and length
  distribution, seeded — replicating text verbatim would hand the
  near-dup operators FACTOR² candidate pairs per original and turn
  the dedup benchmarks into an adversarial corpus instead of a
  scaled one.
- **embeddings**: originals + synthetic vectors from the base set's
  per-dimension empirical mean/std (float32), labels resampled from
  the empirical label distribution.

Timestamps are untouched: the fixtures' time span is an axis the
driver holds constant across its own SFs (more rows per day, not more
days), and the replication preserves that.

Usage: python scripts/gen_scale.py [--factor 10] [--src /root/testdata/sf0.1]
       [--dst /root/repo/.benchdata/sf1]
"""

from __future__ import annotations

import argparse
import os

import duckdb
import numpy as np

TABLES_COPY = ["region", "nation"]


def _offset(con, table: str, col: str) -> int:
    return int(con.sql(f"SELECT max({col}) + 1 FROM {table}").fetchone()[0])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", default="/root/repo/.benchdata/sf1")
    args = ap.parse_args()
    os.makedirs(args.dst, exist_ok=True)

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{args.src}/{t}.parquet'"
        )

    def write(sql: str, table: str) -> None:
        con.sql(
            f"COPY ({sql}) TO '{args.dst}/{table}.parquet' (FORMAT PARQUET)"
        )
        n = con.sql(
            f"SELECT count(*) FROM '{args.dst}/{table}.parquet'"
        ).fetchone()[0]
        print(f"{table}: {n} rows")

    for t in TABLES_COPY:
        write(f"SELECT * FROM {t}", t)

    f = args.factor
    off_c = _offset(con, "customer", "c_custkey")
    off_s = _offset(con, "supplier", "s_suppkey")
    off_p = _offset(con, "part", "p_partkey")
    off_o = _offset(con, "orders", "o_orderkey")
    off_u = _offset(con, "events", "user_id")
    off_e = _offset(con, "events", "event_id")

    write(
        f"""SELECT c_custkey + k.k * {off_c} AS c_custkey, c_name,
               c_nationkey, c_acctbal, c_mktsegment
        FROM customer, range(0, {f}) k(k)""",
        "customer",
    )
    write(
        f"""SELECT s_suppkey + k.k * {off_s} AS s_suppkey, s_name,
               s_nationkey, s_acctbal
        FROM supplier, range(0, {f}) k(k)""",
        "supplier",
    )
    write(
        f"""SELECT p_partkey + k.k * {off_p} AS p_partkey, p_name, p_brand,
               p_type, p_size, p_retailprice
        FROM part, range(0, {f}) k(k)""",
        "part",
    )
    write(
        f"""SELECT o_orderkey + k.k * {off_o} AS o_orderkey,
               o_custkey + k.k * {off_c} AS o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM orders, range(0, {f}) k(k)""",
        "orders",
    )
    write(
        f"""SELECT l_orderkey + k.k * {off_o} AS l_orderkey,
               l_partkey + k.k * {off_p} AS l_partkey,
               l_suppkey + k.k * {off_s} AS l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount,
               l_tax, l_returnflag, l_linestatus, l_shipdate
        FROM lineitem, range(0, {f}) k(k)""",
        "lineitem",
    )
    write(
        f"""SELECT event_id + k.k * {off_e} AS event_id, ts,
               user_id + k.k * {off_u} AS user_id,
               event_type, value, props
        FROM events, range(0, {f}) k(k)""",
        "events",
    )

    # ---- documents: originals + fresh synthetic text -----------------
    rng = np.random.default_rng(42)
    base = con.sql(
        "SELECT doc_id, text, lang, source FROM documents ORDER BY doc_id"
    ).fetchall()
    vocab: dict[str, int] = {}
    lengths = []
    meta = []
    for _, text, lang, source in base:
        words = text.split(" ")
        lengths.append(len(words))
        meta.append((lang, source))
        for w in words:
            vocab[w] = vocab.get(w, 0) + 1
    words_arr = np.array(list(vocab.keys()))
    freq = np.array(list(vocab.values()), dtype=np.float64)
    freq /= freq.sum()
    lengths = np.array(lengths)
    max_id = max(r[0] for r in base)
    n_new = (args.factor - 1) * len(base)
    new_lens = rng.choice(lengths, size=n_new)
    meta_idx = rng.integers(0, len(meta), size=n_new)
    flat = rng.choice(words_arr, size=int(new_lens.sum()), p=freq)
    rows = []
    pos = 0
    for i in range(n_new):
        ln = int(new_lens[i])
        text = " ".join(flat[pos : pos + ln])
        pos += ln
        lang, source = meta[meta_idx[i]]
        rows.append((int(max_id + 1 + i), text, lang, source, len(text)))
    con.sql("CREATE TABLE newdocs (doc_id BIGINT, text VARCHAR, lang VARCHAR, source VARCHAR, n_chars BIGINT)")
    con.executemany("INSERT INTO newdocs VALUES (?, ?, ?, ?, ?)", rows)
    write(
        "SELECT doc_id, text, lang, source, n_chars FROM documents "
        "UNION ALL SELECT * FROM newdocs",
        "documents",
    )

    # ---- embeddings: originals + per-dim empirical gaussians ---------
    emb = con.sql(
        "SELECT vec_id, embedding, label FROM embeddings ORDER BY vec_id"
    ).fetchall()
    M = np.array([e[1] for e in emb], dtype=np.float64)
    labels = np.array([e[2] for e in emb])
    mu, sd = M.mean(axis=0), M.std(axis=0)
    max_vid = max(e[0] for e in emb)
    n_new = (args.factor - 1) * len(emb)
    newM = rng.normal(mu, sd, size=(n_new, M.shape[1])).astype(np.float32)
    new_labels = rng.choice(labels, size=n_new)
    erows = [
        (int(max_vid + 1 + i), [float(x) for x in newM[i]], int(new_labels[i]))
        for i in range(n_new)
    ]
    con.sql("CREATE TABLE newemb (vec_id BIGINT, embedding FLOAT[], label INTEGER)")
    con.executemany("INSERT INTO newemb VALUES (?, ?, ?)", erows)
    write(
        "SELECT vec_id, embedding, label FROM embeddings "
        "UNION ALL SELECT * FROM newemb",
        "embeddings",
    )


if __name__ == "__main__":
    main()
