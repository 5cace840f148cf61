"""Open-vocabulary Zipfian documents — the corpus the q229↔q233
containment crossover claim needs MEASURED on (SCALING.md; round-7
VERDICT item 3).

The driver's synthetic corpus has a CLOSED ~30k-shingle vocabulary, so
every shingle's document frequency grows linearly with N and Σ df² is
quadratic for ANY candidate generator — prefix filtering cannot win
there by construction. Real web/code corpora are open-vocabulary
(Heaps' law): the type inventory grows ~N^β, per-type df growth slows,
and the rarest-first prefix join's candidate set grows subquadratically
while the naive inverted-index join still pairs every co-occurrence of
COMMON shingles. This generator produces that regime deterministically:

- token stream: a three-part mixture calibrated to natural-language
  frequency shape (a pure Zipf(1.3) head puts ~25% of ALL tokens on
  rank 1 — head trigrams then sit in ~everything and the naive join
  explodes harder than the closed corpus, which would measure the
  wrong thing):
    * NEW_RATE (5%): a brand-new type (ids creation-ordered) — the
      Heaps-law vocabulary growth;
    * HEAD_RATE (30%): Zipf(1.5) over a FIXED 1000-type head (the
      stopword band, ~natural "the"≈6% at rank 1);
    * remainder (65%): uniform over the vocabulary that exists so far
      (the long tail whose per-type df stays O(1) as N grows — the
      property that separates open from closed vocabularies).
- doc lengths are resampled from the real sf0.1 corpus' empirical
  length distribution, so shingle counts per doc match the certified
  benchmarks.
- seeded numpy end to end; corpus size is doc-count-matched to the
  requested SF (sf0.1 → 5000 docs, sf1 → 50000).

Usage: python scripts/gen_openvocab.py [--docs 5000]
       [--dst /root/repo/.benchdata/openvocab_sf0.1]
"""

from __future__ import annotations

import argparse
import os

import duckdb
import numpy as np

NEW_RATE = 0.05
HEAD_TYPES = 1000
ZIPF_A = 1.5


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=5000)
    ap.add_argument("--dst", default="/root/repo/.benchdata/openvocab_sf0.1")
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument(
        "--head-rate",
        type=float,
        default=0.30,
        help="share of tokens drawn from the fixed Zipf head; 0.30 is "
        "the low-co-occurrence regime (tail-dominated, few shared "
        "shingles), 0.50 the stopword-heavy regime where head "
        "trigrams make the naive candidate set quadratic",
    )
    args = ap.parse_args()
    os.makedirs(args.dst, exist_ok=True)
    rng = np.random.default_rng(8)

    base_lens = np.array(
        [
            r[0]
            for r in duckdb.sql(
                f"SELECT len(string_split(text, ' ')) "
                f"FROM '{args.src}/documents.parquet'"
            ).fetchall()
        ]
    )
    lens = rng.choice(base_lens, size=args.docs)
    total = int(lens.sum())

    u = rng.random(total)
    is_new = u < NEW_RATE
    is_head = (~is_new) & (u < NEW_RATE + args.head_rate)
    is_new[0] = True  # the first token must create a type
    is_head[0] = False
    # type id of the p-th NEW token is its creation index; vocab size
    # BEFORE position p is the exclusive cumsum of is_new. Head types
    # live in a dedicated id space 'h{rank}' so the head band is fixed
    # regardless of corpus size.
    created_before = np.cumsum(is_new) - is_new.astype(np.int64)
    head_rank = (rng.zipf(ZIPF_A, size=total) - 1) % HEAD_TYPES
    tail_id = np.minimum(
        (rng.random(total) * np.maximum(created_before, 1)).astype(np.int64),
        np.maximum(created_before - 1, 0),
    )
    token_id = np.where(is_new, created_before, tail_id)

    vocab_final = int(is_new.sum())
    print(
        f"docs={args.docs} tokens={total} vocab={vocab_final} "
        f"(heaps beta ~ {np.log(vocab_final) / np.log(total):.3f})"
    )

    words = np.where(
        is_head,
        np.char.add("h", head_rank.astype("U6")),
        np.char.add("w", token_id.astype("U8")),
    )
    texts = []
    pos = 0
    for ln in lens:
        ln = int(ln)
        texts.append(" ".join(words[pos : pos + ln]))
        pos += ln
    con = duckdb.connect()
    con.sql(
        "CREATE TABLE d (doc_id BIGINT, text VARCHAR, lang VARCHAR, "
        "source VARCHAR, n_chars BIGINT)"
    )
    con.executemany(
        "INSERT INTO d VALUES (?, ?, ?, ?, ?)",
        [
            (i, t, "en", f"src_{i % 4}", len(t))
            for i, t in enumerate(texts)
        ],
    )
    con.sql(
        f"COPY (SELECT * FROM d ORDER BY doc_id) TO "
        f"'{args.dst}/documents.parquet' (FORMAT PARQUET)"
    )
    n = con.sql(
        f"SELECT count(*) FROM '{args.dst}/documents.parquet'"
    ).fetchone()[0]
    print(f"wrote {n} docs -> {args.dst}/documents.parquet")


if __name__ == "__main__":
    main()
