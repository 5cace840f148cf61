"""bpe_train vs a pure-Python reference of the same defined scheme:
each round counts adjacent symbol pairs corpus-weighted, picks the
(cnt DESC, left ASC, right ASC) argmax, and applies it as a
separator-padded string REPLACE — the exact semantics both engines
implement (Python str.replace shares them), which differs from greedy
tuple-scan BPE only inside runs of ≥4 same-boundary symbols (the
replace's consumed trailing separator skips the immediately-adjacent
overlapping occurrence; the fixture's 'aaaa' word exercises this).
"""

from __future__ import annotations

from collections import Counter

import pytest

SEP = "\x1f"


def _ref_bpe(word_freqs: dict[str, int], n_merges: int):
    vocab: dict[tuple, int] = {}
    for w, f in word_freqs.items():
        k = tuple(w)
        vocab[k] = vocab.get(k, 0) + f
    merges = []
    for rk in range(1, n_merges + 1):
        counts: Counter = Counter()
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] += f
        if not counts:
            break
        (x, y), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((rk, x, y, x + y, cnt))
        new_vocab: dict[tuple, int] = {}
        for syms, f in vocab.items():
            padded = SEP + SEP.join(syms) + SEP
            merged = padded.replace(
                SEP + x + SEP + y + SEP, SEP + x + y + SEP
            )
            key = tuple(s for s in merged.split(SEP) if s)
            new_vocab[key] = new_vocab.get(key, 0) + f
        vocab = new_vocab
    return merges


@pytest.mark.parametrize("n_merges", [5, 12])
def test_bpe_train_matches_reference(spark, n_merges):
    from binance_data_ingestor_spark.operators.text import bpe_train

    docs = [
        "low low low low low",
        "lower lower newest newest newest",
        "newest newest newest widest widest",
        "widest aaaa aaaa aa a banana banana bandana",
    ]
    df = spark.createDataFrame([(d,) for d in docs], "text string")
    got = [
        (r.rk, r.left_sym, r.right_sym, r.merged, r.cnt)
        for r in bpe_train(df, n_merges=n_merges).orderBy("rk").collect()
    ]
    freqs: Counter = Counter(w for d in docs for w in d.split(" ") if w)
    assert got == _ref_bpe(dict(freqs), n_merges)


def test_bpe_word_tokens_matches_reference_encoding(spark):
    from binance_data_ingestor_spark.operators.text import (
        bpe_train,
        bpe_word_tokens,
    )

    docs = [
        "low low low low low lower lower",
        "newest newest newest newest widest widest aaaa aa banana",
    ]
    df = spark.createDataFrame([(d,) for d in docs], "text string")
    merges = [
        (r.left_sym, r.right_sym)
        for r in bpe_train(df, n_merges=8).orderBy("rk").collect()
    ]
    words = sorted({w for d in docs for w in d.split(" ") if w})
    wdf = spark.createDataFrame([(w,) for w in words], "w string")
    got = {r.w: r.w_tokens for r in bpe_word_tokens(wdf, merges).collect()}

    def encode(w):
        s = SEP + SEP.join(w) + SEP
        for x, y in merges:
            s = s.replace(SEP + x + SEP + y + SEP, SEP + x + y + SEP)
        return len([t for t in s.split(SEP) if t])

    assert got == {w: encode(w) for w in words}


def test_replace_overlap_semantics_pinned_across_engines(spark, duck):
    """The q188/q189 oracles depend on Spark replace, DuckDB replace,
    and Python str.replace agreeing on the overlap case (a match
    consumes its trailing separator, skipping an immediately-adjacent
    occurrence). The sf fixtures may not contain ≥4-symbol runs, so pin
    it directly on adversarial strings."""
    from pyspark.sql import functions as F

    cases = [
        ("a", "a", ["aaaaa", "aaaa", "aaa", "aa"]),
        ("x", "y", ["xyxyxy", "xyxy", "yxyx"]),
        ("ab", "c", ["?"]),  # placeholder, replaced below
    ]
    for x, y, words in cases:
        pat = SEP + x + SEP + y + SEP
        rep = SEP + x + y + SEP
        for w in words:
            if w == "?":
                padded = SEP + "ab" + SEP + "c" + SEP + "ab" + SEP + "c" + SEP
            else:
                padded = SEP + SEP.join(w) + SEP
            py = padded.replace(pat, rep)
            sp = (
                spark.range(1)
                .select(
                    F.replace(F.lit(padded), F.lit(pat), F.lit(rep)).alias("s")
                )
                .collect()[0]["s"]
            )
            dk = duck.execute(
                "SELECT replace(?, ?, ?)", [padded, pat, rep]
            ).fetchone()[0]
            assert sp == py == dk, (x, y, w, py, sp, dk)


def test_bpe_train_single_char_and_empty_words(spark):
    from binance_data_ingestor_spark.operators.text import bpe_train

    # single-char words contribute no pairs; empty splits are dropped
    df = spark.createDataFrame(
        [("a b c  d",), ("ab ab",)], "text string"
    )
    got = bpe_train(df, n_merges=3).orderBy("rk").collect()
    # only one mergeable pair exists ('a','b') ×2; after merging it no
    # pairs remain, so training stops early
    assert [(r.rk, r.left_sym, r.right_sym, r.cnt) for r in got] == [
        (1, "a", "b", 2)
    ]
