"""Text-analysis operators for large-scale training-data pipelines.

Language-ID (stopword heuristic), quality scoring, token counting, and
document fingerprinting — all pure column expressions (JVM-side,
whole-stage codegen; no UDFs), so they scan 100 TB at parquet-read
speed with zero Python overhead.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# small English function-word list for the language heuristic
EN_STOPWORDS = ("the", "a", "of", "to", "and", "in", "is", "it", "for", "on")


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization (single-space convention of the corpus)."""
    return F.split(F.col(col) if isinstance(col, str) else col, " ")


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


def distinct_token_count(col: Column | str) -> Column:
    return F.size(F.array_distinct(tokens(col)))


def stopword_count(col: Column | str, stopwords: tuple[str, ...] = EN_STOPWORDS) -> Column:
    return F.size(F.filter(tokens(col), lambda t: t.isin(*stopwords)))


def lang_guess(col: Column | str, threshold: float = 0.08) -> Column:
    """n-gram-free language ID heuristic: English function-word density.
    (Real pipelines plug a fastText-style model in as a Pandas UDF; the
    heuristic keeps the operator UDF-free and oracle-checkable.)"""
    ratio = stopword_count(col) / token_count(col)
    return F.when(ratio > threshold, F.lit("en")).otherwise(F.lit("unknown"))


def normalized_text(col: Column | str) -> Column:
    """Canonical form for fingerprinting: collapse whitespace, lowercase, trim."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def fingerprint(col: Column | str) -> Column:
    """Deterministic 128-bit document fingerprint (md5 of normalized text).
    Exact-dedup joins group on this instead of the full text — at 100 TB
    the shuffle carries 16 bytes per doc, not the document body."""
    return F.md5(normalized_text(col))


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality-scoring feature block: length, token stats, lexical
    diversity, stopword density. Downstream filters compose on these."""
    t = F.col(text_col)
    n_tok = token_count(t)
    return (
        df.withColumn("n_chars_q", F.length(t))
        .withColumn("n_tokens", n_tok)
        .withColumn("n_distinct_tokens", distinct_token_count(t))
        .withColumn("lexical_diversity", F.round(distinct_token_count(t) / n_tok, 6))
        .withColumn("stopword_ratio", F.round(stopword_count(t) / n_tok, 6))
        .withColumn(
            "avg_token_len",
            F.round((F.length(t) - (n_tok - 1)) / n_tok, 6),
        )
    )
