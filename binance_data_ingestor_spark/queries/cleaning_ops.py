"""Rule-based text cleaning + PII-style masking — the scrub stage of a
training-data pipeline (C4-style boilerplate removal, digit/email
redaction), all pure codegen'd regexp expressions: no UDFs, no
shuffles beyond the terminal collect — these scan at parquet-read
speed and scale embarrassingly.

Reference tie-in: the reference never cleans payloads, but its sink
boundary does the same shape of per-record string rewriting
(`/root/reference/binance-di.py:130-132` envelope construction).

Regex dialect note: patterns stay within the ASCII subset where Java
regex (Spark) and RE2 (DuckDB) agree — character classes, bounded
quantifiers, alternation, word boundaries; no backrefs or lookaround.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .util import load

# function words scrubbed from training text (blocklist scrub)
SCRUB_WORDS = ("the", "a", "of", "to")
SCRUB_PAT = r"\b(?:" + "|".join(SCRUB_WORDS) + r")\b"

# email-shaped tokens OR digit runs → masked (emails never occur in the
# synthetic corpus; digit runs occur in event props — both branches use
# the identical machinery)
PII_PAT = r"[A-Za-z0-9.%+-]+@[A-Za-z0-9.-]+|[0-9]+"
PII_MASK = "<X>"


# --------------------------------------------------------------------------
# q80 — blocklist scrub over documents: remove function words, collapse
# the leftover whitespace, report per-doc removal counts and the
# cleaned text. Zero shuffles (narrow select over the scan).
# --------------------------------------------------------------------------
def q80_text_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    cleaned = F.trim(
        F.regexp_replace(F.regexp_replace("text", SCRUB_PAT, ""), " {2,}", " ")
    )
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit(SCRUB_PAT), F.lit(0))).alias(
            "n_removed"
        ),
        cleaned.alias("clean_text"),
        F.length(cleaned).alias("clean_len"),
    )


Q80_SQL = f"""
SELECT doc_id,
       len(regexp_extract_all(text, '{SCRUB_PAT}')) AS n_removed,
       trim(regexp_replace(regexp_replace(text, '{SCRUB_PAT}', '', 'g'),
                           ' {{2,}}', ' ', 'g')) AS clean_text,
       length(trim(regexp_replace(regexp_replace(text, '{SCRUB_PAT}', '', 'g'),
                                  ' {{2,}}', ' ', 'g'))) AS clean_len
FROM documents
"""


# --------------------------------------------------------------------------
# q81 — PII-style masking over event props: digit runs / email-shaped
# tokens replaced with a mask token; the numeric payload is extracted
# via JSON path before masking destroys it. Narrow, shuffle-free.
# --------------------------------------------------------------------------
def q81_pii_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select("event_id", "props")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("k_value"),
        F.regexp_replace("props", PII_PAT, PII_MASK).alias("masked_props"),
        (
            F.length("props")
            - F.length(F.regexp_replace("props", r"[0-9]", ""))
        ).alias("n_digit_chars"),
    )


Q81_SQL = f"""
SELECT event_id,
       CAST(props->>'$.k' AS BIGINT) AS k_value,
       regexp_replace(props, '{PII_PAT}', '{PII_MASK}', 'g') AS masked_props,
       length(props) - length(regexp_replace(props, '[0-9]', '', 'g'))
         AS n_digit_chars
FROM events
"""


QUERIES = {
    "q80_text_scrub": q80_text_scrub,
    "q81_pii_mask": q81_pii_mask,
}

ORACLES = {
    "q80_text_scrub": Q80_SQL,
    "q81_pii_mask": Q81_SQL,
}
