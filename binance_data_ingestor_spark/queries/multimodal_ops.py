"""Multimodal-column queries, oracle-checked against DuckDB.

The synthetic ``media`` relation is derived deterministically from the
`documents` table on BOTH engines: payload = UTF-8 bytes of the text
(an opaque blob as far as the operators are concerned), media_type and
decode metadata from doc_id arithmetic. The operators under test are
the real ones from operators/multimodal.py — structural metadata,
frame sampling (byte slicing), and the Arrow-batched byte-histogram
feature extractor; only the payload synthesis is test scaffolding.

North-star addition (BASELINE.json): the reference repo
(`/root/reference/binance-di.py`) has no media surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.multimodal import (
    byte_histogram,
    perceptual_hash16,
    decode_media,
    media_metadata,
    resize_raster,
    sample_frames,
)
from ..operators.partitioning import fanout
from .util import load

N_FRAMES = 4


def _media(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    mt = (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    return docs.select(
        "doc_id",
        mt.alias("media_type"),
        F.encode(F.col("text"), "UTF-8").alias("content"),
        (16 + F.col("doc_id") % 32).cast("int").alias("width"),
        (16 + F.col("doc_id") % 17).cast("int").alias("height"),
    )


_SQL_MEDIA = """
media AS (
  SELECT doc_id,
         CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
              ELSE 'video' END                    AS media_type,
         encode(text)                             AS content,
         CAST(16 + doc_id % 32 AS INTEGER)        AS width,
         CAST(16 + doc_id % 17 AS INTEGER)        AS height
  FROM documents
)
"""


# --------------------------------------------------------------------------
# q60 — structural metadata over binary payloads (pure codegen exprs).
# --------------------------------------------------------------------------
def q60_media_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    return media_metadata(_media(spark, sf_dir)).select(
        "doc_id", "media_type", "width", "height", "n_bytes", "magic_hex"
    )


Q60_SQL = f"""
WITH {_SQL_MEDIA}
SELECT doc_id, media_type, width, height,
       octet_length(content)                 AS n_bytes,
       substring(upper(hex(content)), 1, 8)  AS magic_hex
FROM media
"""


# --------------------------------------------------------------------------
# q61 — frame sampling: fixed-stride byte slices, one row per frame.
# --------------------------------------------------------------------------
def q61_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    frames = sample_frames(_media(spark, sf_dir), n_frames=N_FRAMES)
    return frames.select(
        "doc_id",
        "frame_idx",
        F.length("frame").alias("frame_bytes"),
        F.hex(F.expr("substring(frame, 1, 2)")).alias("frame_head_hex"),
    )


# this DuckDB build has no BLOB substring — the oracle does the same
# byte arithmetic on the hex representation (2 hex chars per byte)
Q61_SQL = f"""
WITH {_SQL_MEDIA},
sized AS (
  SELECT doc_id, upper(hex(content)) AS h,
         octet_length(content) // {N_FRAMES} AS flen
  FROM media WHERE octet_length(content) // {N_FRAMES} > 0
)
SELECT doc_id,
       CAST(r.i AS INTEGER)                                      AS frame_idx,
       length(substring(h, 2 * flen * r.i + 1, 2 * flen)) // 2   AS frame_bytes,
       substring(substring(h, 2 * flen * r.i + 1, 2 * flen), 1, 4)
                                                                 AS frame_head_hex
FROM sized, range(0, {N_FRAMES}) AS r(i)
"""


# --------------------------------------------------------------------------
# q62 — Arrow-batched byte-nibble histogram (the feature-extract shape).
# Oracle: high nibble of byte k = hex digit at position 2k+1.
# --------------------------------------------------------------------------
def q62_byte_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    return byte_histogram(fanout(_media(spark, sf_dir)))


Q62_SQL = f"""
WITH {_SQL_MEDIA},
hx AS (SELECT doc_id, upper(hex(content)) AS h FROM media),
ks AS (SELECT doc_id, h, unnest(range(0, length(h) // 2)) AS k FROM hx),
nib AS (
  SELECT doc_id,
         strpos('0123456789ABCDEF', substring(h, 2 * k + 1, 1)) - 1 AS bin
  FROM ks
)
SELECT doc_id, CAST(bin AS INTEGER) AS bin, count(*) AS n
FROM nib GROUP BY doc_id, bin
"""


# --------------------------------------------------------------------------
# q63 — unified decode dispatch over the generic (non-container) path.
# decode_media real-decodes payloads whose magic identifies an in-repo
# parser (RIFF/WAVE, PPM P6 — those paths are hash-certified by the
# q178/q179 parameter-round-trip oracles); everything else gets exact
# vectorized byte statistics (n_samples = byte length, byte_sum = sum
# of byte values). The media fixture here is UTF-8 text, so a payload
# COULD accidentally start with a container magic and real-decode —
# diverging from this oracle, which only knows the generic facts. Both
# sides therefore exclude container-magic payloads with the IDENTICAL
# 12-byte predicate (magic only — not body validity, which the oracle
# cannot see), making operator and oracle semantics equal by
# construction while keeping the full dispatch kernel in the plan.
# --------------------------------------------------------------------------
def q63_decode_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = _media(spark, sf_dir)
    is_wav = (F.substring("content", 1, 4) == F.lit(b"RIFF")) & (
        F.substring("content", 9, 4) == F.lit(b"WAVE")
    )
    is_ppm = F.substring("content", 1, 2) == F.lit(b"P6")
    return decode_media(fanout(m.filter(~(is_wav | is_ppm))))


# RIFF = 52494646, WAVE = 57415645, P6 = 5036 (hex of ASCII magic)
Q63_SQL = f"""
WITH {_SQL_MEDIA},
hx AS (SELECT doc_id, media_type, width, height, upper(hex(content)) AS h
       FROM media
       WHERE NOT ((substring(upper(hex(content)), 1, 8) = '52494646'
                   AND substring(upper(hex(content)), 17, 8) = '57415645')
                  OR substring(upper(hex(content)), 1, 4) = '5036')),
ks AS (SELECT doc_id, h, unnest(range(0, length(h) // 2)) AS k FROM hx),
byte_vals AS (
  SELECT doc_id,
         (strpos('0123456789ABCDEF', substring(h, 2 * k + 1, 1)) - 1) * 16 +
         strpos('0123456789ABCDEF', substring(h, 2 * k + 2, 1)) - 1 AS v
  FROM ks
),
stats AS (
  SELECT doc_id, count(*) AS n_samples,
         CAST(sum(v) AS BIGINT) AS byte_sum
  FROM byte_vals GROUP BY doc_id
)
SELECT hx.doc_id AS doc_id, media_type, width, height,
       coalesce(n_samples, 0) AS n_samples,
       coalesce(byte_sum, 0)  AS byte_sum
FROM hx LEFT JOIN stats ON hx.doc_id = stats.doc_id
"""


# --------------------------------------------------------------------------
# q64 — resize (nearest-neighbor stride downsample) of a byte raster to
# a fixed 4×3 thumbnail. Kernel is vectorized numpy strided indexing
# under mapInPandas; the oracle reproduces the 12 sampled byte
# positions on the hex representation.
# --------------------------------------------------------------------------
OUT_W, OUT_H = 4, 3


def q64_resize_raster(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = _media(spark, sf_dir).select(
        "doc_id",
        "content",
        (8 + F.col("doc_id") % 5).cast("int").alias("raster_w"),
        (4 + F.col("doc_id") % 3).cast("int").alias("raster_h"),
    )
    out = resize_raster(fanout(m), out_w=OUT_W, out_h=OUT_H)
    return out.select("doc_id", F.hex("resized").alias("resized_hex"))


def _resize_sql() -> str:
    # pixel (i, j) samples source byte (i*(rh//3))*rw + j*(rw//4);
    # hex digit pair for 0-based byte k starts at char 2k+1
    terms = []
    for i in range(OUT_H):
        for j in range(OUT_W):
            k = f"(({i} * (rh // {OUT_H})) * rw + {j} * (rw // {OUT_W}))"
            terms.append(f"substring(h, 2 * {k} + 1, 2)")
    return f"""
WITH {_SQL_MEDIA},
sized AS (
  SELECT doc_id, upper(hex(content)) AS h,
         CAST(8 + doc_id % 5 AS INTEGER) AS rw,
         CAST(4 + doc_id % 3 AS INTEGER) AS rh
  FROM media
  WHERE octet_length(content) >= (8 + doc_id % 5) * (4 + doc_id % 3)
)
SELECT doc_id, concat({", ".join(terms)}) AS resized_hex
FROM sized
"""


Q64_SQL = _resize_sql()


# --------------------------------------------------------------------------
# q65 — media perceptual hash + near-dup blocking: 16-bit aHash from the
# nibble histogram, plus the size of each hash bucket (the candidate
# group a dedup pass would refine). The multimodal twin of q46/q45:
# 2-byte blocking keys shuffle, payloads never do.
# --------------------------------------------------------------------------
def q65_media_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    ph = perceptual_hash16(fanout(_media(spark, sf_dir)))
    return ph.withColumn(
        "n_same_hash", F.count("*").over(W.partitionBy("phash"))
    ).select("doc_id", "phash", "n_same_hash")


Q65_SQL = f"""
WITH {_SQL_MEDIA},
hx AS (SELECT doc_id, upper(hex(content)) AS h FROM media),
ks AS (SELECT doc_id, h, unnest(range(0, length(h) // 2)) AS k FROM hx),
nib AS (
  SELECT doc_id,
         strpos('0123456789ABCDEF', substring(h, 2 * k + 1, 1)) - 1 AS bin
  FROM ks
),
hist AS (SELECT doc_id, bin, count(*) AS n FROM nib GROUP BY 1, 2),
tot AS (SELECT doc_id, bin, n,
               sum(n) OVER (PARTITION BY doc_id) AS total FROM hist),
ph AS (
  SELECT doc_id,
         CAST(sum(CASE WHEN n * 16 > total
                       THEN (CAST(1 AS BIGINT) << bin) ELSE 0 END) AS BIGINT)
         AS phash
  FROM tot GROUP BY doc_id
)
SELECT doc_id, phash,
       CAST(count(*) OVER (PARTITION BY phash) AS BIGINT) AS n_same_hash
FROM ph
"""


# --------------------------------------------------------------------------
# q178 — REAL codec round-trip: valid RIFF/WAVE PCM16 payloads are
# synthesized from deterministic parameters (rate from doc_id, samples
# from the md5 hex of the text), then decoded by the actual chunk-walk
# parser in operators/multimodal.parse_wav_pcm16 — not the stub. The
# oracle predicts every decoded fact from the same parameters WITHOUT
# touching bytes, so the driver's hash gate certifies the parser: any
# header mis-read, chunk mis-walk, or sample mis-decode breaks the
# match. All facts are exact integers (sum of |int16 samples|).
# --------------------------------------------------------------------------
def q178_wav_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib

    import numpy as np
    import pandas as pd

    from ..operators.multimodal import decode_wav, wav_pcm16_bytes

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")

    def synth(batches):
        for pdf in batches:
            ids, blobs = [], []
            for _, r in pdf.iterrows():
                h = hashlib.md5(r["text"].encode("utf-8")).hexdigest()
                n = 40 + int(r["doc_id"]) % 32
                rate = 8000 + (int(r["doc_id"]) % 3) * 4000
                vals = np.array(
                    [int(h[i % 32], 16) * 2000 - 15000 for i in range(n)],
                    dtype=np.int16,
                )
                ids.append(int(r["doc_id"]))
                blobs.append(wav_pcm16_bytes(rate, vals))
            yield pd.DataFrame({"doc_id": ids, "content": blobs})

    wavs = fanout(docs).mapInPandas(synth, "doc_id long, content binary")
    return decode_wav(wavs)


Q178_SQL = """
WITH p AS (
  SELECT doc_id, md5(text) AS h,
         40 + doc_id % 32 AS n,
         CAST(8000 + (doc_id % 3) * 4000 AS INTEGER) AS sample_rate
  FROM documents),
s AS (
  SELECT doc_id, sample_rate, n,
         unnest(generate_series(0, n - 1)) AS i, h
  FROM p)
SELECT doc_id, sample_rate,
       CAST(1 AS INTEGER) AS n_channels,
       CAST(16 AS INTEGER) AS bits_per_sample,
       CAST(max(n) AS BIGINT) AS n_samples,
       CAST(sum(abs((strpos('0123456789abcdef',
                            substring(h, (i % 32) + 1, 1)) - 1) * 2000
                    - 15000)) AS BIGINT) AS sum_abs
FROM s GROUP BY doc_id, sample_rate
"""


# --------------------------------------------------------------------------
# q179 — image twin of q178: valid binary PPM (P6) images synthesized
# from deterministic parameters (dimensions from doc_id, pixels from
# the md5 hex of the text, one header COMMENT line to exercise the
# tokenizer), decoded by the real parser in
# operators/multimodal.parse_ppm_p6. The oracle predicts width,
# height, pixel count, and exact per-channel sums without touching
# bytes — a wrong header tokenize, comment skip, or raster decode
# breaks the hash.
# --------------------------------------------------------------------------
def q179_ppm_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib

    import numpy as np
    import pandas as pd

    from ..operators.multimodal import decode_ppm

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")

    def synth(batches):
        for pdf in batches:
            ids, blobs = [], []
            for _, r in pdf.iterrows():
                h = hashlib.md5(r["text"].encode("utf-8")).hexdigest()
                w = 4 + int(r["doc_id"]) % 5
                ht = 3 + int(r["doc_id"]) % 4
                rgb = np.array(
                    [int(h[k % 32], 16) * 17 for k in range(w * ht * 3)],
                    dtype=np.uint8,
                )
                header = f"P6\n# synthetic {r['doc_id']}\n{w} {ht}\n255\n"
                ids.append(int(r["doc_id"]))
                blobs.append(header.encode("ascii") + rgb.tobytes())
            yield pd.DataFrame({"doc_id": ids, "content": blobs})

    ppms = fanout(docs).mapInPandas(synth, "doc_id long, content binary")
    return decode_ppm(ppms)


Q179_SQL = """
WITH p AS (
  SELECT doc_id, md5(text) AS h,
         CAST(4 + doc_id % 5 AS INTEGER) AS width,
         CAST(3 + doc_id % 4 AS INTEGER) AS height
  FROM documents),
px AS (
  SELECT doc_id, width, height, h,
         unnest(generate_series(0, width * height - 1)) AS i
  FROM p),
ch AS (
  SELECT doc_id, width, height,
         (strpos('0123456789abcdef',
                 substring(h, ((3 * i + 0) % 32) + 1, 1)) - 1) * 17 AS r,
         (strpos('0123456789abcdef',
                 substring(h, ((3 * i + 1) % 32) + 1, 1)) - 1) * 17 AS g,
         (strpos('0123456789abcdef',
                 substring(h, ((3 * i + 2) % 32) + 1, 1)) - 1) * 17 AS b
  FROM px)
SELECT doc_id, width, height,
       CAST(count(*) AS BIGINT) AS n_pixels,
       CAST(sum(r) AS BIGINT) AS sum_r,
       CAST(sum(g) AS BIGINT) AS sum_g,
       CAST(sum(b) AS BIGINT) AS sum_b
FROM ch GROUP BY doc_id, width, height
"""


QUERIES = {
    "q60_media_metadata": q60_media_metadata,
    "q61_frame_sample": q61_frame_sample,
    "q62_byte_histogram": q62_byte_histogram,
    "q63_decode_media": q63_decode_media,
    "q64_resize_raster": q64_resize_raster,
    "q65_media_phash": q65_media_phash,
    "q178_wav_roundtrip": q178_wav_roundtrip,
    "q179_ppm_roundtrip": q179_ppm_roundtrip,
}

ORACLES = {
    "q60_media_metadata": Q60_SQL,
    "q61_frame_sample": Q61_SQL,
    "q62_byte_histogram": Q62_SQL,
    "q63_decode_media": Q63_SQL,
    "q64_resize_raster": Q64_SQL,
    "q65_media_phash": Q65_SQL,
    "q178_wav_roundtrip": Q178_SQL,
    "q179_ppm_roundtrip": Q179_SQL,
}
