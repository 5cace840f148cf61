"""Multimodal binary-column operators: schema, batch plumbing, stub decode."""

import numpy as np
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from binance_data_ingestor_spark.operators.multimodal import (
    byte_histogram,
    decode_media,
    media_metadata,
    sample_frames,
)


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (0, "image", b"\x89PNG\r\n\x1a\nabcdefgh", 16, 16),
        (1, "audio", b"RIFFxxxxWAVEfmt \x00\x01", 0, 0),
        (2, "video", b"\x00\x00\x00\x18ftypmp42abc", 32, 18),
        (3, "image", b"ab", 8, 8),  # shorter than n_frames bytes
    ]
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("media_type", T.StringType()),
            T.StructField("content", T.BinaryType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
        ]
    )
    return spark.createDataFrame(rows, schema)


def test_media_metadata(media):
    out = {r["doc_id"]: r for r in media_metadata(media).collect()}
    assert out[0]["n_bytes"] == 16
    assert out[0]["magic_hex"] == "89504E47"  # PNG magic
    assert out[1]["magic_hex"] == "52494646"  # RIFF
    assert out[3]["n_bytes"] == 2


def test_sample_frames_shape(media):
    frames = sample_frames(media, n_frames=4)
    assert [f.name for f in frames.schema.fields] == ["doc_id", "frame_idx", "frame"]
    assert isinstance(frames.schema["frame"].dataType, T.BinaryType)
    rows = frames.collect()
    # doc 3 (2 bytes < 4 frames) is dropped; others give 4 frames each
    assert sorted({r["doc_id"] for r in rows}) == [0, 1, 2]
    by_doc = [r for r in rows if r["doc_id"] == 0]
    assert sorted(r["frame_idx"] for r in by_doc) == [0, 1, 2, 3]
    # 16 bytes / 4 frames: each frame is the right 4-byte slice
    content = b"\x89PNG\r\n\x1a\nabcdefgh"
    for r in by_doc:
        i = r["frame_idx"]
        assert bytes(r["frame"]) == content[4 * i : 4 * i + 4]


def test_byte_histogram_matches_numpy(media):
    rows = byte_histogram(media).collect()
    got = {(r["doc_id"], r["bin"]): r["n"] for r in rows}
    for doc_id, _, payload, _, _ in [
        (0, None, b"\x89PNG\r\n\x1a\nabcdefgh", None, None),
        (3, None, b"ab", None, None),
    ]:
        hist = np.bincount(np.frombuffer(payload, np.uint8) >> 4, minlength=16)
        for b in np.nonzero(hist)[0]:
            assert got[(doc_id, int(b))] == hist[b]
    # only non-empty bins are emitted
    assert all(n > 0 for n in got.values())


def test_perceptual_hash16_matches_numpy(media):
    from binance_data_ingestor_spark.operators.multimodal import perceptual_hash16

    got = {r["doc_id"]: r["phash"] for r in perceptual_hash16(media).collect()}
    payloads = {
        0: b"\x89PNG\r\n\x1a\nabcdefgh",
        1: b"RIFFxxxxWAVEfmt \x00\x01",
        2: b"\x00\x00\x00\x18ftypmp42abc",
        3: b"ab",
    }
    for doc_id, payload in payloads.items():
        hist = np.bincount(np.frombuffer(payload, np.uint8) >> 4, minlength=16)
        expected = sum(1 << b for b in range(16) if hist[b] * 16 > len(payload))
        assert got[doc_id] == expected, doc_id
    # identical payloads hash identically (the blocking-key property)
    assert len(got) == 4


def test_decode_media_generic_byte_facts(media):
    out = {r["doc_id"]: r for r in decode_media(media).collect()}
    assert out[0]["n_samples"] == 16
    assert out[0]["byte_sum"] == sum(b"\x89PNG\r\n\x1a\nabcdefgh")
    assert out[0]["media_type"] == "image"
    assert out[0]["width"] == 16
    assert out[3]["n_samples"] == 2
    # doc 1 carries a RIFF/WAVE magic but a malformed body: the real
    # parser rejects it and the generic byte facts stand
    assert out[1]["n_samples"] == len(b"RIFFxxxxWAVEfmt \x00\x01")
    assert out[1]["byte_sum"] == sum(b"RIFFxxxxWAVEfmt \x00\x01")


def test_decode_media_routes_real_containers(spark):
    """Payloads with valid self-describing containers go through the
    single real parsers (parse_wav_pcm16 / parse_ppm_p6) — same facts
    as decode_wav/decode_ppm, not byte statistics."""
    from binance_data_ingestor_spark.operators.multimodal import (
        ppm_p6_bytes,
        wav_pcm16_bytes,
    )

    samples = np.array([100, -200, 300, -400], dtype=np.int16)
    wav = wav_pcm16_bytes(8000, samples)
    rgb = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(-1, 3)
    ppm = ppm_p6_bytes(3, 2, rgb)
    rows = [
        (10, "audio", wav, 0, 0),
        (11, "image", ppm, 99, 99),
        (12, "video", b"\x00\x00\x00\x18ftypmp42", 4, 4),
    ]
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("media_type", T.StringType()),
            T.StructField("content", T.BinaryType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
        ]
    )
    out = {
        r["doc_id"]: r
        for r in decode_media(spark.createDataFrame(rows, schema)).collect()
    }
    assert out[10]["n_samples"] == 4
    assert out[10]["byte_sum"] == int(np.abs(samples.astype(np.int64)).sum())
    # PPM: parsed dims override the metadata, facts are pixel-level
    assert (out[11]["width"], out[11]["height"]) == (3, 2)
    assert out[11]["n_samples"] == 6
    assert out[11]["byte_sum"] == int(rgb.astype(np.int64).sum())
    # unrecognized container: vectorized generic path
    assert out[12]["n_samples"] == 12
    assert out[12]["byte_sum"] == sum(b"\x00\x00\x00\x18ftypmp42")


def test_decode_media_real_codecs_not_implemented(media):
    with pytest.raises(NotImplementedError):
        decode_media(media, real_codecs=True)


def test_resize_raster_stride_sampling(spark):
    from binance_data_ingestor_spark.operators.multimodal import resize_raster

    # 8×6 raster of sequential bytes; resize to 4×3 with strides sy=2, sx=2
    w, h = 8, 6
    payload = bytes(range(w * h))
    df = spark.createDataFrame(
        [(1, payload, w, h), (2, b"xy", w, h)],  # doc 2 too short → filtered
        "doc_id long, content binary, raster_w int, raster_h int",
    )
    rows = resize_raster(df, out_w=4, out_h=3).collect()
    assert [r["doc_id"] for r in rows] == [1]
    got = bytes(rows[0]["resized"])
    expected = bytes(
        payload[(i * 2) * w + j * 2] for i in range(3) for j in range(4)
    )
    assert got == expected


def test_wav_roundtrip_and_malformed_inputs(spark):
    """The REAL WAV parser: builder→parser round-trip recovers every
    fact (including an extra chunk before data and odd-size padding),
    and malformed containers raise instead of mis-decoding."""
    import struct

    import numpy as np
    import pytest as _pytest

    from binance_data_ingestor_spark.operators.multimodal import (
        decode_wav,
        parse_wav_pcm16,
        wav_pcm16_bytes,
    )

    samples = np.array([0, 100, -200, 32767, -32768], dtype=np.int16)
    wav = wav_pcm16_bytes(44100, samples)
    assert parse_wav_pcm16(wav) == (44100, 1, 16, 5, 0 + 100 + 200 + 32767 + 32768)

    # chunk walk: a LIST chunk with an ODD size before fmt/data must be
    # skipped with word-alignment padding
    extra = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"
    padded = wav[:12] + extra + wav[12:]
    padded = padded[:4] + struct.pack("<I", len(padded) - 8) + padded[8:]
    assert parse_wav_pcm16(padded) == parse_wav_pcm16(wav)

    for bad in (b"", b"RIFFxxxxWAVE", b"OGGS" + wav[4:], wav[:20]):
        with _pytest.raises(ValueError):
            parse_wav_pcm16(bad)
    # stereo / non-PCM rejected, not silently mis-read
    stereo_fmt = struct.pack("<HHIIHH", 1, 2, 8000, 32000, 4, 16)
    stereo = (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(stereo_fmt) + 8) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(stereo_fmt)) + stereo_fmt
        + b"data" + struct.pack("<I", 0)
    )
    r = parse_wav_pcm16(stereo + b"")
    assert r[1] == 2 and r[3] == 0  # stereo IS supported when declared

    df = spark.createDataFrame([(7, bytearray(wav))], "doc_id long, content binary")
    row = decode_wav(df).collect()[0]
    assert (row.sample_rate, row.n_channels, row.n_samples, row.sum_abs) == (
        44100, 1, 5, 65835,
    )


def test_ppm_parser_comments_and_malformed(spark):
    """P6 header tokenizer: comment lines between fields parse; wrong
    magic, truncated header/raster, and 16-bit maxval raise."""
    import numpy as np
    import pytest as _pytest

    from binance_data_ingestor_spark.operators.multimodal import (
        decode_ppm,
        parse_ppm_p6,
        ppm_p6_bytes,
    )

    rgb = np.arange(2 * 2 * 3, dtype=np.uint8) * 10
    plain = ppm_p6_bytes(2, 2, rgb)
    commented = b"P6\n# a comment\n2 # trailing\n# another\n2\n255\n" + rgb.tobytes()
    want = (2, 2, 255, 4, int(rgb[0::3].sum()), int(rgb[1::3].sum()), int(rgb[2::3].sum()))
    assert parse_ppm_p6(plain) == want
    assert parse_ppm_p6(commented) == want

    for bad in (b"", b"P5\n2 2\n255\n" + rgb.tobytes(), plain[:-1], b"P6\n2 2\n"):
        with _pytest.raises(ValueError):
            parse_ppm_p6(bad)
    with _pytest.raises(ValueError):
        parse_ppm_p6(b"P6\n2 2\n65535\n" + bytes(24))

    df = spark.createDataFrame([(3, bytearray(plain))], "doc_id long, content binary")
    row = decode_ppm(df).collect()[0]
    assert (row.width, row.height, row.n_pixels, row.sum_r, row.sum_g, row.sum_b) == (
        2, 2, 4, want[4], want[5], want[6],
    )
