"""q58 sequence packing: the layout invariants the training loader
relies on — within a bucket, document spans tile the token line with no
gaps and no overlaps, and chunk indices follow from the running total."""

from collections import defaultdict

from binance_data_ingestor_spark.queries.text_ops import (
    CHUNK_TOKENS,
    q58_pack_chunks,
)

SF_DIR = "/root/testdata/sf0.001"


def test_spans_tile_each_bucket(spark):
    rows = q58_pack_chunks(spark, SF_DIR).collect()
    by_bucket = defaultdict(list)
    for r in rows:
        by_bucket[r["bucket"]].append(r)
    assert len(by_bucket) > 1
    for bucket, docs in by_bucket.items():
        docs.sort(key=lambda r: r["doc_id"])
        cum = 0
        for d in docs:
            assert d["first_chunk"] == cum // CHUNK_TOKENS
            assert d["last_chunk"] == (cum + d["n_tokens"] - 1) // CHUNK_TOKENS
            assert d["first_chunk"] <= d["last_chunk"]
            cum += d["n_tokens"]


def test_every_doc_present_once(spark):
    rows = q58_pack_chunks(spark, SF_DIR).collect()
    ids = [r["doc_id"] for r in rows]
    assert len(ids) == len(set(ids))
    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    assert len(ids) == n_docs
