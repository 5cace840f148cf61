"""Python UDTF surface (operators/udtfs.py): the lateral row generator
agrees with the expression-based chunking twin (q72)."""

from __future__ import annotations

from binance_data_ingestor_spark.operators.udtfs import TokenWindows, register_udtfs
from binance_data_ingestor_spark.queries.text_ops import (
    CHUNK_SIZE,
    CHUNK_STRIDE,
    q72_chunking,
)

SF_DIR = "/root/testdata/sf0.001"


def test_token_windows_matches_expression_chunking(spark):
    register_udtfs(spark)
    spark.read.parquet(f"{SF_DIR}/documents.parquet").createOrReplaceTempView(
        "docs_udtf"
    )
    via_udtf = spark.sql(
        f"""
        SELECT doc_id, w.chunk_idx, w.chunk_start, w.chunk_len,
               md5(w.chunk) AS chunk_fp
        FROM docs_udtf, LATERAL token_windows(text, {CHUNK_SIZE}, {CHUNK_STRIDE}) w
        """
    )
    via_expr = q72_chunking(spark, SF_DIR)
    a = sorted(map(tuple, via_udtf.collect()))
    b = sorted(map(tuple, via_expr.collect()))
    assert len(a) > 500
    assert a == b


def test_udtf_direct_invocation(spark):
    from pyspark.sql.functions import lit

    rows = TokenWindows(lit("a b c d e"), lit(3), lit(2)).collect()
    got = [(r.chunk_idx, r.chunk_start, r.chunk_len, r.chunk) for r in rows]
    assert got == [(0, 1, 3, "a b c"), (1, 3, 3, "c d e")]


def test_udtf_null_text_yields_no_rows(spark):
    register_udtfs(spark)
    out = spark.sql(
        "SELECT w.* FROM VALUES (CAST(NULL AS STRING)) AS t(x), "
        "LATERAL token_windows(x, 3, 2) w"
    )
    assert out.count() == 0
