"""Python UDTFs (Spark 4 user-defined table functions) — the row-
generating extension point of §2.7. The reference's extension surface
is its four `process_func` callbacks (`/root/reference/binance-di.py:
96-120`, registry `:280-286`), which are row→row; a UDTF is the
row→rows generalization, registered once and usable from SQL via
LATERAL.

These exist to prove the API surface with a tested example; the hot
path stays on codegen'd expressions (the expression-based twin of
`token_windows` is queries/text_ops q72), and tests assert the two
agree — UDTFs are for logic that genuinely can't be an expression.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="chunk_idx int, chunk_start int, chunk_len int, chunk string")
class TokenWindows:
    """Sliding token windows over whitespace-tokenized text:
    (size, stride) chunking, 1-based chunk_start to match q72."""

    def eval(self, text: str, size: int, stride: int):
        if text is None:
            return
        toks = text.split(" ")
        n = len(toks)
        idx = 0
        start = 0
        while True:
            chunk = toks[start : start + size]
            yield idx, start + 1, len(chunk), " ".join(chunk)
            if start + size >= n:
                break
            idx += 1
            start += stride


def register_udtfs(spark) -> None:
    spark.udtf.register("token_windows", TokenWindows)
