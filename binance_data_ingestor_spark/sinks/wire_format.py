"""Byte-exact reference wire serialization for the row sinks (JSONL/CSV).

The engine's default row-sink flattening (``files.flatten_for_row_sink``)
is schema-stable Spark ``to_json`` — compact separators and struct-shaped
book levels. That is the right internal form, but a consumer migrating
from the reference and re-parsing its output files byte-wise needs the
EXACT bytes the reference wrote:

- JSONL: ``json.dumps(payload)`` with Python's default ``(', ', ': ')``
  separators — ints unquoted, strings quoted, ``null`` for missing
  fields, and bids/asks embedded as a ``json.dumps(list-of-[price, qty]
  string pairs)`` STRING (so its quotes arrive backslash-escaped inside
  the payload line). Reference: binance-di.py:44-46 (book stringify),
  :179-180 (per-line ``json.dumps(payload) + '\\n'``).
- CSV: ``csv.writer`` excel dialect — ``str()`` rendering, empty cell
  for None, QUOTE_MINIMAL with doubled inner quotes, CRLF terminator.
  Reference: binance-di.py:175-178,181-184.

Book levels are serialized from the RAW wire strings (``__raw.b``/``a``),
never from the typed DecimalType form — a decimal round-trip would
re-format "0.5" as "0.500000000000000000" and break byte parity.

Everything here is column expressions (whole-stage codegen, no UDFs);
at scale this layer costs the same as any other string projection.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# wire charset has no control characters; backslash-then-quote covers
# every escape json.dumps would emit for these payloads
def _json_escape(col: Column) -> Column:
    return F.regexp_replace(
        F.regexp_replace(col, r"\\", r"\\\\"), '"', r'\\"'
    )


def py_json_string(col: Column) -> Column:
    """'"' + escaped + '"' — json.dumps of a str value."""
    return F.concat(F.lit('"'), _json_escape(col), F.lit('"'))


def wire_list_json(col: Column, depth: int = 2) -> Column:
    """json.dumps of a (nested) list of wire strings with Python's
    default ', ' separator: [["p", "q"], …] → '[["p", "q"], …]'.
    ``depth=2`` is the book-side shape; ``depth=1`` a flat list."""
    if depth == 1:
        inner = F.transform(col, py_json_string)
    else:
        inner = F.transform(col, lambda x: wire_list_json(x, depth - 1))
    return F.concat(F.lit("["), F.concat_ws(", ", inner), F.lit("]"))


def book_wire_fields(parsed: DataFrame, raw: str = "__raw") -> list[Column]:
    """The reference order-book payload (binance-di.py:43-47) with
    bids/asks as byte-exact json.dumps strings of the raw levels.
    Missing sides render as '[]' (``data.get('b', [])``)."""
    m = F.col(raw)
    return [
        m.getField("u").alias("lastUpdateId"),
        wire_list_json(F.coalesce(m.getField("b"), F.array())).alias("bids"),
        wire_list_json(F.coalesce(m.getField("a"), F.array())).alias("asks"),
    ]


def _render_json_value(col: Column, dt: T.DataType) -> Column:
    if isinstance(dt, T.StringType):
        rendered = py_json_string(col)
    elif isinstance(dt, (T.LongType, T.IntegerType, T.ShortType, T.ByteType)):
        rendered = col.cast("string")
    elif isinstance(dt, T.BooleanType):
        rendered = F.when(col, "true").otherwise("false")
    else:
        raise TypeError(
            f"reference JSONL payloads are flat string/int fields; got {dt}"
        )
    return F.when(col.isNull(), F.lit("null")).otherwise(rendered)


def reference_jsonl_line(df: DataFrame) -> Column:
    """One column holding json.dumps(payload) byte-for-byte: default
    (', ', ': ') separators, fields in DataFrame column order (== the
    reference's dict insertion order — the normalizers preserve it)."""
    parts: list[Column] = []
    for i, f in enumerate(df.schema.fields):
        parts.append(F.lit(('{' if i == 0 else ', ') + f'"{f.name}": '))
        parts.append(_render_json_value(F.col(f.name), f.dataType))
    parts.append(F.lit("}"))
    return F.concat(*parts)


def _csv_str(col: Column, dt: T.DataType) -> Column:
    """csv.writer's str() rendering; None → empty cell."""
    if isinstance(dt, T.BooleanType):
        base = F.when(col, "True").otherwise("False")
    else:
        base = col.cast("string")
    return F.coalesce(base, F.lit(""))


def _csv_quote_minimal(col: Column) -> Column:
    needs = (
        col.contains(",")
        | col.contains('"')
        | col.contains("\n")
        | col.contains("\r")
    )
    return F.when(
        needs,
        F.concat(F.lit('"'), F.regexp_replace(col, '"', '""'), F.lit('"')),
    ).otherwise(col)


def reference_csv_row(df: DataFrame) -> Column:
    """One CSV record, excel dialect, WITHOUT the line terminator."""
    cells = [
        _csv_quote_minimal(_csv_str(F.col(f.name), f.dataType))
        for f in df.schema.fields
    ]
    return F.concat_ws(",", *cells)


def reference_csv_header(columns: list[str]) -> str:
    return ",".join(columns)


def write_reference_jsonl(
    df: DataFrame,
    path: str,
    *,
    partition_cols: tuple[str, ...] = (),
    mode: str = "append",
) -> None:
    """Write payload rows as byte-exact reference JSONL via the text
    sink (one json.dumps line per record — a file is the concatenation
    of its lines, so file bytes match the reference's file bytes)."""
    payload_cols = [c for c in df.columns if c not in partition_cols]
    out = df.select(
        *partition_cols,
        reference_jsonl_line(df.select(*payload_cols)).alias("value"),
    )
    writer = out.write.format("text").mode(mode)
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.save(path)
