"""Malformed-input contracts of the file sources.

The reference decodes with bare `json.loads` and dies on the first bad
frame (`/root/reference/binance-di.py:107` — reconnect loop is the
error handler); the engine must instead give the three standard
choices: quarantine (PERMISSIVE + _corrupt_record), drop
(DROPMALFORMED), or fail loudly (FAILFAST)."""

from __future__ import annotations

import pytest

GOOD = '{"s": "BTCUSDT", "p": "100.5"}'
BAD = '{"s": "ETHUSDT", "p": '  # truncated frame

SCHEMA = "s string, p string, _corrupt_record string"


@pytest.fixture()
def jsonl(tmp_path):
    f = tmp_path / "frames.jsonl"
    f.write_text(f"{GOOD}\n{BAD}\n")
    return str(f)


def test_permissive_quarantines_bad_rows(spark, jsonl):
    rows = (
        spark.read.schema(SCHEMA)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(jsonl)
        .collect()
    )
    good = [r for r in rows if r._corrupt_record is None]
    bad = [r for r in rows if r._corrupt_record is not None]
    assert [(r.s, r.p) for r in good] == [("BTCUSDT", "100.5")]
    assert len(bad) == 1 and bad[0]._corrupt_record == BAD


def test_dropmalformed_keeps_only_good(spark, jsonl):
    rows = (
        spark.read.schema("s string, p string")
        .option("mode", "DROPMALFORMED")
        .json(jsonl)
        .collect()
    )
    assert [(r.s, r.p) for r in rows] == [("BTCUSDT", "100.5")]


def test_failfast_raises(spark, jsonl):
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import SparkUpgradeException

    with pytest.raises(Exception) as exc:
        spark.read.schema("s string, p string").option("mode", "FAILFAST").json(
            jsonl
        ).collect()
    assert "Malformed" in str(exc.value) or "FAILFAST" in str(exc.value)


def test_csv_malformed_row_quarantined(spark, tmp_path):
    f = tmp_path / "rows.csv"
    f.write_text("s,p\nBTCUSDT,100.5\n\"unterminated, 42\n")
    rows = (
        spark.read.schema(SCHEMA)
        .option("header", True)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(str(f))
        .collect()
    )
    good = [r for r in rows if r._corrupt_record is None]
    assert [(r.s, r.p) for r in good] == [("BTCUSDT", "100.5")]
    assert len(rows) - len(good) == 1
