"""Config validation + CLI parsing parity (SURVEY §2.8)."""

from __future__ import annotations

import pytest

from binance_data_ingestor_spark.cli import config_from_args, parse_arguments
from binance_data_ingestor_spark.config import Config, ConfigError


def test_symbols_upper_cased():
    cfg = Config(symbols=["btcusdt"], outputs=["json"])
    assert cfg.symbols == ["BTCUSDT"]


def test_print_mutual_exclusion():
    with pytest.raises(ConfigError):
        Config(symbols=["X"], print_console=True, print_only=True)


def test_print_only_disables_other_sinks():
    cfg = Config(symbols=["X"], outputs=["json"], print_only=True)
    assert cfg.outputs == [] and not cfg.redis_enabled and cfg.console_enabled


def test_fail_fast_no_sinks():
    with pytest.raises(ConfigError, match="no sink"):
        Config(symbols=["X"], outputs=[], redis_enabled=False)


def test_unknown_stream_rejected():
    with pytest.raises(ConfigError, match="unknown stream"):
        Config(symbols=["X"], streams=["nope"], outputs=["json"])


def test_cli_args_roundtrip():
    args = parse_arguments(
        ["--symbol", "btcusdt,ethusdt", "--load", "ticker,klines",
         "--interval", "5m", "--output", "parquet,csv", "--samples", "3",
         "--silent", "--no-redis", "--output-dir", "/tmp/x"]
    )
    cfg = config_from_args(args)
    assert cfg.symbols == ["BTCUSDT", "ETHUSDT"]
    assert cfg.streams == ["ticker", "klines"]
    assert cfg.interval == "5m" and cfg.samples == 3
    assert cfg.outputs == ["parquet", "csv"] and not cfg.redis_enabled


def test_cli_print_mutex_is_argparse_level():
    with pytest.raises(SystemExit):
        parse_arguments(["--symbol", "X", "--print", "--print-only"])
