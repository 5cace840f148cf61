"""CLI-parity configuration (SURVEY §2.8).

Mirrors the reference's argparse surface (binance-di.py:217-243) and its
validation rules: ``--print``/``--print-only`` mutual exclusion,
print-only disabling Redis+files, and the fail-fast "no Redis and no
file output" startup check (binance-di.py:262-264).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

DEFAULT_STREAMS = ("ticker", "trades", "order-book")
VALID_STREAMS = ("ticker", "trades", "order-book", "klines")
VALID_OUTPUTS = ("json", "csv", "parquet", "orc")


class ConfigError(ValueError):
    pass


@dataclass
class Config:
    symbols: list[str]
    streams: list[str] = field(default_factory=lambda: list(DEFAULT_STREAMS))
    interval: str = "1m"
    testnet: bool = False
    outputs: list[str] = field(default_factory=list)
    output_dir: str = "data"
    samples: int | None = None
    log: str | None = "binance-di.log"
    silent: bool = False
    print_console: bool = False
    print_only: bool = False
    redis_enabled: bool = True
    redis_host: str = field(
        default_factory=lambda: os.environ.get("REDIS_HOST", "localhost")
    )
    redis_port: int = field(
        default_factory=lambda: int(os.environ.get("REDIS_PORT", "31111"))
    )
    replay_dir: str | None = None  # engine extension: fixture replay source

    def __post_init__(self) -> None:
        self.symbols = [s.upper() for s in self.symbols]
        if not self.symbols:
            raise ConfigError("at least one --symbol is required")
        bad = [s for s in self.streams if s not in VALID_STREAMS]
        if bad:
            raise ConfigError(f"unknown stream type(s): {bad}; valid: {VALID_STREAMS}")
        bad = [o for o in self.outputs if o not in VALID_OUTPUTS]
        if bad:
            raise ConfigError(f"unknown output format(s): {bad}; valid: {VALID_OUTPUTS}")
        if self.print_console and self.print_only:
            raise ConfigError("--print and --print-only are mutually exclusive")
        if self.print_only:
            # reference: print-only nulls file outputs and disables Redis
            self.outputs = []
            self.redis_enabled = False
        if not self.print_only and not self.outputs and not self.redis_enabled:
            raise ConfigError(
                "no sink selected: enable Redis, file outputs, or --print-only"
            )

    @property
    def console_enabled(self) -> bool:
        return self.print_console or self.print_only
