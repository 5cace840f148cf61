"""Spot-bench named registry queries at an arbitrary data dir — the
runner behind SCALING.md's sf1/sf10 octave rows (round-8 addendum C
protocol: fresh session, noop-format write to force full execution,
min over --repeat runs; the first run's time is also reported so a
cold/warm split is visible).

Usage: python scripts/bench_at.py --dir /root/repo/.benchdata/sf10 \
           --repeat 2 q238_spearman q22_rolling_24h q189_bpe_encode
Prints one JSON line per query: {"query", "dir", "runs", "min"}.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", required=True)
    ap.add_argument("--repeat", type=int, default=2)
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    sys.path.insert(0, "/root/repo")
    from binance_data_ingestor_spark.queries import registry
    from binance_data_ingestor_spark.session import get_spark

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    qs, _ = registry()
    for name in args.queries:
        runs = []
        for _ in range(args.repeat):
            t0 = time.time()
            qs[name](spark, args.dir).write.format("noop").mode(
                "overwrite"
            ).save()
            runs.append(round(time.time() - t0, 2))
        print(
            json.dumps(
                {"query": name, "dir": args.dir, "runs": runs, "min": min(runs)}
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
