"""Measure the q229 (naive inverted-index containment) vs q233
(prefix-filtered containment) crossover on an OPEN-vocabulary Zipfian
corpus — the scale regime the closed-vocab driver fixtures cannot
exhibit (round-7 VERDICT item 3; results land in SCALING.md).

Method mirrors bench.py: each (corpus, query) measurement runs in a
FRESH SparkSession (the two queries share the session shingle
artifact, which would otherwise attribute the tokenize cost to
whichever ran first), executes via a noop-format write to force full
execution, and reports the min of --repeat runs.

Usage: python scripts/bench_openvocab.py [--repeat 2]
       [--dirs .benchdata/openvocab_sf0.1 .benchdata/openvocab_sf1]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_one(sf_dir: str, qname: str, repeat: int) -> tuple[float, int]:
    from pyspark.sql import SparkSession

    from binance_data_ingestor_spark.queries import registry

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.driver.memory", "16g")
        .config("spark.sql.adaptive.enabled", "true")
        .appName(f"openvocab-{qname}")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    queries, _ = registry()
    best, rows = float("inf"), -1
    for _ in range(repeat):
        t0 = time.monotonic()
        df = queries[qname](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        best = min(best, time.monotonic() - t0)
        if rows < 0:
            rows = df.count()
    spark.stop()
    # the session artifact cache is keyed by applicationId; clearing is
    # belt-and-braces for in-process reuse across run_one calls
    from binance_data_ingestor_spark.queries import util

    util._ARTIFACT_CACHE.clear()
    return best, rows


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeat", type=int, default=2)
    ap.add_argument(
        "--dirs",
        nargs="+",
        default=[
            "/root/repo/.benchdata/openvocab_sf0.1",
            "/root/repo/.benchdata/openvocab_sf1",
        ],
    )
    ap.add_argument(
        "--queries",
        nargs="+",
        default=["q229_ngram_containment", "q233_containment_prefix"],
    )
    args = ap.parse_args()
    out: dict[str, dict] = {}
    for d in args.dirs:
        label = os.path.basename(d)
        out[label] = {}
        for q in args.queries:
            sec, rows = run_one(d, q, args.repeat)
            out[label][q] = {"sec": round(sec, 3), "rows": rows}
            print(f"{label} {q}: {sec:.2f}s ({rows} pairs)", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
