"""Benchmark harness: runs every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints one
JSON line with per-query wall seconds.

Execution uses the noop sink (format("noop")) so the FULL plan runs —
count() would let Catalyst prune the very projections we're measuring.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from binance_data_ingestor_spark.queries import registry  # noqa: E402
from binance_data_ingestor_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf"))
    except ValueError:
        sf = None

    spark = get_spark("bench")
    qs, _ = registry()

    # JVM/codegen warmup on the smallest query so q01 isn't charged for it
    qs["q01_pricing_summary"](spark, sf_dir).write.format("noop").mode("overwrite").save()
    # Python-worker-pool warmup (fork + pandas/pyarrow import in every
    # worker) so the first mapInPandas query isn't charged for it either
    n = spark.sparkContext.defaultParallelism
    (
        spark.range(n)
        .repartition(n)
        .mapInPandas(lambda it: it, "id long")
        .write.format("noop")
        .mode("overwrite")
        .save()
    )

    times: dict[str, float] = {}
    only = sys.argv[1:]
    for name, fn in qs.items():
        if only and not any(f in name for f in only):
            continue
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        times[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(times.values()), 3)
    print(
        json.dumps(
            {
                "metric": "total_query_wall_seconds",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
