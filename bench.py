"""Benchmark harness: runs the headline query set at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
compact JSON line with per-query wall seconds.

Driver contract notes (learned in round 1 — BENCH_r01 had "parsed": null):
  * The driver keeps only a few KB of output tail; a 141-query JSON line
    gets truncated mid-line and fails to parse.  The headline set is the
    registry PRIORITY block (~50 queries, every operator family), times
    rounded to 2 dp, so the line stays well under 2 KB.
  * Everything else (per-repeat samples, the full-registry sweep with
    --all) goes to BENCH_DETAIL.json, never stdout.
  * Per-query variance on this box is ±2×; every query is timed
    --repeat times (default 2) and the MIN is reported, so
    round-over-round comparisons are signal, not GC noise.

Execution uses the noop sink (format("noop")) so the FULL plan runs —
count() would let Catalyst prune the very projections we're measuring.

Usage: python bench.py [--all] [--repeat N] [name_filter ...]
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from binance_data_ingestor_spark.queries import PRIORITY, registry  # noqa: E402
from binance_data_ingestor_spark.session import get_spark  # noqa: E402

# full-registry sweeps write here; scaling runs (e.g. the sf1 study)
# point SPARK_GRAFT_DETAIL_PATH elsewhere so the canonical sf0.1 detail
# file never gets clobbered by a different-SF sweep
DETAIL_PATH = os.environ.get(
    "SPARK_GRAFT_DETAIL_PATH",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"),
)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf"))
    except ValueError:
        sf = None

    argv = sys.argv[1:]
    run_all = "--all" in argv or os.environ.get("SPARK_GRAFT_BENCH_ALL") == "1"
    repeat = 2
    if "--repeat" in argv:
        i = argv.index("--repeat")
        repeat = int(argv[i + 1])
        del argv[i : i + 2]
    argv = [a for a in argv if a != "--all"]
    only = argv

    # No console progress bar: the driver keeps only the last ~2 KB of
    # output, and \r-progress junk competes with the final JSON line.
    # Also silence the known-benign pandas concat FutureWarning that
    # pyspark's stateful-streaming serializer triggers once per
    # micro-batch worker (q26/q187 replays) — Python workers inherit
    # this env var, and dozens of copies would otherwise fill the
    # driver's retained output tail.
    os.environ.setdefault(
        "PYTHONWARNINGS",
        "ignore:The behavior of DataFrame concatenation:FutureWarning",
    )
    spark = get_spark("bench", extra_conf={"spark.ui.showConsoleProgress": "false"})
    qs, _ = registry()
    headline = set(PRIORITY)

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
    # Structured-Streaming warmup: state-store provider init + the
    # stateful Python worker path cost several seconds ONCE per session
    # and would otherwise land inside whichever streaming-certification
    # query runs first (measured: q187 5-14 s first vs ~3 s warm).
    # A two-row replay through the watermarked dedup touches both.
    import shutil
    import tempfile

    wm = tempfile.mkdtemp(prefix="bench_warm_")
    try:
        spark.sql(
            "SELECT * FROM VALUES (1, timestamp'2030-01-01'),"
            " (1, timestamp'2030-01-01') AS t(k, ts)"
        ).write.parquet(f"{wm}/in")
        (
            spark.readStream.schema("k int, ts timestamp")
            .parquet(f"{wm}/in")
            .withWatermark("ts", "1 minute")
            .dropDuplicatesWithinWatermark(["k"])
            .writeStream.format("noop")
            .option("checkpointLocation", f"{wm}/ckpt")
            .trigger(availableNow=True)
            .start()
            .awaitTermination(120)
        )
    finally:
        shutil.rmtree(wm, ignore_errors=True)

    samples: dict[str, list[float]] = {}
    for _ in range(max(1, repeat)):
        for name, fn in qs.items():
            if only and not any(f in name for f in only):
                continue
            if not only and not run_all and name not in headline:
                continue
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples.setdefault(name, []).append(round(time.perf_counter() - t0, 3))
            # release this query's localCheckpoint RDD references NOW:
            # without driver-side GC pressure they pile up across a
            # 218-query sweep and the executor storage bloat inflates
            # later queries 5-20x (measured: q178 1.4 s isolated vs
            # 12-27 s late in a no-gc sweep). Outside the timed span —
            # this is sweep hygiene, not query cost.
            gc.collect()

    best = {name: min(ts) for name, ts in samples.items()}
    # the driver-facing line reports the headline set only, 2 dp — keeps
    # the JSON line short enough to survive the driver's output tail
    line_queries = {
        n: round(t, 2) for n, t in best.items() if run_all is False or n in headline
    }
    total = round(sum(best[n] for n in line_queries), 3)

    if not only and run_all:  # only full-registry sweeps own the detail file
        # box/date stamp (round-6 verdict item): the r04→r05 comparison
        # showed ~+4% uniform box drift, so cross-round deltas are only
        # meaningful against a SAME-BOX baseline — the stamp makes
        # "which box produced this file" checkable instead of guessed.
        import datetime
        import platform

        with open(DETAIL_PATH, "w") as f:
            json.dump(
                {
                    "sf": sf,
                    "repeat": repeat,
                    "box": {
                        "node": platform.node(),
                        "release": platform.release(),
                        "cpus": os.cpu_count(),
                        "date_utc": datetime.datetime.now(
                            datetime.timezone.utc
                        ).isoformat(timespec="seconds"),
                    },
                    "samples": samples,
                    "min": best,
                },
                f,
                indent=1,
            )
    print(
        json.dumps(
            {
                "metric": "headline_query_wall_seconds_min_of_%d" % repeat,
                "value": total,
                "unit": "sec",
                "queries": line_queries,
                "sf": sf,
            },
            separators=(",", ":"),
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
