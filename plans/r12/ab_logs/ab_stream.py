"""Alternating A/B over the 15 streaming certificates: OLD harness
(ext4 scratch via SPARK_GRAFT_STREAM_TMP=/tmp + two-exceptAll gates,
monkeypatched back in) vs NEW (tmpfs scratch + fused one-job gate).
Replay input dirs are session-memoized and shared by both variants, so
the comparison isolates the checkpoint/work placement + gate cost.
"""
import gc
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from binance_data_ingestor_spark.session import get_spark
from binance_data_ingestor_spark.queries import registry
import binance_data_ingestor_spark.queries.analytics_ops as an
import binance_data_ingestor_spark.queries.binance_ops as bo
import binance_data_ingestor_spark.queries.cdc_ops as cd
import binance_data_ingestor_spark.queries.profiling_ops as pr
import binance_data_ingestor_spark.queries.streaming_like as sl
from binance_data_ingestor_spark.queries.util import multiset_diff_count as fused

SF = "/root/testdata/sf0.1"
MODS = [an, bo, cd, pr, sl]

NAMES = [
    "q26_stream_sessions",
    "q187_stream_heavy_hitters",
    "q191_stream_asof_enrich",
    "q192_stream_klines",
    "q193_stream_rolling_24h",
    "q194_stream_dedup",
    "q195_stream_transitions",
    "q196_kmv_set_sketch",
    "q199_stream_kmv",
    "q211_stream_digest",
    "q225_stream_countmin",
    "q251_stream_vpin",
    "q259_stream_lsh_compaction",
    "q279_stream_wilson",
    "q289_stream_gk_quantiles",
]


def old_gate(a, b):
    cols = a.columns
    return a.exceptAll(b.select(*cols)).count() + b.select(*cols).exceptAll(a).count()


def set_variant(old: bool):
    if old:
        os.environ["SPARK_GRAFT_STREAM_TMP"] = "/tmp"
        for m in MODS:
            m.multiset_diff_count = old_gate
    else:
        os.environ.pop("SPARK_GRAFT_STREAM_TMP", None)
        for m in MODS:
            m.multiset_diff_count = fused


def main():
    spark = get_spark("ab_stream", extra_conf={"spark.ui.showConsoleProgress": "false"})
    qs, _ = registry()
    # streaming warmup (same as bench.py)
    import shutil
    import tempfile

    wm = tempfile.mkdtemp(prefix="warm_")
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
    shutil.rmtree(wm, ignore_errors=True)
    n = spark.sparkContext.defaultParallelism
    spark.range(n).repartition(n).mapInPandas(lambda it: it, "id long").write.format(
        "noop"
    ).mode("overwrite").save()

    times = {}
    reps = int(os.environ.get("AB_REPEAT", "3"))
    for rep in range(reps):
        for name in NAMES:
            for variant in ("old", "new"):
                set_variant(variant == "old")
                gc.collect()
                t0 = time.perf_counter()
                qs[name](spark, SF).write.format("noop").mode("overwrite").save()
                dt = time.perf_counter() - t0
                times.setdefault((name, variant), []).append(dt)
                print(f"rep{rep} {name} [{variant}]: {dt:.3f}s", flush=True)
    set_variant(False)
    print("---- mins ----")
    tot = {"old": 0.0, "new": 0.0}
    for name in NAMES:
        o = min(times[(name, "old")])
        w = min(times[(name, "new")])
        tot["old"] += o
        tot["new"] += w
        print(f"{name}: old={o:.2f} new={w:.2f} delta={w-o:+.2f}")
    print(f"TOTAL: old={tot['old']:.1f} new={tot['new']:.1f}")


if __name__ == "__main__":
    main()
