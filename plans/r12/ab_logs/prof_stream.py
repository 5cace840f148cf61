"""Phase-level decomposition of streaming-certificate cost (q26 as the
representative): input replay write / stream execution / batch twin /
exceptAll gates. Also A/Bs checkpoint+input location (ext4 /tmp vs tmpfs
/dev/shm) and the fused one-job gate vs the two-exceptAll gate.
"""
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F

from binance_data_ingestor_spark.session import get_spark
from binance_data_ingestor_spark.queries.util import load
from binance_data_ingestor_spark.queries.streaming_like import q24_sessionize

SF = "/root/testdata/sf0.1"


def run_stream(spark, data_dir: str, work_root: str) -> str:
    from binance_data_ingestor_spark.streaming.stateful import sessionize_stream

    work = tempfile.mkdtemp(prefix="q26prof_", dir=work_root)
    stream = (
        spark.readStream.schema("user_id long, ts timestamp, value double")
        .option("maxFilesPerTrigger", "1000")
        .parquet(f"{data_dir}/in")
    )
    name = f"out_{os.path.basename(work)}"
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        q = (
            sessionize_stream(stream, watermark="30 minutes")
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", f"{work}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(600)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    shutil.rmtree(work, ignore_errors=True)
    return name


def main():
    spark = get_spark("prof_stream", extra_conf={"spark.ui.showConsoleProgress": "false"})
    ev = load(spark, SF, "events").select("user_id", "ts", "value")
    sentinel = spark.sql(
        "SELECT CAST(-1 AS BIGINT) user_id,"
        " to_timestamp('2031-01-01 00:00:00') ts, CAST(0.0 AS DOUBLE) value"
    )

    # bench-style warmup (state store + stateful python worker)
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

    # phase 1: input write, once per location
    data = {}
    for loc, root in [("ext4", "/tmp"), ("shm", "/dev/shm")]:
        t0 = time.perf_counter()
        d = tempfile.mkdtemp(prefix=f"q26in_{loc}_", dir=root)
        ev.unionByName(sentinel).coalesce(4).write.mode("overwrite").parquet(f"{d}/in")
        print(f"input write [{loc}]: {time.perf_counter()-t0:.3f}s", flush=True)
        data[loc] = d

    # phase 2: stream execution, alternating locations, 3 reps
    views = []
    for rep in range(3):
        for loc in ("ext4", "shm"):
            t0 = time.perf_counter()
            name = run_stream(spark, data[loc], "/tmp" if loc == "ext4" else "/dev/shm")
            print(f"rep{rep} stream [{loc}]: {time.perf_counter()-t0:.3f}s", flush=True)
            views.append(name)

    # phase 3: batch twin
    for rep in range(3):
        t0 = time.perf_counter()
        b = q24_sessionize(spark, SF).select(
            "user_id", "n_events", "sess_value", "sess_start", "sess_end"
        ).localCheckpoint(eager=False)
        b.write.format("noop").mode("overwrite").save()
        print(f"rep{rep} batch twin: {time.perf_counter()-t0:.3f}s", flush=True)

    # phase 4: gates — two exceptAll counts vs fused union+groupBy
    name = views[-1]
    streamed = (
        spark.table(name)
        .filter(F.col("user_id") >= 0)
        .select(
            "user_id",
            "n_events",
            "sess_value",
            F.timestamp_micros(F.col("sess_start")).alias("sess_start"),
            F.timestamp_micros(F.col("sess_end")).alias("sess_end"),
        )
    )
    batch = q24_sessionize(spark, SF).select(
        "user_id", "n_events", "sess_value", "sess_start", "sess_end"
    ).localCheckpoint(eager=True)

    def _cents(df):
        return df.select(
            "user_id",
            "n_events",
            F.round(F.col("sess_value") * 100).cast("long").alias("cv"),
            "sess_start",
            "sess_end",
        )

    for rep in range(3):
        t0 = time.perf_counter()
        n_diff = (
            _cents(streamed).exceptAll(_cents(batch)).count()
            + _cents(batch).exceptAll(_cents(streamed)).count()
        )
        print(f"rep{rep} gate two-exceptAll: {time.perf_counter()-t0:.3f}s diff={n_diff}", flush=True)
        t0 = time.perf_counter()
        n_bad = (
            _cents(streamed).withColumn("__sgn", F.lit(1))
            .unionByName(_cents(batch).withColumn("__sgn", F.lit(-1)))
            .groupBy("user_id", "n_events", "cv", "sess_start", "sess_end")
            .agg(F.sum("__sgn").alias("d"))
            .filter(F.col("d") != 0)
            .count()
        )
        print(f"rep{rep} gate fused union: {time.perf_counter()-t0:.3f}s bad={n_bad}", flush=True)

    for loc in data.values():
        shutil.rmtree(loc, ignore_errors=True)


if __name__ == "__main__":
    main()
