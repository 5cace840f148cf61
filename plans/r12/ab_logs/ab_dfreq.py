"""A/B: prefix-filter dedup dfreq groupBy+rejoin vs count(*) OVER
(PARTITION BY shingle) — the q144 round-11 trick applied to q159/q233's
per-doc build stage.
"""
import gc
import os
import sys
import time

sys.path.insert(0, "/root/repo")
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from binance_data_ingestor_spark.session import get_spark
from binance_data_ingestor_spark.queries.util import load
from binance_data_ingestor_spark.operators import dedup as dd

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def per_doc_old(ex, id_col="doc_id", threshold=0.2):
    dfreq = ex.groupBy("shingle").agg(F.count("*").alias("__df"))
    return (
        ex.join(dfreq, "shingle")
        .groupBy(id_col)
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("__df"), F.col("shingle")))
            ).alias("__ordered")
        )
    )


def per_doc_new(ex, id_col="doc_id", threshold=0.2):
    wdf = W.partitionBy("shingle")
    return (
        ex.withColumn("__df", F.count("*").over(wdf))
        .groupBy(id_col)
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("__df"), F.col("shingle")))
            ).alias("__ordered")
        )
    )


def main():
    spark = get_spark("ab_dfreq", extra_conf={"spark.ui.showConsoleProgress": "false"})
    docs = load(spark, SF, "documents")
    ex = dd._exploded_shingles(docs, "text", "doc_id", 3)
    a = {r["doc_id"]: r["__ordered"] for r in per_doc_old(ex).collect()}
    b = {r["doc_id"]: r["__ordered"] for r in per_doc_new(ex).collect()}
    assert a == b, "per_doc mismatch"
    print("identity: ok", flush=True)
    times = {"old": [], "new": []}
    for rep in range(int(os.environ.get("AB_REPEAT", "4"))):
        for nm, fn in [("old", per_doc_old), ("new", per_doc_new)]:
            gc.collect()
            t0 = time.perf_counter()
            fn(ex).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            times[nm].append(dt)
            print(f"rep{rep} per_doc[{nm}]: {dt:.3f}s", flush=True)
    for nm, ts in times.items():
        print(f"{nm}: min={min(ts):.3f} all={[round(t,2) for t in ts]}")


if __name__ == "__main__":
    main()
