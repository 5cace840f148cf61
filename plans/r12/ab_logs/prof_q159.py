"""Item 4: measure the q159/q233 candidate-stage posting-list skew
(guide §2.5). Reports: prefix posting-list length histogram, candidate
pairs per hottest shingles, and stage-level wall time of candidate vs
verify (via job-description-labelled noop runs of each sub-DAG).
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F

from binance_data_ingestor_spark.session import get_spark
from binance_data_ingestor_spark.queries.util import load
from binance_data_ingestor_spark.operators.dedup import (
    _exploded_shingles,
    prefix_filter_jaccard_pairs,
)

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main():
    spark = get_spark("prof_q159", extra_conf={"spark.ui.showConsoleProgress": "false"})
    docs = load(spark, SF, "documents")
    n, threshold = 3, 0.2

    ex = _exploded_shingles(docs, "text", "doc_id", n)
    dfreq = ex.groupBy("shingle").agg(F.count("*").alias("__df"))
    per_doc = (
        ex.join(dfreq, "shingle")
        .groupBy("doc_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("__df"), F.col("shingle")))
            ).alias("__ordered")
        )
        .select(
            "doc_id",
            F.transform("__ordered", lambda s: s.getField("shingle")).alias(
                "__toks"
            ),
        )
        .select(
            "doc_id",
            "__toks",
            F.size("__toks").alias("__sz"),
            F.slice(
                "__toks",
                1,
                F.greatest(
                    F.lit(1),
                    F.size("__toks")
                    - F.ceil(F.size("__toks") * threshold - 1e-9).cast("int")
                    + 1,
                ),
            ).alias("__prefix"),
        )
    )
    pref = per_doc.select(
        "doc_id", "__sz", F.posexplode("__prefix").alias("__p", "shingle")
    )
    # posting-list length histogram of the candidate join key
    hist = (
        pref.groupBy("shingle")
        .agg(F.count("*").alias("c"))
        .select(
            "c", (F.col("c") * (F.col("c") - 1) / 2).alias("pairs")
        )
    )
    stats = hist.agg(
        F.count("*").alias("n_shingles"),
        F.sum("c").alias("postings"),
        F.max("c").alias("max_c"),
        F.expr("percentile_approx(c, 0.5)").alias("med_c"),
        F.expr("percentile_approx(c, 0.99)").alias("p99_c"),
        F.sum("pairs").alias("total_pairs"),
    ).collect()[0]
    print("posting stats:", stats.asDict(), flush=True)
    top = (
        pref.groupBy("shingle")
        .agg(F.count("*").alias("c"))
        .orderBy(F.desc("c"))
        .limit(10)
        .collect()
    )
    print("top shingles:", [(r["shingle"], r["c"]) for r in top], flush=True)
    # share of candidate pairs owned by the top-K hottest shingles
    hot = (
        hist.orderBy(F.desc("pairs")).limit(20).agg(F.sum("pairs")).collect()[0][0]
    )
    print(f"pairs in top-20 shingles: {hot} of {stats['total_pairs']}", flush=True)

    # timed halves, alternating
    pd_ck = per_doc.localCheckpoint(eager=True)
    pref_ck = pd_ck.select(
        "doc_id", "__sz", F.posexplode("__prefix").alias("__p", "shingle")
    )
    a = pref_ck.select(
        F.col("doc_id").alias("id_a"),
        F.col("__sz").alias("__sza"),
        (F.col("__p") + 1).alias("__pa"),
        "shingle",
    )
    b = pref_ck.select(
        F.col("doc_id").alias("id_b"),
        F.col("__sz").alias("__szb"),
        (F.col("__p") + 1).alias("__pb"),
        "shingle",
    )
    min_overlap = F.ceil(
        F.lit(threshold / (1.0 + threshold)) * (F.col("__sza") + F.col("__szb"))
        - 1e-9
    )
    pos_bound = F.lit(1) + F.least(
        F.col("__sza") - F.col("__pa"), F.col("__szb") - F.col("__pb")
    )
    cand = (
        a.join(b, "shingle")
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (F.col("__szb") * threshold <= F.col("__sza") + 1e-9)
            & (F.col("__sza") * threshold <= F.col("__szb") + 1e-9)
            & (pos_bound >= min_overlap)
        )
        .select("id_a", "id_b")
        .distinct()
    )
    import gc

    for rep in range(3):
        gc.collect()
        t0 = time.perf_counter()
        cand.write.format("noop").mode("overwrite").save()
        print(f"rep{rep} candidate stage (from ckpt per_doc): {time.perf_counter()-t0:.3f}s", flush=True)
        t0 = time.perf_counter()
        prefix_filter_jaccard_pairs(docs, "text", "doc_id", n, threshold).write.format(
            "noop"
        ).mode("overwrite").save()
        print(f"rep{rep} full q159 operator: {time.perf_counter()-t0:.3f}s", flush=True)


if __name__ == "__main__":
    main()
