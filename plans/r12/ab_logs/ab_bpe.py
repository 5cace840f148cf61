"""Isolated alternating A/B of bpe_train variants (VERDICT r12 item 1).

Variants (split-projection on/off x checkpoint cadence):
  A = split-proj + lazy chain, eager ckpt every 4 (current HEAD)
  B = split-proj + eager ckpt every round (cadence 1)
  C = inline split + lazy chain, eager ckpt every 4
  D = inline split + eager ckpt every round (round-10 form)
  E = split-proj + eager ckpt every 2

All in ONE SparkSession, alternating, min of N repeats.
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F

from binance_data_ingestor_spark.session import get_spark
from binance_data_ingestor_spark.queries.util import load
from binance_data_ingestor_spark.operators.text import BPE_SEP

N_MERGES = 20

PAIR_EXPR_PROJ = (
    "CASE WHEN size(a) >= 4 THEN "
    "transform(sequence(2, size(a) - 2), "
    "i -> struct(element_at(a, i) AS x, element_at(a, i + 1) AS y)) "
    "ELSE array() END"
)
PAIR_EXPR_INLINE = (
    "CASE WHEN size(split(s, '{sep}')) >= 4 THEN "
    "transform(sequence(2, size(split(s, '{sep}')) - 2), "
    "i -> struct(element_at(split(s, '{sep}'), i) AS x, "
    "element_at(split(s, '{sep}'), i + 1) AS y)) "
    "ELSE array() END"
).format(sep=BPE_SEP)


def bpe_train_variant(df, *, split_proj: bool, ckpt_every: int):
    spark = df.sparkSession
    t = F.col("text")
    words = df.select(F.explode(F.split(t, " ")).alias("w")).filter(
        (F.length("w") > 0) & (~F.col("w").contains(BPE_SEP))
    )
    vocab = words.groupBy("w").agg(F.count("*").alias("freq"))
    cur = (
        vocab.repartition(8)
        .select(
            F.concat(
                F.lit(BPE_SEP), F.regexp_replace("w", "(.)", "$1" + BPE_SEP)
            ).alias("s"),
            "freq",
        )
        .localCheckpoint(eager=True)
    )
    merges = []
    for rk in range(1, N_MERGES + 1):
        if split_proj:
            head = cur.select("freq", F.split("s", BPE_SEP).alias("a")).select(
                "freq", F.explode(F.expr(PAIR_EXPR_PROJ)).alias("p")
            )
        else:
            head = cur.select("freq", F.explode(F.expr(PAIR_EXPR_INLINE)).alias("p"))
        best = (
            head.groupBy(F.col("p.x").alias("x"), F.col("p.y").alias("y"))
            .agg(F.sum("freq").cast("long").alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("x"), F.asc("y"))
            .limit(1)
            .collect()
        )
        if not best:
            break
        x, y, cnt = best[0]["x"], best[0]["y"], best[0]["cnt"]
        merges.append((rk, x, y, x + y, cnt))
        cur = cur.select(
            F.replace(
                F.col("s"),
                F.lit(BPE_SEP + x + BPE_SEP + y + BPE_SEP),
                F.lit(BPE_SEP + x + y + BPE_SEP),
            ).alias("s"),
            "freq",
        )
        if rk % ckpt_every == 0 and rk < N_MERGES:
            cur = cur.localCheckpoint(eager=True)
    return spark.createDataFrame(
        merges, "rk int, left_sym string, right_sym string, merged string, cnt long"
    )


VARIANTS = {
    "A_proj_ck4": dict(split_proj=True, ckpt_every=4),
    "B_proj_ck1": dict(split_proj=True, ckpt_every=1),
    "C_inline_ck4": dict(split_proj=False, ckpt_every=4),
    "D_inline_ck1": dict(split_proj=False, ckpt_every=1),
    "E_proj_ck2": dict(split_proj=True, ckpt_every=2),
}


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    repeats = int(os.environ.get("AB_REPEAT", "3"))
    spark = get_spark("ab_bpe", extra_conf={"spark.ui.showConsoleProgress": "false"})
    docs = load(spark, sf_dir, "documents")

    # warmup + identity check: every variant must produce the same table
    ref = None
    for name, kw in VARIANTS.items():
        rows = sorted(map(tuple, bpe_train_variant(docs, **kw).collect()))
        if ref is None:
            ref = rows
        assert rows == ref, f"variant {name} diverged!"
    print("identity check: all variants produce identical merge tables", flush=True)

    import gc

    times = {n: [] for n in VARIANTS}
    for r in range(repeats):
        for name, kw in VARIANTS.items():
            gc.collect()
            t0 = time.perf_counter()
            bpe_train_variant(docs, **kw).write.format("noop").mode(
                "overwrite"
            ).save()
            dt = time.perf_counter() - t0
            times[name].append(dt)
            print(f"rep{r} {name}: {dt:.3f}s", flush=True)
    print("---- mins ----")
    for name, ts in times.items():
        print(f"{name}: min={min(ts):.3f} all={[round(t,2) for t in ts]}")


if __name__ == "__main__":
    main()
