"""SparkSession factory.

Scale design notes (local[32] is the test harness; the target is a
1000-executor cluster over ~100 TB):

- AQE on: runtime partition coalescing, skew-join splitting, and
  broadcast-join demotion/promotion replace hand-tuned partition counts.
- ``spark.sql.shuffle.partitions`` defaults to the local core count for
  tests; on a real cluster this is overridden (or left to AQE's
  ``coalescePartitions`` with a high initial value).
- UTC session timezone pinned so timestamp semantics match the DuckDB
  oracle and are cluster-invariant.
- Arrow enabled for the few Pandas-UDF operators (MinHash batch hashing,
  multimodal decode) — everything else stays JVM-side in codegen.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "binance-data-ingestor-spark",
    *,
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine SparkSession.

    In local mode one JVM hosts all executor threads, so
    ``spark.driver.memory`` is the only memory knob; on a cluster the
    same conf object is what you'd pass to spark-submit.
    """
    cpus = cpus or default_parallelism()
    shuffle_partitions = shuffle_partitions or cpus
    # Python workers (UDFs, foreachPartition, python data sources) unpickle
    # engine classes by module reference — they need the package root on
    # their own sys.path. Must be set before the JVM forks workers.
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    current = os.environ.get("PYTHONPATH", "")
    if pkg_root not in current.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            os.pathsep.join([pkg_root, current]) if current else pkg_root
        )
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Round-11 (guide §3.1/§9): let the planner pick shuffled-hash
        # joins when its size conditions hold instead of defaulting to
        # sort-merge, and let AQE convert SMJ→SHJ at runtime when every
        # post-shuffle partition is under the threshold (64 MiB default;
        # scale-adaptive by construction — oversized partitions keep
        # SMJ's graceful spill). In-session alternating A/B over the 40
        # non-streaming PRIORITY queries: −21% total (44.6 → 35.1 s),
        # worst single regression +0.1 s. Production knobs via env:
        # the static planner preference is STATS-DRIVEN (a bad size
        # estimate on a real cluster can pick SHJ with an oversized
        # build side, which OOMs instead of spilling like SMJ), so
        # SPARK_GRAFT_PREFER_SMJ=true rolls production back to
        # sort-merge without a code change while keeping the
        # runtime-checked AQE threshold (ADVICE r11).
        .config(
            "spark.sql.join.preferSortMergeJoin",
            os.environ.get("SPARK_GRAFT_PREFER_SMJ", "false"),
        )
        .config(
            "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
            os.environ.get("SPARK_GRAFT_SHJ_THRESHOLD", "67108864"),
        )
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.optimizer.nestedSchemaPruning.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
