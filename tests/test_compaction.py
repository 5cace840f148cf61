"""compact (operators/partitioning.py): output file-count hygiene."""

import glob

from binance_data_ingestor_spark.operators.partitioning import compact


def test_small_result_collapses_to_one_file(spark, tmp_path):
    df = spark.range(1000).repartition(16)  # 16 tasks, ~8 KB of data
    out = str(tmp_path / "small")
    compact(df).write.parquet(out)
    files = glob.glob(f"{out}/part-*.parquet")
    assert len(files) == 1


def test_large_target_splits(spark, tmp_path):
    df = spark.range(100_000).coalesce(1)
    out = str(tmp_path / "split")
    # absurdly small target: must grow the partition count, not shrink
    compacted = compact(df, target_bytes=64 << 10)
    assert compacted.rdd.getNumPartitions() > 1
    compacted.write.parquet(out)
    assert len(glob.glob(f"{out}/part-*.parquet")) > 1


def test_noop_when_already_right_sized(spark):
    df = spark.range(10).coalesce(1)
    assert compact(df).rdd.getNumPartitions() == 1
