"""Z-order clustered write (operators/partitioning.zorder_write):
per-file min/max stats must become selective on BOTH dimensions."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
import pytest

from binance_data_ingestor_spark.operators.partitioning import zorder_value, zorder_write

SF_DIR = "/root/testdata/sf0.001"


def _file_areas(path, ca, cb):
    """Sum over files of normalized (range_a × range_b) — the expected
    fraction of the key space a reader must scan per file."""
    spans = []
    for f in glob.glob(f"{path}/*.parquet"):
        md = pq.read_metadata(f)
        alo = ahi = blo = bhi = None
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                col = md.row_group(rg).column(ci)
                st = col.statistics
                if st is None:
                    continue
                if col.path_in_schema == ca:
                    alo = st.min if alo is None else min(alo, st.min)
                    ahi = st.max if ahi is None else max(ahi, st.max)
                elif col.path_in_schema == cb:
                    blo = st.min if blo is None else min(blo, st.min)
                    bhi = st.max if bhi is None else max(bhi, st.max)
        spans.append((alo, ahi, blo, bhi))
    ga = max(s[1] for s in spans) - min(s[0] for s in spans) or 1
    gb = max(s[3] for s in spans) - min(s[2] for s in spans) or 1
    return sum(((s[1] - s[0]) / ga) * ((s[3] - s[2]) / gb) for s in spans)


def test_zorder_value_interleaves_bits(spark):
    from pyspark.sql import functions as F

    df = spark.range(1).select(
        zorder_value(F.lit(0b101), F.lit(0b011), bits=3).alias("z")
    )
    # x bits at even positions: 1,0,1 -> 0b010001 ; y at odd: 1,1,0 -> 0b001010
    assert df.collect()[0].z == 0b010001 | 0b001010


@pytest.mark.parametrize("n_files", [8])
def test_zorder_tightens_file_stats_on_both_dims(spark, tmp_path, n_files):
    src = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        "l_partkey", "l_suppkey", "l_extendedprice"
    )
    plain, zed = str(tmp_path / "plain"), str(tmp_path / "zed")
    # baseline: hash-scattered layout (what a shuffle leaves behind)
    src.repartition(n_files).write.mode("overwrite").parquet(plain)
    zorder_write(src, zed, ("l_partkey", "l_suppkey"), partitions=n_files)

    area_plain = _file_areas(plain, "l_partkey", "l_suppkey")
    area_zed = _file_areas(zed, "l_partkey", "l_suppkey")
    # hash layout: every file spans ~everything (area ≈ n_files);
    # z-order should cut the scannable area by at least half
    assert area_zed < area_plain / 2

    # and the rewrite is lossless
    a = spark.read.parquet(plain).count()
    b = spark.read.parquet(zed).count()
    assert a == b == src.count()
