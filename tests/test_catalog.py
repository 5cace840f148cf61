"""Ad-hoc SQL catalog (catalog.py): registration, normalization, and
equivalence with the DataFrame API."""

from __future__ import annotations

from pyspark.sql import functions as F

from binance_data_ingestor_spark.catalog import TABLES, register_tables, sql
from binance_data_ingestor_spark.queries.util import load

SF = "/root/testdata/sf0.001"


def test_register_all_tables_and_query(spark):
    names = register_tables(spark, SF)
    assert names == TABLES
    for t in names:
        assert spark.sql(f"SELECT count(*) AS n FROM {t}").collect()[0].n > 0


def test_events_view_is_timestamp_normalized(spark):
    register_tables(spark, SF)
    dtype = dict(spark.table("events").dtypes)["ts"]
    assert dtype == "timestamp"  # nanos long / NTZ both normalized


def test_adhoc_sql_matches_dataframe_api(spark):
    got = {
        (r.o_orderpriority, r.n, r.cents)
        for r in sql(
            spark,
            SF,
            """SELECT o_orderpriority, count(*) AS n,
                      CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                           AS BIGINT) AS cents
               FROM orders GROUP BY o_orderpriority""",
        ).collect()
    }
    want = {
        (r.o_orderpriority, r.n, r.cents)
        for r in load(spark, SF, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("cents"),
        )
        .collect()
    }
    assert got == want
