"""SQL-surface parity: the same portable template runs through spark.sql
over registered views and must equal the DataFrame-API formulation."""

from pyspark.sql import functions as F

import __spark_entry__ as em
from v3_polars_spark.sql import register_testdata


def test_register_testdata_suffix_isolated(spark, sf_dir):
    views = register_testdata(spark, sf_dir, em._t, table_names=("region",))
    assert views["region"] != "region"  # suffixed per directory
    assert spark.table(views["region"]).count() == 5


def test_sql_pricing_equals_dataframe(spark, sf_dir):
    got = em.q_sql_pricing(spark, sf_dir)
    li = em._t(spark, sf_dir, "lineitem")
    cents = lambda c: F.round(F.col(c) * 100).cast("long")  # noqa: E731
    expect = (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(cents("l_quantity")).alias("sum_qty_c"),
            F.sum(cents("l_extendedprice")).alias("sum_base_c"),
            F.sum(
                cents("l_extendedprice")
                * F.round((1 - F.col("l_discount")) * 100).cast("long")
            ).alias("sum_disc_c4"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )
    key = ["l_returnflag", "l_linestatus"]
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, expect.collect()))
    assert got.select(*key).distinct().count() == expect.count()


def test_sql_region_volume_plan_broadcasts_dims(spark, sf_dir):
    """The 6-table join should broadcast every dimension side — no
    shuffle exchange for region/nation/supplier/customer at this size."""
    plan = em.q_sql_region_volume(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
