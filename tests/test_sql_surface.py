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


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_sql_asof_macro_equals_dataframe_op(spark, sf_dir):
    """sql.asof_join_sql ≡ ops.asof_join (backward, by-key, tiebreak)."""
    from v3_polars_spark.ops import asof_join

    got = em.q_sql_asof(spark, sf_dir)
    e = em._t(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id"
    )
    purch = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("p_event_id"), "value"
    )
    expect = asof_join(
        clicks, purch, on="ts", by=["user_id"], tiebreak=["p_event_id"]
    ).select(
        "user_id",
        em._ts_str("ts", "ts_str"),
        "event_id",
        F.col("value").alias("last_purchase_value"),
    )
    # the macro's CAST(ts AS STRING) trims trailing fractional zeros the
    # same way date_format/strftime do at whole seconds; testdata ts are
    # whole-second so both spellings agree
    assert _rows(got.drop("ts_str")) == _rows(expect.drop("ts_str"))
    assert got.count() == expect.count()


def test_sql_dedup_last_macro_equals_dataframe_op(spark, sf_dir):
    from v3_polars_spark.ops import dedup_last

    got = em.q_sql_dedup_last(spark, sf_dir)
    e = em._t(spark, sf_dir, "events")
    expect = dedup_last(
        e.select("user_id", "ts", "event_id", "event_type", "value"),
        keys=["user_id"],
        order=["ts", "event_id"],
    ).select(
        "user_id", em._ts_str("ts", "ts_str"), "event_id", "event_type", "value"
    )
    assert _rows(got.drop("ts_str")) == _rows(expect.drop("ts_str"))


def test_sql_resample_macro_equals_dataframe_op(spark, sf_dir):
    from v3_polars_spark.ops import resample

    got = em.q_sql_resample(spark, sf_dir)
    e = em._t(spark, sf_dir, "events")
    expect = resample(
        e,
        "ts",
        "6h",
        [
            F.count(F.lit(1)).alias("n_events"),
            F.max("value").alias("max_value"),
            F.min("event_id").alias("first_event_id"),
        ],
    ).select(
        F.col("bucket_ts").cast("string").alias("bucket_str"),
        "n_events",
        "max_value",
        "first_event_id",
    )
    assert _rows(got) == _rows(expect)


def test_sql_asof_macro_forward_strategy(spark, sf_dir):
    """Forward strategy parity on real data (not covered by a gate query)."""
    from v3_polars_spark.ops import asof_join
    from v3_polars_spark.sql import asof_join_sql, register_testdata

    e = em._t(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id"
    )
    purch = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("p_event_id"), "value"
    )
    clicks.createOrReplaceTempView("__fwd_clicks")
    purch.createOrReplaceTempView("__fwd_purch")
    sql = asof_join_sql(
        left="__fwd_clicks",
        right="__fwd_purch",
        on="ts",
        by=["user_id"],
        values=["value"],
        left_cols=["event_id"],
        strategy="forward",
        tiebreak=["p_event_id"],
    )
    got = spark.sql(sql).select("user_id", "event_id", "value")
    expect = asof_join(
        clicks, purch, on="ts", by=["user_id"], strategy="forward",
        tiebreak=["p_event_id"],
    ).select("user_id", "event_id", "value")
    assert _rows(got) == _rows(expect)


def test_sql_asof_macro_single_exchange(spark, sf_dir):
    """The spark-dialect macro keeps ops.asof_join's scale contract: ONE
    query-time shuffle exchange (cache-population repartitions excluded —
    same attribution the plans auditor uses)."""
    from v3_polars_spark.plans.inspect import count_exchanges_split

    df = em.q_sql_asof(spark, sf_dir)
    split = count_exchanges_split(df)
    assert split["query"] <= 1, split
