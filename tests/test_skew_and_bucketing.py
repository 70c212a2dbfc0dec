"""Skew-mitigation operators + bucketed co-located joins: correctness AND
plan-shape assertions (the 100 TB checklist made executable)."""

import pytest
from pyspark.sql import functions as F

from superstore_data_pipeline_analytics_dashboard__spark.operators.skew import (
    salted_agg, salted_join,
)
from superstore_data_pipeline_analytics_dashboard__spark.sources import sinks
from tests.conftest import SF_SMOKE


def _skewed_df(spark):
    """90% of rows share one key."""
    return spark.range(0, 10000).select(
        F.when(F.col("id") % 10 != 0, F.lit("HOT")).otherwise(
            F.concat(F.lit("k"), F.col("id"))
        ).alias("k"),
        (F.col("id") % 7).alias("x"),
    )


def test_salted_agg_matches_plain_agg(spark):
    df = _skewed_df(spark)
    plain = {
        r["k"]: (r["c"], r["s"])
        for r in df.groupBy("k").agg(F.count("*").alias("c"), F.sum("x").alias("s")).collect()
    }
    salted = {
        r["k"]: (r["c"], r["s"])
        for r in salted_agg(
            df, ["k"],
            {"c": F.count("*"), "s": F.sum("x")},
            {"c": F.sum("c"), "s": F.sum("s")},
        ).collect()
    }
    assert salted == plain


def test_salted_join_matches_plain_join(spark):
    left = _skewed_df(spark)
    right = spark.createDataFrame(
        [("HOT", 1.5), ("k10", 2.5), ("missing", 9.9)], ["k", "w"]
    )
    plain = left.join(right, "k").agg(
        F.count("*").alias("n"), F.sum(F.col("x") * F.col("w")).alias("v")
    ).first()
    salted = salted_join(left, right, ["k"], salt=4).agg(
        F.count("*").alias("n"), F.sum(F.col("x") * F.col("w")).alias("v")
    ).first()
    assert salted["n"] == plain["n"]
    assert abs(salted["v"] - plain["v"]) < 1e-6


def test_salted_join_left_outer(spark):
    left = spark.createDataFrame([("a", 1), ("b", 2)], ["k", "x"])
    right = spark.createDataFrame([("a", 10.0)], ["k", "w"])
    out = {r["k"]: r["w"] for r in salted_join(left, right, ["k"], salt=4, how="left").collect()}
    assert out == {"a": 10.0, "b": None}


def test_bucketed_join_has_no_shuffle(spark):
    """Two tables bucketed on the same key join with ZERO Exchange nodes —
    the write-time co-location actually eliminates the shuffle."""
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    sinks.ensure_namespaces(spark)
    sinks.save_bucketed(
        li.select("l_orderkey", "l_quantity"), "stg.li_bucketed",
        ["l_orderkey"], n_buckets=8, sort_cols=["l_orderkey"],
    )
    sinks.save_bucketed(
        orders.select("o_orderkey", "o_totalprice"), "stg.ord_bucketed",
        ["o_orderkey"], n_buckets=8, sort_cols=["o_orderkey"],
    )
    a = spark.table("stg.li_bucketed")
    b = spark.table("stg.ord_bucketed")
    # disable broadcast so the join would otherwise shuffle
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = a.join(b, a["l_orderkey"] == b["o_orderkey"])
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan[:2000]
        assert joined.count() == li.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS stg.li_bucketed")
        spark.sql("DROP TABLE IF EXISTS stg.ord_bucketed")


def test_partitioned_fact_prunes_partitions(spark, superstore_layers, tmp_path_factory):
    """write_star partitions the fact by OrderYearMonth; a month filter
    must show up as a PartitionFilter (scan prunes directories), the Spark
    analog of the reference's IX_Fact_Date index seek."""
    out = str(tmp_path_factory.mktemp("star"))
    sinks_dir = out + "/fact_sales"
    from superstore_data_pipeline_analytics_dashboard__spark.plans import (
        superstore_pipeline as P,
    )

    P.write_star(superstore_layers, out)
    fact = spark.read.parquet(sinks_dir)
    q = fact.filter(F.col("OrderYearMonth") == 201703)
    plan = q._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "PartitionFilters: [isnotnull(OrderYearMonth" in plan
    # pruned scan answers correctly
    march = q.count()
    expected = superstore_layers["fact"].filter(
        (F.col("OrderDateKey") >= 20170301) & (F.col("OrderDateKey") <= 20170331)
    ).count()
    assert march == expected > 0
