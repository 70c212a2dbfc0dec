"""Bloom semi-join reduction (operators.prefilter): no false negatives,
real row reduction, and a pure-codegen probe expression."""

from pyspark.sql import functions as F

from superstore_data_pipeline_analytics_dashboard__spark.operators import prefilter as B
from superstore_data_pipeline_analytics_dashboard__spark.sources.catalog import (
    load_table,
)
from tests.conftest import SF_SMOKE


def _li(spark):
    return load_table(spark, SF_SMOKE, "lineitem")


def _keys(spark):
    return (
        load_table(spark, SF_SMOKE, "supplier")
        .filter(F.col("s_acctbal") >= 9000.0)
        .select("s_suppkey")
    )


def test_no_false_negatives(spark):
    """Every row the exact semi-join keeps must survive the prefilter."""
    li, keys = _li(spark), _keys(spark)
    pruned = B.bloom_prefilter(li, "l_suppkey", keys, "s_suppkey")
    exact = li.join(keys, li["l_suppkey"] == keys["s_suppkey"], "left_semi")
    missed = exact.exceptAll(
        pruned.join(keys, pruned["l_suppkey"] == keys["s_suppkey"], "left_semi")
    )
    assert missed.count() == 0


def test_reduction_and_fpr_bound(spark):
    """The prefilter must drop most non-matching rows: survivors ≤ exact
    matches + a small false-positive allowance."""
    li, keys = _li(spark), _keys(spark)
    n_total = li.count()
    n_exact = li.join(keys, li["l_suppkey"] == keys["s_suppkey"], "left_semi").count()
    n_pruned = B.bloom_prefilter(li, "l_suppkey", keys, "s_suppkey").count()
    assert n_exact <= n_pruned < n_total
    # ~1% design FPR; allow 5% of the non-matching population for slack
    assert n_pruned - n_exact <= max(50, 0.05 * (n_total - n_exact))


def test_probe_is_codegen_only(spark):
    li, keys = _li(spark), _keys(spark)
    pruned = B.bloom_prefilter(li, "l_suppkey", keys, "s_suppkey")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "MapInPandas" not in plan
    assert "Exchange" not in plan  # the whole prefilter runs in the scan stage
    assert "xxhash64" in plan


def test_composed_join_identical_to_plain_join(spark):
    li, keys = _li(spark), _keys(spark)
    pruned = B.bloom_prefilter(li, "l_suppkey", keys, "s_suppkey")
    a = (
        pruned.join(keys, pruned["l_suppkey"] == keys["s_suppkey"])
        .groupBy("l_suppkey")
        .count()
    )
    b = (
        li.join(keys, li["l_suppkey"] == keys["s_suppkey"])
        .groupBy("l_suppkey")
        .count()
    )
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_empty_build_side_filters_everything(spark):
    li = _li(spark)
    empty = _keys(spark).filter(F.lit(False))
    pruned = B.bloom_prefilter(li, "l_suppkey", empty, "s_suppkey")
    assert pruned.count() == 0
