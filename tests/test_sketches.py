"""Sketch operators: accuracy pinned against exact answers (the sketch
values are engine-internal, so the catalog exposes KLL/theta rows-only —
these tests are their correctness story) and CMS structural guarantees."""

from pyspark.sql import functions as F

from superstore_data_pipeline_analytics_dashboard__spark.operators.sketches import (
    cms_probe,
    cms_table,
    kll_quantiles,
    theta_distinct_per_group,
)
from superstore_data_pipeline_analytics_dashboard__spark.sources.catalog import (
    load_table,
)
from tests.conftest import SF_SMOKE


def test_kll_quantiles_within_rank_tolerance(spark):
    orders = load_table(spark, SF_SMOKE, "orders")
    row = kll_quantiles(orders, "o_totalprice", quantiles=(0.25, 0.5, 0.9)).first()
    # exact value at rank q±2% brackets the KLL answer (k=200 ⇒ ~1.3% rank error)
    lo25, hi25, lo50, hi50, lo90, hi90 = orders.select(
        F.expr("percentile(o_totalprice, 0.23)"),
        F.expr("percentile(o_totalprice, 0.27)"),
        F.expr("percentile(o_totalprice, 0.48)"),
        F.expr("percentile(o_totalprice, 0.52)"),
        F.expr("percentile(o_totalprice, 0.88)"),
        F.expr("percentile(o_totalprice, 0.92)"),
    ).first()
    assert lo25 <= row["q25"] <= hi25
    assert lo50 <= row["q50"] <= hi50
    assert lo90 <= row["q90"] <= hi90
    assert row["n"] == orders.count()


def test_theta_distinct_close_to_exact(spark):
    ev = load_table(spark, SF_SMOKE, "events")
    est = {
        r["event_type"]: r["est_distinct"]
        for r in theta_distinct_per_group(ev, "event_type", "user_id").collect()
    }
    exact = {
        r["event_type"]: r["d"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("d"))
        .collect()
    }
    assert est.keys() == exact.keys()
    for k in exact:
        assert abs(est[k] - exact[k]) <= max(2, 0.05 * exact[k]), (k, est[k], exact[k])


def test_cms_overestimates_within_bound_and_merges(spark):
    li = load_table(spark, SF_SMOKE, "lineitem")
    width, depth = 512, 4
    n = li.count()
    sketch = cms_table(li, "l_partkey", width=width, depth=depth)
    probes = li.select("l_partkey").distinct().limit(30)
    est = {
        r["probe_key"]: r["est_count"]
        for r in cms_probe(sketch, probes, "l_partkey", width=width, depth=depth).collect()
    }
    true = {
        r["l_partkey"]: r["c"]
        for r in li.groupBy("l_partkey").agg(F.count("*").alias("c")).collect()
    }
    for k, e in est.items():
        assert e >= true[k], (k, e, true[k])  # one-sided error: never under
        assert e <= true[k] + (8 * n) // width, (k, e, true[k])  # loose CM bound

    # mergeability: sum of two half-corpus sketches == whole-corpus sketch
    a = li.filter(F.col("l_orderkey") % 2 == 0)
    b = li.filter(F.col("l_orderkey") % 2 == 1)
    merged = (
        cms_table(a, "l_partkey", width=width, depth=depth)
        .unionByName(cms_table(b, "l_partkey", width=width, depth=depth))
        .groupBy("row", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    whole = cms_table(li, "l_partkey", width=width, depth=depth)
    assert (
        merged.join(whole, ["row", "bucket"], "full")
        .filter(
            ~F.coalesce(merged["cnt"], F.lit(0)).eqNullSafe(
                F.coalesce(whole["cnt"], F.lit(0))
            )
        )
        .count()
        == 0
    )


def test_hll_join_overlap_close_to_exact(spark):
    from superstore_data_pipeline_analytics_dashboard__spark.operators.sketches import (
        hll_join_overlap,
    )

    li = load_table(spark, SF_SMOKE, "lineitem").select(
        F.col("l_orderkey").alias("k")
    )
    orders = load_table(spark, SF_SMOKE, "orders").select(
        F.col("o_orderkey").alias("k")
    )
    row = hll_join_overlap(li, orders, "k").first()
    exact = li.intersect(orders).count()
    assert abs(row["est_overlap"] - exact) <= max(5, 0.05 * exact), (
        row["est_overlap"],
        exact,
    )


def test_rolling_distinct_sketch_exact_below_nominal_k(spark):
    """Theta sketches below their nominal 4096 entries are in exact
    mode, so the sketch tier must EQUAL the exact tier at test scale —
    the contract that lets q128 carry a COUNT(DISTINCT) oracle."""
    from superstore_data_pipeline_analytics_dashboard__spark.operators.windows import (
        rolling_distinct,
        rolling_distinct_sketch,
    )
    from tests.conftest import SF_SMOKE

    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    exact = {
        (r["event_type"], r["window_day"]): r["n"]
        for r in rolling_distinct(
            ev, "user_id", "ts", 7, out="n", group_cols=("event_type",)
        ).collect()
    }
    est = {
        (r["event_type"], r["window_day"]): r["n"]
        for r in rolling_distinct_sketch(
            ev, "user_id", "ts", 7, out="n", group_cols=("event_type",)
        ).collect()
    }
    assert exact == est and len(exact) > 0


def test_rolling_distinct_sketch_matches_exact_on_random_data(spark):
    """Property: below the sketch's nominal entries the sketch tier is
    EXACTLY the exact tier on arbitrary (id, day) data — widths drawn
    beyond the q128 default."""
    import datetime as dt

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from superstore_data_pipeline_analytics_dashboard__spark.operators.windows import (
        rolling_distinct,
        rolling_distinct_sketch,
    )

    base = dt.date(2024, 3, 1)
    rows_strategy = st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 15)),
        min_size=1,
        max_size=50,
    )

    @settings(max_examples=8, deadline=None)
    @given(rows=rows_strategy, k=st.sampled_from([1, 3, 7, 10]))
    def check(rows, k):
        data = [(i, base + dt.timedelta(days=off)) for i, off in rows]
        df = spark.createDataFrame(data, "uid BIGINT, day DATE")
        exact = {
            r["window_day"]: r["n"]
            for r in rolling_distinct(
                df, "uid", "day", window_days=k, out="n"
            ).collect()
        }
        est = {
            r["window_day"]: r["n"]
            for r in rolling_distinct_sketch(
                df, "uid", "day", window_days=k, out="n"
            ).collect()
        }
        assert est == exact

    check()
