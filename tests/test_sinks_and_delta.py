"""Namespace sinks (S4-S7) + superstore SCD2 delta batch (F4)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from superstore_data_pipeline_analytics_dashboard__spark.plans import (
    superstore_pipeline as P,
)
from superstore_data_pipeline_analytics_dashboard__spark.sources import sinks


def test_namespaces_and_idempotent_fact_append(spark, superstore_layers):
    sinks.ensure_namespaces(spark)
    sinks.drop_star(spark)

    sinks.save_star_catalog(spark, superstore_layers)
    n1 = spark.table("fact.sales").count()
    assert n1 == 9986

    # appending the same fact again must be a no-op (S5 NOT EXISTS guard)
    sinks.append_idempotent(
        superstore_layers["fact"], "fact.sales", ["OrderID", "OrderLineNo"]
    )
    assert spark.table("fact.sales").count() == n1
    assert spark.table("dim.customer").count() == 793
    assert spark.table("qa.load_issues").count() == 3

    # CBO statistics: table rowCount + column NDV land in the catalog
    # metadata (what lets the optimizer cost join orders at scale)
    sinks.analyze_table(spark, "fact.sales", ["OrderID"])
    desc = {
        r["col_name"]: r["data_type"]
        for r in spark.sql("DESCRIBE TABLE EXTENDED fact.sales").collect()
    }
    assert "9986" in desc.get("Statistics", "")
    col_stats = {
        r["info_name"]: r["info_value"]
        for r in spark.sql(
            "DESCRIBE TABLE EXTENDED fact.sales OrderID"
        ).collect()
    }
    assert col_stats.get("distinct_count") not in (None, "NULL")
    sinks.drop_star(spark)


def test_superstore_scd2_delta_batch(spark, superstore_layers):
    """Simulate day-2: one segment change, one brand-new customer."""
    stg = superstore_layers["stg"]
    dim = superstore_layers["dim_customer"]

    changed = (
        stg.filter(F.col("CustomerID") == "AA-10315")
        .withColumn("Segment", F.lit("CHANGED-SEG"))
    )
    new_cust = (
        stg.limit(1)
        .withColumn("CustomerID", F.lit("ZZ-99999"))
        .withColumn("CustomerName", F.lit("Zed New"))
    )
    # unchanged slice keeps everyone else current through the merge
    stg2 = stg.unionByName(changed).unionByName(new_cust).filter(
        (F.col("CustomerID") != "AA-10315") | (F.col("Segment") == "CHANGED-SEG")
    )
    out = P.apply_customer_delta(dim, stg2, as_of=dt.date(2020, 6, 1)).cache()

    aa = out.filter(F.col("CustomerID") == "AA-10315").collect()
    assert len(aa) == 2
    cur = [r for r in aa if r["IsCurrent"]][0]
    old = [r for r in aa if not r["IsCurrent"]][0]
    assert cur["Segment"] == "CHANGED-SEG"
    assert str(cur["EffectiveFrom"]) == "2020-06-01"
    assert str(old["EffectiveTo"]) == "2020-06-01"

    zz = out.filter(F.col("CustomerID") == "ZZ-99999").collect()
    assert len(zz) == 1 and zz[0]["IsCurrent"]

    # everyone else untouched; exactly one current row per key
    assert out.count() == 793 + 2  # 793 originals + 1 new version + 1 new key
    assert (
        out.filter(F.col("IsCurrent")).groupBy("CustomerID").count()
        .filter(F.col("count") > 1).count() == 0
    )
    # surrogate keys remain unique
    assert out.select("CustomerKey").distinct().count() == out.count()


def test_observe_issues_counts_during_write(spark, superstore_layers, tmp_path):
    """QA counters via Observation accumulate during the sink write —
    no dedicated counting scan — and agree with the dedicated-pass form."""
    from superstore_data_pipeline_analytics_dashboard__spark.operators.quality import (
        load_issues,
        observe_issues,
    )

    stg = superstore_layers["stg"]
    rules = {
        "null_postal": F.col("PostalCode").isNull(),
        "nonpositive_sales": F.col("Sales") <= 0,
    }
    observed, obs = observe_issues(stg, rules)
    observed.write.mode("overwrite").parquet(str(tmp_path / "observed_sink"))
    got = obs.get
    assert got["n_rows"] == stg.count()
    direct = {
        r["IssueType"]: r["RowCount"]
        for r in load_issues(stg, rules).collect()
    }
    assert got["null_postal"] == direct["null_postal"]
    assert got["nonpositive_sales"] == direct["nonpositive_sales"]
