"""End-to-end ELT acceptance against BASELINE.md anchors (intended
semantics) and the workbook's cached pivot goldens (observed-Excel)."""

from decimal import Decimal

from pyspark.sql import functions as F

from superstore_data_pipeline_analytics_dashboard__spark.plans import (
    superstore_pipeline as P,
)
from tests.conftest import REFERENCE_CSV


def test_staging_and_dedup_counts(superstore_layers):
    assert superstore_layers["stg_all"].count() == 9994
    assert superstore_layers["stg"].count() == 9986


def test_staging_sums_match_baseline(superstore_layers):
    """BASELINE.md: pre-dedup ΣSales 2,297,200.8603 ΣProfit 286,397.0217
    ΣQty 37,873; post-dedup 2,295,509.5723 / 286,013.8196."""
    pre = superstore_layers["stg_all"].agg(
        F.sum("Sales").alias("s"), F.sum("Profit").alias("p"), F.sum("Quantity").alias("q")
    ).first()
    assert pre["s"] == Decimal("2297200.8603")
    assert pre["p"] == Decimal("286397.0217")
    assert pre["q"] == 37873
    post = superstore_layers["stg"].agg(
        F.sum("Sales").alias("s"), F.sum("Profit").alias("p")
    ).first()
    assert post["s"] == Decimal("2295509.5723")
    assert post["p"] == Decimal("286013.8196")


def test_qa_issue_counters(superstore_layers):
    got = {r["IssueType"]: r["RowCount"] for r in superstore_layers["qa_issues"].collect()}
    assert got == {
        "NULL_DATES": 0,
        "NEGATIVE_PROFIT": 1870,
        "INCONSISTENT_GEOGRAPHY": 0,
    }


def test_dimension_row_counts(superstore_layers):
    expected = {
        "dim_date": 1464,
        "dim_shipmode": 4,
        "dim_category": 3,
        "dim_subcategory": 17,
        "dim_geography": 632,
        "dim_customer": 793,
        "dim_product": 1862,
    }
    for name, n in expected.items():
        assert superstore_layers[name].count() == n, name


def test_date_dim_bounds(superstore_layers):
    row = superstore_layers["dim_date"].agg(
        F.min("Date").alias("lo"), F.max("Date").alias("hi")
    ).first()
    assert str(row["lo"]) == "2014-01-03"
    assert str(row["hi"]) == "2018-01-05"


def test_fact_grain_and_fk_completeness(superstore_layers):
    fact = superstore_layers["fact"]
    assert fact.count() == 9986
    # UQ_OrderLine (SQLproject1.sql:379)
    assert fact.select("OrderID", "OrderLineNo").distinct().count() == 9986
    assert fact.select("SalesKey").distinct().count() == 9986
    for k in ("OrderDateKey", "ShipDateKey", "CustomerKey", "ProductKey",
              "ShipModeKey", "GeographyKey"):
        assert fact.filter(F.col(k).isNull()).count() == 0, k


def test_scd2_single_current_row(superstore_layers):
    for dim, key in (("dim_customer", "CustomerID"), ("dim_product", "ProductID")):
        df = superstore_layers[dim].filter(F.col("IsCurrent"))
        dup = df.groupBy(key).count().filter(F.col("count") > 1).count()
        assert dup == 0, f"{dim}: >1 current row per {key}"


def test_category_rollup_intended_semantics(superstore_layers):
    """BASELINE.md pre-dedup per-category rows/qty (on stg_all)."""
    rows = {
        r["Category"]: r
        for r in P.pivot_by_category(superstore_layers["stg_all"]).collect()
    }
    assert rows["Furniture"]["CountOfSales"] == 2121
    assert rows["Furniture"]["SumOfQuantity"] == 8028
    assert rows["Office Supplies"]["CountOfSales"] == 6026
    assert rows["Office Supplies"]["SumOfQuantity"] == 22906
    assert rows["Technology"]["CountOfSales"] == 1847
    assert rows["Technology"]["SumOfQuantity"] == 6939
    assert rows["Grand Total"]["CountOfSales"] == 9994
    assert rows["Grand Total"]["SumOfQuantity"] == 37873


def test_rows_per_order_year(superstore_layers):
    """BASELINE.md: 1,993 / 2,102 / 2,587 / 3,312 (pre-dedup)."""
    got = {
        r["y"]: r["count"]
        for r in superstore_layers["stg_all"]
        .groupBy(F.year("OrderDate").alias("y"))
        .count()
        .collect()
    }
    assert got == {2014: 1993, 2015: 2102, 2016: 2587, 2017: 3312}


def test_excel_compat_pivot_goldens(spark):
    """The workbook's cached PivotTable1 values (BASELINE.md golden):
    the only published result set of the reference."""
    table = P.excel_compat_table(spark, REFERENCE_CSV)
    rows = {r["Category"]: r for r in P.pivot_by_category(table).collect()}
    assert rows["Furniture"]["CountOfSales"] == 1169
    assert rows["Furniture"]["SumOfQuantity"] == 4471
    assert rows["Office Supplies"]["CountOfSales"] == 4589
    assert rows["Office Supplies"]["SumOfQuantity"] == 17319
    assert rows["Technology"]["CountOfSales"] == 1726
    assert rows["Technology"]["SumOfQuantity"] == 6477
    assert rows["Grand Total"]["CountOfSales"] == 7484
    assert rows["Grand Total"]["SumOfQuantity"] == 28267


def test_excel_compat_year_month_golden_sample(spark):
    """Spot-check PivotTable2 cached values (BASELINE.md): 2014-01 count 54
    qty 196; 2017-12 count 341 qty 1,266."""
    table = P.excel_compat_table(spark, REFERENCE_CSV)
    pivot = P.pivot_by_year_month(
        table.withColumnRenamed("OrderDate", "OrderDate")
    )
    got = {
        (r["OrderYear"], r["OrderMonth"]): r
        for r in pivot.collect()
    }
    assert got[(2014, 1)]["CountOfSales"] == 54
    assert got[(2014, 1)]["SumOfQuantity"] == 196
    assert got[(2017, 12)]["CountOfSales"] == 341
    assert got[(2017, 12)]["SumOfQuantity"] == 1266
    assert got[(-1, -1)]["CountOfSales"] == 7484
    assert got[(-1, -1)]["SumOfQuantity"] == 28267


def test_views_shape(superstore_layers):
    assert superstore_layers["v_rolling30"].count() == 9986
    top = superstore_layers["v_top_products_by_subcat"]
    # ≤5 per subcategory is not guaranteed with RANK ties, but ≥5 rows per
    # 17 subcats must exist and every subcat appears
    assert top.select("SubCategory").distinct().count() == 17
    sus = superstore_layers["v_suspicious_discounts"]
    assert sus.filter(F.col("Discount") <= 0).count() == 0


def test_slicer_dashboard_filters_both_pivots(spark, superstore_layers):
    """A11: slicers cross-filter both pivots; filtered counts must sum to
    the slice, not the whole table."""
    out = P.dashboard_superstore(
        superstore_layers, regions=["West"], segments=["Consumer"]
    )
    by_cat = {r["Category"]: r for r in out["by_category"].collect()}
    expected = (
        superstore_layers["stg"]
        .filter((F.col("Region") == "West") & (F.col("Segment") == "Consumer"))
        .count()
    )
    assert by_cat["Grand Total"]["CountOfSales"] == expected
    ym = out["by_year_month"]
    grand = [r for r in ym.collect() if r["OrderYear"] == -1][0]
    assert grand["CountOfSales"] == expected


def test_register_star_views_sql_surface(spark, superstore_layers):
    P.register_star_views(spark, superstore_layers)
    row = spark.sql("""
        SELECT count(*) AS n
        FROM fact JOIN dim_date d ON d.DateKey = fact.OrderDateKey
        WHERE d.Year = 2017
    """).first()
    assert row["n"] == 3310
    top = spark.sql(
        "SELECT count(DISTINCT SubCategory) AS n FROM v_top_products_by_subcat"
    ).first()
    assert top["n"] == 17
