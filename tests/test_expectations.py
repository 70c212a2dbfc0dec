"""Declarative data contracts (operators/expectations.py): one-pass
evaluation, exact-integer ppm arithmetic, severity-gated enforcement,
NULL predicate semantics, and the single-scan plan shape."""

import pytest
from pyspark.sql import functions as F

from superstore_data_pipeline_analytics_dashboard__spark.operators.expectations import (
    Expectation,
    check_expectations,
    enforce_expectations,
)


@pytest.fixture(scope="module")
def orders_like(spark):
    rows = [
        (1, 100.0, "A"),
        (2, 250.0, "B"),
        (3, -5.0, "A"),  # negative price: 1 violation
        (4, 80.0, None),  # NULL status
        (5, 120.0, "Z"),  # out-of-domain status
    ]
    return spark.createDataFrame(
        rows, "id BIGINT, price DOUBLE, status STRING"
    ).persist()


def _by_name(report):
    return {r["expectation"]: r for r in report.collect()}


def test_report_counts_ppm_and_verdicts(orders_like):
    contract = {
        "id_not_null": Expectation(F.col("id").isNull()),
        "price_positive": Expectation(F.col("price") <= 0),
        "status_domain": Expectation(
            F.col("status").isNull() | ~F.col("status").isin("A", "B"),
            max_ppm=200_000,  # budget: 20% of rows
            severity="warn",
        ),
    }
    rep = _by_name(check_expectations(orders_like, contract))
    assert rep["id_not_null"]["n_violations"] == 0
    assert rep["id_not_null"]["passed"]
    # 1 violation of 5 rows = 200000 ppm exactly (integer floor div)
    assert rep["price_positive"]["n_violations"] == 1
    assert rep["price_positive"]["violation_ppm"] == 200_000
    assert not rep["price_positive"]["passed"]  # budget 0
    # NULL + 'Z' = 2 of 5 = 400000 ppm > 200000 budget
    assert rep["status_domain"]["n_violations"] == 2
    assert rep["status_domain"]["violation_ppm"] == 400_000
    assert not rep["status_domain"]["passed"]
    assert all(r["n_rows"] == 5 for r in rep.values())


def test_null_predicate_is_not_a_violation(orders_like):
    # status == 'Q' is NULL for the NULL-status row: when() takes the
    # otherwise branch — SQL WHERE semantics, documented contract
    rep = _by_name(
        check_expectations(
            orders_like, {"q_status": Expectation(F.col("status") == "Q")}
        )
    )
    assert rep["q_status"]["n_violations"] == 0


def test_enforce_blocks_on_error_only(orders_like):
    # warn failure alone: gate passes, report returned without rescan
    warn_only = {
        "status_domain": Expectation(
            F.col("status").isNull() | ~F.col("status").isin("A", "B"),
            severity="warn",
        )
    }
    rep = enforce_expectations(orders_like, warn_only)
    assert not _by_name(rep)["status_domain"]["passed"]
    # error failure: raises, message carries measured ppm vs budget
    with pytest.raises(ValueError, match="price_positive.*200000 ppm"):
        enforce_expectations(
            orders_like,
            {"price_positive": Expectation(F.col("price") <= 0)},
        )


def test_budget_boundary_is_inclusive(orders_like):
    # exactly-at-budget passes (<=): 1 of 5 rows = 200000 ppm
    rep = _by_name(
        check_expectations(
            orders_like,
            {"p": Expectation(F.col("price") <= 0, max_ppm=200_000)},
        )
    )
    assert rep["p"]["passed"]


def test_empty_table_and_empty_contract(spark):
    empty = spark.createDataFrame([], "id BIGINT")
    rep = _by_name(
        check_expectations(
            empty, {"id_not_null": Expectation(F.col("id").isNull())}
        )
    )
    assert rep["id_not_null"]["n_rows"] == 0
    assert rep["id_not_null"]["violation_ppm"] == 0
    assert rep["id_not_null"]["passed"]
    assert check_expectations(empty, {}).count() == 0


def test_invalid_expectation_config():
    with pytest.raises(ValueError, match="severity"):
        Expectation(F.lit(True), severity="fatal")
    with pytest.raises(ValueError, match="max_ppm"):
        Expectation(F.lit(True), max_ppm=2_000_000)


def test_single_scan_plan_shape(spark):
    """The 100 TB claim: N expectations = ONE aggregation pass (the
    reference's one-COUNT-per-rule would be N scans). The physical plan
    must contain exactly one scan of the input and one exchange pair."""
    spark.catalog.clearCache()  # CLAUDE.md: plan-SHAPE reads need this
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    contract = {
        f"rule{i}": Expectation(F.col("l_quantity") > 50 - i)
        for i in range(8)
    }
    plan = (
        check_expectations(li, contract)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("FileScan parquet") == 1, plan
    assert plan.count("Exchange") <= 2, plan  # partial agg + final


# ------------------------------------------- cross-batch (ledger) face


@pytest.fixture(scope="module")
def ledger_like(spark):
    """A snapshot_ledger-shaped frame: three commits, the second adds
    far fewer rows than the first (drift), the third shrinks the table
    (monotonicity break)."""
    rows = [
        (1, 1, 1, 1000, 1000),
        (2, 2, 2, 1100, 100),
        (3, 3, 3, 900, -200),
    ]
    return spark.createDataFrame(
        rows,
        "version BIGINT, n_batches BIGINT, n_files BIGINT, "
        "n_rows BIGINT, rows_added BIGINT",
    ).persist()


def test_batch_contract_lag_columns_and_verdicts(ledger_like):
    from superstore_data_pipeline_analytics_dashboard__spark.operators.expectations import (
        check_batch_expectations,
    )

    contract = {
        # v3 shrinks the table: 1 of 3 versions violates
        "row_count_monotone": Expectation(
            F.col("n_rows") < F.col("prev_n_rows")
        ),
        # |100 - 1000| * 100 > 50 * 1000 at v2; v3's delta vs 100 also
        # violates -> 2 violations (abs drift > 50% of previous add)
        "added_drift_bounded": Expectation(
            F.abs(F.col("rows_added") - F.col("prev_rows_added")) * 100
            > 50 * F.abs(F.col("prev_rows_added")),
            max_ppm=700_000,
            severity="warn",
        ),
        "added_positive": Expectation(
            F.col("rows_added") <= 0  # v3 only
        ),
    }
    rep = _by_name(
        check_batch_expectations(ledger_like, "version", contract)
    )
    assert all(r["n_versions"] == 3 for r in rep.values())
    mono = rep["row_count_monotone"]
    assert mono["n_violations"] == 1
    assert mono["first_bad_version"] == 3
    assert not mono["passed"]
    drift = rep["added_drift_bounded"]
    assert drift["n_violations"] == 2
    assert drift["first_bad_version"] == 2
    # 2 of 3 = 666666 ppm <= 700000 budget: passes with headroom
    assert drift["passed"]
    pos = rep["added_positive"]
    assert pos["n_violations"] == 1 and pos["first_bad_version"] == 3


def test_batch_contract_first_version_has_no_history(ledger_like):
    from superstore_data_pipeline_analytics_dashboard__spark.operators.expectations import (
        check_batch_expectations,
    )

    # prev_* is NULL at v1: the predicate is NULL there and the first
    # commit cannot violate a history contract (documented NULL policy)
    rep = _by_name(
        check_batch_expectations(
            ledger_like,
            "version",
            {"always_vs_prev": Expectation(F.col("prev_n_rows") >= 0)},
        )
    )
    assert rep["always_vs_prev"]["n_violations"] == 2  # v2, v3 only
    assert rep["always_vs_prev"]["first_bad_version"] == 2


def test_batch_gate_raises_with_first_bad_version(ledger_like):
    from superstore_data_pipeline_analytics_dashboard__spark.operators.expectations import (
        enforce_batch_expectations,
    )

    with pytest.raises(ValueError, match="first at version 3"):
        enforce_batch_expectations(
            ledger_like,
            "version",
            {
                "row_count_monotone": Expectation(
                    F.col("n_rows") < F.col("prev_n_rows")
                )
            },
        )
    # warn-severity failures report but do not block, and the returned
    # report is rebuilt from collected rows (no second ledger scan)
    rep = enforce_batch_expectations(
        ledger_like,
        "version",
        {
            "row_count_monotone": Expectation(
                F.col("n_rows") < F.col("prev_n_rows"), severity="warn"
            )
        },
    )
    rows = rep.collect()
    assert len(rows) == 1 and not rows[0]["passed"]


def test_batch_contract_guard_rails(ledger_like):
    from superstore_data_pipeline_analytics_dashboard__spark.operators.expectations import (
        check_batch_expectations,
    )

    with pytest.raises(ValueError, match="version_col"):
        check_batch_expectations(
            ledger_like, "no_such_col", {"x": Expectation(F.lit(True))}
        )
    assert (
        check_batch_expectations(ledger_like, "version", {}).count() == 0
    )
