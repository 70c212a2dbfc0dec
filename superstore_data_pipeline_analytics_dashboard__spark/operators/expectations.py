"""Declarative data contracts — named expectations with violation
budgets, evaluated in ONE conditional-aggregation pass, with a blocking
promotion gate.

The operational layer ABOVE :mod:`quality` (SURVEY.md §2.4 A3,
SQLproject1.sql:215-239 counts issues; this decides): a 100 TB ingest
doesn't just want violation COUNTS, it wants a CONTRACT — "orderkey is
never null (error, budget 0), discounts above 5% may be at most 1% of
rows (warn)" — checked before a batch is promoted to serving, with the
severity determining whether promotion blocks. The dbt-tests /
Great Expectations shape, reduced to what Spark evaluates natively:

* every expectation is a violation predicate + an integer
  parts-per-million budget + a severity;
* ALL expectations evaluate in one scan (``sum(when(pred,1))``
  conditional aggregation — the reference's one-COUNT-per-rule pattern
  would be N full scans at 100 TB);
* the report is exact integers end to end: violation rates are
  reported in ppm via integer floor division (positive operands, so
  Spark's ``div`` ≡ DuckDB's ``//`` — hash-portable, no doubles);
* :func:`enforce_expectations` is the gate: raises listing every
  failed error-severity expectation; warn failures report but never
  block.

Scale shape: one aggregation (map-side partial), report is
#expectations rows; the gate collects only the report. Zero-extra-cost
pipeline form: pass the same predicates to ``quality.observe_issues``
and gate on the observation after the promoting write action.
"""

from __future__ import annotations

from collections.abc import Mapping
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "Expectation",
    "check_expectations",
    "enforce_expectations",
    "check_batch_expectations",
    "enforce_batch_expectations",
]


@dataclass(frozen=True)
class Expectation:
    """One contract line: rows matching ``violation`` count against a
    budget of ``max_ppm`` parts-per-million of the table (0 = none
    allowed). ``severity`` is ``"error"`` (gate-blocking) or
    ``"warn"`` (report-only)."""

    violation: Column
    max_ppm: int = 0
    severity: str = "error"

    def __post_init__(self) -> None:
        if self.severity not in ("error", "warn"):
            raise ValueError(
                f"severity must be 'error' or 'warn', got {self.severity!r}"
            )
        if not 0 <= int(self.max_ppm) <= 1_000_000:
            raise ValueError(
                f"max_ppm must be in [0, 1000000], got {self.max_ppm}"
            )


def check_expectations(
    df: DataFrame, expectations: Mapping[str, Expectation]
) -> DataFrame:
    """Evaluate the contract in one pass. One row per expectation:
    ``(expectation, severity, n_rows, n_violations, violation_ppm,
    max_ppm, passed)`` — all counts exact BIGINT, ppm by integer floor
    division (0 for an empty table: no rows, no violations).

    NULL semantics are the predicate author's contract: a predicate
    evaluating to NULL counts as NOT a violation (``when`` takes the
    otherwise-branch), exactly like SQL ``WHERE`` — write
    ``col.isNull() | bad(col)`` when NULL itself is the violation."""
    if not expectations:
        return df.sparkSession.createDataFrame(
            [],
            "expectation STRING, severity STRING, n_rows BIGINT, "
            "n_violations BIGINT, violation_ppm BIGINT, max_ppm BIGINT, "
            "passed BOOLEAN",
        )
    aggs = [F.count(F.lit(1)).cast("bigint").alias("__n")] + [
        F.sum(F.when(e.violation, 1).otherwise(0))
        .cast("bigint")
        .alias(f"__v{i}")
        for i, e in enumerate(expectations.values())
    ]
    wide = df.agg(*aggs)
    rows = F.array(*[
        F.struct(
            F.lit(name).alias("expectation"),
            F.lit(e.severity).alias("severity"),
            F.col("__n").alias("n_rows"),
            F.col(f"__v{i}").alias("n_violations"),
            # integer ppm: positive operands, Spark `div` == DuckDB `//`
            F.when(F.col("__n") == 0, F.lit(0).cast("bigint"))
            .otherwise(
                F.expr(f"CAST(__v{i} * 1000000L DIV __n AS BIGINT)")
            )
            .alias("violation_ppm"),
            F.lit(int(e.max_ppm)).cast("bigint").alias("max_ppm"),
        )
        for i, (name, e) in enumerate(expectations.items())
    ])
    return (
        wide.select(F.explode(rows).alias("kv"))
        .select("kv.*")
        .withColumn("passed", F.col("violation_ppm") <= F.col("max_ppm"))
    )


def enforce_expectations(
    df: DataFrame, expectations: Mapping[str, Expectation]
) -> DataFrame:
    """The promotion gate: evaluate the contract and RAISE if any
    error-severity expectation fails, listing every failure with its
    measured ppm vs budget (one collected #expectations-row report —
    never rows). Returns the report DataFrame when the gate passes
    (warn failures included in it, visible but non-blocking)."""
    report = check_expectations(df, expectations)
    rows = report.collect()
    failed = [
        r for r in rows if not r["passed"] and r["severity"] == "error"
    ]
    if failed:
        detail = "; ".join(
            f"{r['expectation']}: {r['n_violations']} violations "
            f"({r['violation_ppm']} ppm > budget {r['max_ppm']} ppm)"
            for r in failed
        )
        raise ValueError(
            f"expectation gate failed ({len(failed)} error-severity "
            f"contract line(s)): {detail}"
        )
    # rebuild from the already-collected rows: a caller acting on the
    # returned report must not re-trigger the contract scan
    return df.sparkSession.createDataFrame(rows, report.schema)


def check_batch_expectations(
    ledger: DataFrame,
    version_col: str,
    expectations: Mapping[str, Expectation],
) -> DataFrame:
    """Cross-batch (table-level) contracts over a commit ledger — the
    aggregate face of :func:`check_expectations`: a 100 TB promotion
    gate doesn't only check rows INSIDE a batch, it checks the batch
    AGAINST HISTORY ("row count within x% of the previous commit",
    "table row count monotone", "added-volume drift bounded"). The
    natural input is ``sources/snapshots.snapshot_ledger`` (one row per
    commit: version, n_batches, n_files, n_rows, rows_added), but any
    frame with one row per commit-ordered version works.

    Each expectation's ``violation`` predicate sees the ledger row's
    columns PLUS ``prev_<col>`` for every column — the previous
    version's values under the ``version_col`` total order (NULL on the
    first version, where ``when`` takes the otherwise-branch: the first
    commit has no history to violate, same NULL contract as the
    row-level face). ``max_ppm`` budgets apply against the number of
    versions, so 0 means "no version may violate".

    Report: one row per expectation — ``(expectation, severity,
    n_versions, n_violations, first_bad_version, max_ppm, passed)``,
    exact integers; ``first_bad_version`` is NULL when clean.

    Scale shape: the lag window is a single global sort over the
    LEDGER — #commits rows, the control plane, never data — followed by
    one conditional aggregation; same one-pass discipline as the
    row-level face."""
    cols = ledger.columns
    if version_col not in cols:
        raise ValueError(
            f"version_col {version_col!r} not in ledger columns {cols}"
        )
    w = Window.orderBy(F.col(version_col).asc())
    aug = ledger.select(
        "*", *[F.lag(c).over(w).alias(f"prev_{c}") for c in cols]
    )
    if not expectations:
        return ledger.sparkSession.createDataFrame(
            [],
            "expectation STRING, severity STRING, n_versions BIGINT, "
            "n_violations BIGINT, first_bad_version BIGINT, "
            "max_ppm BIGINT, passed BOOLEAN",
        )
    aggs = [F.count(F.lit(1)).cast("bigint").alias("__n")]
    for i, e in enumerate(expectations.values()):
        aggs.append(
            F.sum(F.when(e.violation, 1).otherwise(0))
            .cast("bigint")
            .alias(f"__v{i}")
        )
        aggs.append(
            F.min(F.when(e.violation, F.col(version_col)))
            .cast("bigint")
            .alias(f"__first{i}")
        )
    wide = aug.agg(*aggs)
    rows = F.array(*[
        F.struct(
            F.lit(name).alias("expectation"),
            F.lit(e.severity).alias("severity"),
            F.col("__n").alias("n_versions"),
            F.col(f"__v{i}").alias("n_violations"),
            F.col(f"__first{i}").alias("first_bad_version"),
            F.lit(int(e.max_ppm)).cast("bigint").alias("max_ppm"),
        )
        for i, (name, e) in enumerate(expectations.items())
    ])
    return (
        wide.select(F.explode(rows).alias("kv"))
        .select("kv.*")
        .withColumn(
            "passed",
            F.when(F.col("n_versions") == 0, F.lit(True)).otherwise(
                F.expr(
                    "CAST(n_violations * 1000000L DIV n_versions AS BIGINT)"
                )
                <= F.col("max_ppm")
            ),
        )
    )


def enforce_batch_expectations(
    ledger: DataFrame,
    version_col: str,
    expectations: Mapping[str, Expectation],
) -> DataFrame:
    """Promotion gate over the ledger contract: raise listing every
    failed error-severity line (with its first bad version — the commit
    an operator must inspect), return the collected-and-rebuilt report
    otherwise. Same severity routing as :func:`enforce_expectations`."""
    report = check_batch_expectations(ledger, version_col, expectations)
    rows = report.collect()
    failed = [
        r for r in rows if not r["passed"] and r["severity"] == "error"
    ]
    if failed:
        detail = "; ".join(
            f"{r['expectation']}: {r['n_violations']} of "
            f"{r['n_versions']} versions violate (first at version "
            f"{r['first_bad_version']})"
            for r in failed
        )
        raise ValueError(
            f"batch expectation gate failed ({len(failed)} error-severity "
            f"contract line(s)): {detail}"
        )
    return ledger.sparkSession.createDataFrame(rows, report.schema)
