"""QA counters (SURVEY.md §2.4 A3 — qa.LoadIssues, SQLproject1.sql:215-239).

The reference runs one COUNT(*) scan per rule; at 100 TB that's N full
scans. `load_issues` computes ALL rules in a single pass with conditional
aggregation (`sum(when(pred,1))`), then unpivots to the reference's
(IssueType, RowCount) shape.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def load_issues(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """One row per named rule: (IssueType string, RowCount bigint).
    `rules` maps issue name → boolean predicate Column."""
    aggs = [
        F.sum(F.when(pred, 1).otherwise(0)).cast("bigint").alias(name)
        for name, pred in rules.items()
    ]
    wide = df.agg(*aggs)
    stacked = wide.select(
        F.expr(
            "stack({n}, {args}) as (IssueType, RowCount)".format(
                n=len(rules),
                args=", ".join(f"'{name}', `{name}`" for name in rules),
            )
        )
    )
    return stacked
