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
    `rules` maps issue name → boolean predicate Column. The unpivot is
    built from Column expressions (no SQL-string interpolation, so rule
    names may contain quotes/backticks; empty rules → empty frame)."""
    if not rules:
        return df.sparkSession.createDataFrame(
            [], "IssueType STRING, RowCount BIGINT"
        )
    aggs = [
        F.sum(F.when(pred, 1).otherwise(0)).cast("bigint").alias(f"__r{i}")
        for i, pred in enumerate(rules.values())
    ]
    wide = df.agg(*aggs)
    pairs = F.array(*[
        F.struct(
            F.lit(name).alias("IssueType"), F.col(f"__r{i}").alias("RowCount")
        )
        for i, name in enumerate(rules)
    ])
    return wide.select(F.explode(pairs).alias("kv")).select(
        "kv.IssueType", "kv.RowCount"
    )


def observe_issues(df: DataFrame, rules: dict[str, Column], name: str = "qa"):
    """F20/A3 at zero extra cost: attach the QA rule counters to the
    DataFrame as an ``Observation`` — the metrics are accumulated DURING
    whatever action materializes ``df`` (the fact write, a sink append),
    so the rules cost NO additional scan at all. ``load_issues`` is the
    query form (one dedicated pass); this is the pipeline form.

    Returns ``(df_observed, observation)``; read
    ``observation.get`` AFTER an action on ``df_observed``. Keys:
    ``n_rows`` plus one count per rule name."""
    from pyspark.sql import Observation

    obs = Observation(name)
    metrics = [F.count(F.lit(1)).alias("n_rows")] + [
        F.sum(F.when(pred, 1).otherwise(0)).cast("bigint").alias(rule_name)
        for rule_name, pred in rules.items()
    ]
    return df.observe(obs, *metrics), obs
