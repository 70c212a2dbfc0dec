"""Idempotent append + join-shaped helpers (SURVEY.md §2.6 J4-J8, §2.1 S5).

All anti/semi joins are expressed as `left_anti`/`left_semi` so AQE can
pick broadcast sides; never `collect` + filter.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def idempotent_append(new: DataFrame, existing: DataFrame, keys: Sequence[str]) -> DataFrame:
    """S5/J7 — rows of `new` whose key is absent from `existing`
    (``WHERE NOT EXISTS``, SQLproject1.sql:612-615) → left_anti join."""
    return new.join(existing.select(*keys).distinct(), list(keys), "left_anti")


def semi_join(df: DataFrame, other: DataFrame, keys: Sequence[str]) -> DataFrame:
    """J8 — ``WHERE EXISTS`` (SQLproject1.sql:497-509) → left_semi."""
    return df.join(other.select(*keys).distinct(), list(keys), "left_semi")


def lateral_top1(
    df: DataFrame,
    other: DataFrame,
    keys: Sequence[str],
    order: Sequence[Column],
    how: str = "inner",
) -> DataFrame:
    """J4/J5/O1 — ``CROSS/OUTER APPLY (SELECT TOP(1) … ORDER BY …)``
    (SQLproject1.sql:589-611): dedup `other` to its per-key top-1 row under
    a TOTAL order, then plain join. inner ≈ CROSS APPLY, left ≈ OUTER APPLY."""
    w = Window.partitionBy(*keys).orderBy(*order)
    top1 = (
        other.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    return df.join(top1, list(keys), how)
