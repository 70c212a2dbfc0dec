"""Window operators (SURVEY.md §2.5 W1-W5, §2.7 O1-O2).

Scale note: every window here partitions by a key (Region, SubCategory,
OrderID, natural key) — one shuffle on the partition key, then sorted
streaming evaluation within partitions. None uses a global (unpartitioned)
window, which would serialize onto one task at 100 TB.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dedup_keep_first(
    df: DataFrame,
    keys: Sequence[str],
    order: Sequence[Column],
) -> DataFrame:
    """W1 — ``ROW_NUMBER() OVER (PARTITION BY keys ORDER BY order) = 1``
    (SQLproject1.sql:200-211). The reference orders by IngestedAt DESC with
    nondeterministic ties; callers must pass a TOTAL order (tie-break on a
    unique column) so results are stable — SURVEY.md §4.3."""
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def line_number(
    df: DataFrame,
    partition: Sequence[str],
    order: Sequence[Column],
    out: str = "OrderLineNo",
) -> DataFrame:
    """W2 — per-group line numbering (SQLproject1.sql:564-569)."""
    w = Window.partitionBy(*partition).orderBy(*order)
    return df.withColumn(out, F.row_number().over(w))


def rolling_sum(
    df: DataFrame,
    partition: Sequence[str],
    order: Sequence[Column],
    measures: dict[str, str],
    frame_rows: int = 30,
) -> DataFrame:
    """W3 — ``SUM(x) OVER (PARTITION BY p ORDER BY o ROWS BETWEEN n-1
    PRECEDING AND CURRENT ROW)`` (SQLproject1.sql:628-638). ``order`` must
    be a total order (the reference ties on Date — nondeterministic)."""
    w = (
        Window.partitionBy(*partition)
        .orderBy(*order)
        .rowsBetween(-(frame_rows - 1), Window.currentRow)
    )
    out = df
    for src, dst in measures.items():
        out = out.withColumn(dst, F.sum(src).over(w))
    return out


def rank_top_k(
    df: DataFrame,
    partition: Sequence[str],
    order: Sequence[Column],
    k: int,
    out: str = "rnk",
) -> DataFrame:
    """W4/O2 — ``RANK() ≤ k`` per group (SQLproject1.sql:689-699)."""
    w = Window.partitionBy(*partition).orderBy(*order)
    return df.withColumn(out, F.rank().over(w)).filter(F.col(out) <= k)


def share_of_total(
    df: DataFrame,
    partition: Sequence[str],
    measure: str,
    out: str,
    scale: tuple[int, int] = (9, 4),
) -> DataFrame:
    """W5 — ``x / NULLIF(SUM(x) OVER (PARTITION BY p), 0)`` cast
    DECIMAL(9,4) (SQLproject1.sql:693-694)."""
    w = Window.partitionBy(*partition)
    share = F.col(measure) / F.nullif(F.sum(measure).over(w), F.lit(0))
    return df.withColumn(out, share.cast(f"decimal({scale[0]},{scale[1]})"))
