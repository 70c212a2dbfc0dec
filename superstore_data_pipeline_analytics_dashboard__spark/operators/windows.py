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


def rolling_sum_bucketed(
    df: DataFrame,
    partition: Sequence[str],
    order: Sequence[Column],
    measures: dict[str, str],
    bucket: Column,
    frame_rows: int = 30,
) -> DataFrame:
    """W3 at scale — frame-preserving de-skew of :func:`rolling_sum`.

    A ROWS-frame window keyed only by a low-cardinality ``partition``
    (q08's 5 regions) serializes into a handful of giant sorted partitions
    at 100 TB (VERDICT.md "What's wrong" #4). This rewrite re-keys the
    window to (partition, bucket) — e.g. bucket = yyyyMM of the order
    date — and keeps frames exact by CARRYING the last ``frame_rows - 1``
    rows of each bucket into the next populated bucket: a carried row
    sorts before the next bucket's own rows (its order columns are
    strictly smaller), contributes to their frames, and is dropped from
    the output. Rows deeper than ``frame_rows - 1`` into a bucket never
    see carried rows (outside their frame), so results equal the
    single-partition form exactly — decimal sums are order-independent.

    Precondition (asserted nowhere, documented here and in PERF.md):
    every populated (partition, bucket) group must hold at least
    ``frame_rows - 1`` rows; otherwise a frame could span three buckets.
    Pick the bucket granularity so this holds with slack — at 100 TB a
    month of one region is millions of rows, not 29.

    Cost: one extra small window pass to find bucket tails + a distinct
    over (partition, bucket) for the next-populated-bucket map (tiny,
    broadcast); parallelism goes from |partition| to |partition × bucket|.

    ``order`` is a sequence of ASCENDING sort keys forming a total order
    (plain columns or names — the tail-finding pass reverses them); the
    ``bucket`` expression must be monotone in that order (e.g. yyyyMM of
    the leading date key).
    """
    carry_n = frame_rows - 1
    asc = [F.col(c) if isinstance(c, str) else c for c in order]
    tagged = df.withColumn("__bkt", bucket.cast("long"))

    # last carry_n rows of each (partition, bucket): row_number from the end
    w_end = Window.partitionBy(*partition, "__bkt").orderBy(*[c.desc() for c in asc])

    # map each populated bucket to the NEXT populated bucket per partition
    # (distinct first — |partition × bucket| rows, dimension-sized)
    w_next = Window.partitionBy(*partition).orderBy("__bkt")
    nxt = (
        tagged.select(*partition, "__bkt")
        .distinct()
        .withColumn("__next_bkt", F.lead("__bkt").over(w_next))
        .filter(F.col("__next_bkt").isNotNull())
    )

    tails = (
        tagged.withColumn("__rn_end", F.row_number().over(w_end))
        .filter(F.col("__rn_end") <= carry_n)
        .drop("__rn_end")
        .join(F.broadcast(nxt), [*partition, "__bkt"])
        .withColumn("__bkt", F.col("__next_bkt"))
        .drop("__next_bkt")
        .withColumn("__carry", F.lit(True))
    )
    main = tagged.withColumn("__carry", F.lit(False))
    unioned = main.unionByName(tails)

    w = (
        Window.partitionBy(*partition, "__bkt")
        .orderBy(*asc)
        .rowsBetween(-carry_n, Window.currentRow)
    )
    out = unioned
    for src, dst in measures.items():
        out = out.withColumn(dst, F.sum(src).over(w))
    return out.filter(~F.col("__carry")).drop("__bkt", "__carry")


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
