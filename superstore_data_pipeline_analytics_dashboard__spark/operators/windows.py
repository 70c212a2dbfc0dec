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
    date — and keeps frames exact by CARRYING, into each bucket B, the
    last ``frame_rows - 1`` rows that precede B in the GLOBAL per-
    partition order (they may span several sparse earlier buckets).
    A carried row sorts before B's own rows (``bucket`` is monotone in
    ``order``), contributes to their frames, and is dropped from the
    output, so results equal the single-partition form exactly —
    decimal sums are order-independent.

    Mechanics: candidate carries are each bucket's last ``frame_rows-1``
    rows (a row deeper than that from its bucket's end can never be
    within the last ``frame_rows-1`` global predecessors of a later
    bucket). With C(b) = cumulative rows in buckets ≤ b and e = the
    row's 1-based index from its bucket's end, the row's global index is
    C(b) - e + 1, and it is carried into target bucket B (b < B) iff
    ``C(b) - e + 1 > before(B) - (frame_rows-1)`` where before(B) =
    rows strictly before B. Bucket counts are dimension-sized, so the
    tails×targets range join broadcasts the target list.

    Cost: one small window pass for bucket tails + a groupBy for bucket
    counts; parallelism goes from |partition| to |partition × bucket|.

    ``order`` is a sequence of ASCENDING sort keys forming a total order
    (plain columns or names — the tail-finding pass reverses them); the
    ``bucket`` expression must be monotone in that order (e.g. yyyyMM of
    the leading date key).
    """
    carry_n = frame_rows - 1
    asc = [F.col(c) if isinstance(c, str) else c for c in order]
    # three consumers below (bucket counts, bucket tails, the main window)
    # would each re-execute the upstream plan — persist one materialization
    # instead (at cluster scale: MEMORY_AND_DISK, same rationale as the
    # multi-pass persist in graph.dedup_clusters)
    tagged = df.withColumn("__bkt", bucket.cast("long")).persist()

    # per-(partition, bucket) row counts and cumulative counts — these are
    # dimension-sized (|partition × bucket| rows), windowing them is cheap
    w_cum = (
        Window.partitionBy(*partition)
        .orderBy("__bkt")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    counts = (
        tagged.groupBy(*partition, "__bkt")
        .agg(F.count(F.lit(1)).alias("__cnt"))
        .withColumn("__cum", F.sum("__cnt").over(w_cum))
    )
    targets = counts.select(
        *partition,
        F.col("__bkt").alias("__tgt_bkt"),
        (F.col("__cum") - F.col("__cnt")).alias("__before"),
    )

    # last carry_n rows of each (partition, bucket): row_number from the end
    w_end = Window.partitionBy(*partition, "__bkt").orderBy(*[c.desc() for c in asc])
    tails = (
        tagged.withColumn("__rn_end", F.row_number().over(w_end))
        .filter(F.col("__rn_end") <= carry_n)
        .join(counts.select(*partition, "__bkt", "__cum"), [*partition, "__bkt"])
        .withColumn("__gidx", F.col("__cum") - F.col("__rn_end") + F.lit(1))
    )
    carried = (
        tails.join(
            F.broadcast(targets),
            [
                *(tails[p] == targets[p] for p in partition),
                tails["__bkt"] < targets["__tgt_bkt"],
                tails["__gidx"] > targets["__before"] - F.lit(carry_n),
            ],
        )
        .drop(*(targets[p] for p in partition))
        .withColumn("__bkt", F.col("__tgt_bkt"))
        .drop("__tgt_bkt", "__before", "__rn_end", "__cum", "__gidx")
        .withColumn("__carry", F.lit(True))
    )
    main = tagged.withColumn("__carry", F.lit(False))
    unioned = main.unionByName(carried)

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
