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
    date, which must be monotone in ``order`` — so parallelism is
    |partition × bucket|, then repairs the frames that cross a bucket
    boundary with a dimension-sized fix-up join, in ONE fact-wide
    shuffle+sort (the same single sort the skewed plain form pays):

    1. One window pass keyed (partition, bucket) computes, per row, the
       in-bucket rolling sum, its in-bucket index ``i`` (row_number) and
       the bucket size ``cnt``. Only rows with ``i < frame_rows`` have
       frames reaching before their bucket; only a bucket's last
       ``frame_rows-1`` rows (``i > cnt-(frame_rows-1)``) can fall in a
       later row's frame — both are ≤ frame_rows-1 rows per bucket,
       i.e. dimension-sized slices of the persisted pass-1 output.
    2. A bucket directory (count + rows-strictly-before per bucket, from
       the one-row-per-bucket ``i = cnt`` slice) assigns each tail row
       its GLOBAL per-partition index ``g = before + i``. A needy row
       (index i in bucket B) is missing exactly its ``frame_rows - i``
       global predecessors, i.e. tail rows with
       ``g > before(B) - (frame_rows - i)`` — sparse earlier buckets
       spanned correctly (the round-2 q08 parity bug). Summing matched
       tails per needy row yields the missing-measure fix.
    3. The fix (≤ frame_rows-1 rows per bucket) broadcast-joins back on
       (partition, bucket, i) and adds to the in-bucket sum. Decimal/
       integer sums are associative, so results equal the plain form
       exactly; float measures may differ by re-association ulps.

    The pass-1 output is persisted (MEMORY_AND_DISK default) because the
    directory/tails/needy slices and the final join all consume it; the
    cache write replaces the old implementation's second fact-wide sort
    (2.0× q08 wall at sf0.1) and, at cluster scale, is the cheaper of
    the two (sequential local-disk write vs. full re-sort).

    ``order`` is a sequence of ASCENDING sort keys forming a total order.
    """
    carry_n = frame_rows - 1
    asc = [F.col(c) if isinstance(c, str) else c for c in order]
    srcs = list(dict.fromkeys(measures))
    tagged = df.withColumn("__bkt", bucket.cast("long"))

    w_bkt = Window.partitionBy(*partition, "__bkt").orderBy(*asc)
    w_frame = w_bkt.rowsBetween(-carry_n, Window.currentRow)
    w_all = w_bkt.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    first = tagged.withColumn("__i", F.row_number().over(w_bkt)).withColumn(
        "__cnt", F.count(F.lit(1)).over(w_all)
    )
    for src, dst in measures.items():
        first = first.withColumn(dst, F.sum(src).over(w_frame))
    first = first.persist()
    dst_types = {dst: first.schema[dst].dataType for dst in measures.values()}

    # bucket directory: one row per (partition, bucket) — count and the
    # number of rows strictly before the bucket in global order
    w_cum = (
        Window.partitionBy(*partition)
        .orderBy("__bkt")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    stats = (
        first.filter(F.col("__i") == F.col("__cnt"))
        .select(*partition, "__bkt", "__cnt")
        .withColumn("__before", F.sum("__cnt").over(w_cum) - F.col("__cnt"))
        .select(*partition, "__bkt", "__before")
    )

    tails = (
        first.filter(F.col("__i") > F.col("__cnt") - carry_n)
        .select(*partition, "__bkt", "__i", *srcs)
        .join(F.broadcast(stats), [*partition, "__bkt"])
        .withColumn("__g", F.col("__before") + F.col("__i"))
        .drop("__before")
        .alias("t")
    )
    needy = (
        first.filter(F.col("__i") <= carry_n)
        .select(*partition, "__bkt", "__i")
        .join(F.broadcast(stats), [*partition, "__bkt"])
        .alias("n")
    )
    fix = (
        needy.join(
            F.broadcast(tails),
            [
                *(F.col(f"n.{p}") == F.col(f"t.{p}") for p in partition),
                F.col("t.__bkt") < F.col("n.__bkt"),
                F.col("t.__g")
                > F.col("n.__before") - (F.lit(frame_rows) - F.col("n.__i")),
            ],
        )
        .groupBy(
            *(F.col(f"n.{p}").alias(p) for p in partition),
            F.col("n.__bkt").alias("__bkt"),
            F.col("n.__i").alias("__i"),
        )
        .agg(
            *(
                F.sum(F.col(f"t.{src}")).alias(f"__fix_{dst}")
                for src, dst in measures.items()
            )
        )
    )

    out = first.join(F.broadcast(fix), [*partition, "__bkt", "__i"], "left")
    for dst in measures.values():
        fixc = F.col(f"__fix_{dst}")
        out = out.withColumn(
            dst,
            F.when(fixc.isNull(), F.col(dst))
            .when(F.col(dst).isNull(), fixc)
            .otherwise(F.col(dst) + fixc)
            .cast(dst_types[dst]),
        ).drop(f"__fix_{dst}")
    return out.drop("__bkt", "__i", "__cnt")


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


def rolling_distinct(
    df: DataFrame,
    id_col: str,
    date_col: str,
    window_days: int = 7,
    out: str = "n_distinct",
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Exact COUNT(DISTINCT id) over a trailing ``window_days``-day
    window, per day (and per ``group_cols`` slice if given):
    (*group_cols, window_day, n_distinct). No Spark window frame
    supports DISTINCT aggregates, so the scale pattern is to EXPLODE
    each distinct (group, id, day) tuple into the ≤window_days
    window-days it covers and reduce the slide to a tumbling groupBy +
    count distinct. Shuffle volume is window_days × |distinct (group,
    id, day)| — independent of raw row volume after the first distinct.
    For wide windows where the explode factor hurts, the
    mergeable-sketch tier (sketches.theta_distinct_per_group / HLL
    union) replaces exactness with union-merge of per-day sketches.
    Catalog q101 (defaults) and q116 (14-day, per event_type) are the
    oracled instances over events."""
    gcols = list(group_cols)
    pairs = df.select(
        *gcols,
        F.col(id_col).alias("__id"),
        F.col(date_col).cast("date").alias("__day"),
    ).distinct()
    covered = pairs.select(
        *gcols,
        "__id",
        F.explode(
            F.sequence("__day", F.date_add("__day", window_days - 1))
        ).alias("window_day"),
    )
    return covered.groupBy(*gcols, "window_day").agg(
        F.countDistinct("__id").alias(out)
    )


def rolling_distinct_sketch(
    df: DataFrame,
    id_col: str,
    date_col: str,
    window_days: int = 7,
    out: str = "est_distinct",
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """The mergeable-sketch tier of :func:`rolling_distinct` — the
    executable form of the scale path that function's docstring
    prescribes for wide windows.

    ONE theta sketch per (group, day) absorbs the raw event volume in a
    single map-side-combined aggregation; the slide then explodes
    DAY-SKETCHES (window_days × |group × days| rows — independent of
    both raw volume AND distinct-id volume, where the exact tier's
    explode is window_days × |distinct id-days|) and union-merges per
    window day. At 100 TB this is the difference between shuffling the
    id universe k times and shuffling a few KB per day.

    Determinism note: a theta sketch in exact mode (distinct count below
    its nominal k = 4096 entries) retains every hash, so estimates are
    EXACT integers and union stays exact — which is why the catalog
    instance (q128) can be value-checked against a COUNT(DISTINCT)
    oracle at the audited scale factors (max window cardinality 1452 at
    sf0.1). Past k it degrades gracefully to ±1.6% estimates and the
    oracle relationship becomes approximate — the operator stays
    correct, the hash-check contract does not; deployments above k get
    rows-only treatment like q81/q82.
    """
    gcols = list(group_cols)
    daily = (
        df.select(
            *gcols,
            F.col(id_col).alias("__id"),
            F.col(date_col).cast("date").alias("__day"),
        )
        .groupBy(*gcols, "__day")
        .agg(F.theta_sketch_agg("__id").alias("__sk"))
    )
    covered = slide_day_sketches(daily, window_days, gcols)
    return covered.groupBy(*gcols, "window_day").agg(
        F.round(F.theta_sketch_estimate(F.theta_union_agg("__sk")))
        .cast("bigint")
        .alias(out)
    )


def slide_day_sketches(
    daily: DataFrame,
    window_days: int,
    group_cols: Sequence[str] = (),
    day_col: str = "__day",
    sketch_col: str = "__sk",
    out_day: str = "window_day",
) -> DataFrame:
    """THE day-sketch slide, shared by every mergeable-sketch window
    tier (distinct counts via theta — :func:`rolling_distinct_sketch`;
    quantiles via KLL — catalog q138): explode each per-day sketch row
    into the trailing ``window_days`` window-days it covers.  Grouping
    the result by (*group_cols, out_day) and merge-aggregating the
    sketch column completes the pattern.  One definition so the window
    boundary arithmetic cannot silently diverge between tiers."""
    return daily.select(
        *group_cols,
        F.explode(
            F.sequence(day_col, F.date_add(day_col, window_days - 1))
        ).alias(out_day),
        sketch_col,
    )
