"""Join operators Spark lacks as built-ins, re-expressed Spark-first.

The reference contains only equi/semi/anti/lateral joins (SURVEY.md §2.6);
these two are the classic extensions a large-scale event/training-data
pipeline needs on top:

* as-of join   — for each left row, the single most recent right row at or
                 before the left timestamp, per key. One shuffle: union the
                 two sides, sort within key partitions, carry the last
                 non-null right payload forward with an ignore-nulls window.
                 No per-key quadratic behavior, no UDF, no nested-loop join.
* range join   — ``value BETWEEN lo AND hi`` against an interval table.
                 Naively this is a BroadcastNestedLoopJoin (every fact row ×
                 every band). Bucketizing both sides on floor(value/width)
                 turns it into an equi hash join + residual filter — the
                 standard rewrite for interval joins at scale.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_time: str,
    right_time: str,
    suffix: str = "_right",
) -> DataFrame:
    """Backward (inclusive) as-of join: every ``left`` row gains the columns
    of the latest ``right`` row with ``right_time <= left_time`` for the
    same key(s), or NULLs when no such row exists (left-join semantics).

    Plan shape: ``left ∪ right`` tagged, one shuffle on the key, one
    in-partition sort on (time, side), then
    ``last(right_payload, ignorenulls=True)`` over an unbounded-preceding
    ROWS frame. Right rows sort BEFORE left rows at equal timestamps, which
    makes the match inclusive; ties among right rows at the same timestamp
    break deterministically by the full payload struct order. Wall cost is
    the same as a groupBy on the key — linear, skew handled by AQE.
    """
    keys = [on] if isinstance(on, str) else list(on)
    lcols = left.columns
    rcols = [c for c in right.columns if c not in keys]

    r_payload = F.struct(*[F.col(c) for c in rcols])
    r_type = right.select(r_payload.alias("p")).schema["p"].dataType
    l_payload = F.struct(*[F.col(c) for c in lcols])
    l_type = left.select(l_payload.alias("p")).schema["p"].dataType

    l = left.select(
        *[F.col(k).alias(f"__k{i}") for i, k in enumerate(keys)],
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__is_left"),
        l_payload.alias("__l"),
        F.lit(None).cast(r_type).alias("__r"),
    )
    r = right.select(
        *[F.col(k).alias(f"__k{i}") for i, k in enumerate(keys)],
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__is_left"),
        F.lit(None).cast(l_type).alias("__l"),
        r_payload.alias("__r"),
    )
    w = (
        Window.partitionBy(*[f"__k{i}" for i in range(len(keys))])
        .orderBy("__t", "__is_left", "__r")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    matched = (
        l.unionByName(r)
        .withColumn("__m", F.last("__r", ignorenulls=True).over(w))
        .filter(F.col("__is_left") == 1)
    )
    out_cols = [F.col("__l").getField(c).alias(c) for c in lcols]
    out_cols += [
        F.col("__m").getField(c).alias(c + suffix if c in lcols else c) for c in rcols
    ]
    return matched.select(*out_cols)


def banded_range_join(
    facts: DataFrame,
    bands: DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    bucket_width: float = 1000.0,
) -> DataFrame:
    """Interval join ``lo <= value < hi`` rewritten as an equi join.

    Facts get ``bucket = floor(value/width)``; each band explodes into the
    buckets its interval covers; the join runs on the bucket key and a
    residual half-open range filter removes edge misses. Overlapping bands
    produce one output row per matching band (join semantics). Choose
    ``bucket_width`` near the typical band width: too small explodes the
    band side, too large fattens the residual filter — either way the join
    itself stays a hash join, never a nested loop over facts × bands.
    """
    f = facts.withColumn(
        "__bucket", F.floor(F.col(value_col) / F.lit(bucket_width)).cast("long")
    )
    b = bands.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / F.lit(bucket_width)).cast("long"),
                # hi is exclusive, but a band ending exactly on a bucket
                # edge still covers the preceding bucket → ceil-1 via the
                # floor of the last contained value is overkill; the
                # residual filter makes an extra bucket harmless
                F.floor(F.col(hi_col) / F.lit(bucket_width)).cast("long"),
            )
        ),
    )
    return (
        f.join(b, "__bucket")
        .filter((F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) < F.col(hi_col)))
        .drop("__bucket")
    )
