"""SCD Type 2 dimension maintenance (SURVEY.md §2.10 — the reference's
hardest semantic, SQLproject1.sql:450-560).

The reference runs MERGE + a second INSERT pass against a mutable table.
On immutable parquet the whole transition is one full-outer join + a union
rewrite — a single shuffle on the natural key, no second pass needed
because row classes are derived in one expression (SURVEY.md §7 hard parts).

Row classes (src = today's snapshot, cur = current dim rows):
  new       — key only in src            → insert open row
  changed   — key in both, hash differs  → expire cur row + insert open row
  unchanged — key in both, hash equal    → carry cur row
  departed  — key only in cur            → carry cur row (reference keeps it)
History rows (IsCurrent = false) are unioned through untouched.
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import scd2_hash_diff

OPEN_FROM = "1900-01-01"   # SQLproject1.sql:489
OPEN_TO = "9999-12-31"     # SQLproject1.sql:490


def snapshot(df: DataFrame, key: str, attrs: Sequence[str]) -> DataFrame:
    """A1/A2 — one row per natural key with MAX() attribute snapshot
    (SQLproject1.sql:454-464) + SCD2 HashDiff."""
    snap = df.groupBy(key).agg(*[F.max(a).alias(a) for a in attrs])
    return snap.withColumn("HashDiff", scd2_hash_diff(*attrs))


def scd2_first_load(
    snap: DataFrame,
    key: str,
    attrs: Sequence[str],
    surrogate: str,
) -> DataFrame:
    """Degenerate first load: every key gets one open current row with a
    deterministic surrogate key (row_number over natural-key order — stable,
    unlike IDENTITY; SURVEY.md §7 step 5)."""
    w = Window.orderBy(key)
    return snap.select(
        F.row_number().over(w).alias(surrogate),
        F.col(key),
        *[F.col(a) for a in attrs],
        F.lit(OPEN_FROM).cast("date").alias("EffectiveFrom"),
        F.lit(OPEN_TO).cast("date").alias("EffectiveTo"),
        F.lit(True).alias("IsCurrent"),
        F.col("HashDiff"),
    )


def scd2_apply(
    dim: DataFrame,
    snap: DataFrame,
    key: str,
    attrs: Sequence[str],
    surrogate: str,
    as_of: dt.date | None = None,
) -> DataFrame:
    """Apply one day's snapshot to an existing SCD2 dim; returns the full
    rewritten dim. Semantics match the reference MERGE + second pass
    (SQLproject1.sql:485-514): changed keys expire at `as_of` and get a new
    current row effective `as_of`.
    """
    as_of_lit = F.lit(str(as_of or dt.date.today())).cast("date")

    history = dim.filter(~F.col("IsCurrent"))
    current = dim.filter(F.col("IsCurrent"))

    s = snap.select(
        F.col(key).alias("__key"),
        *[F.col(a).alias(f"__src_{a}") for a in attrs],
        F.col("HashDiff").alias("__src_hash"),
    )
    joined = current.join(s, current[key] == s["__key"], "full_outer").cache()

    unchanged = joined.filter(
        F.col(key).isNotNull()
        & (F.col("__key").isNull() | (F.col("HashDiff") == F.col("__src_hash")))
    ).select(*dim.columns)

    expired = joined.filter(
        F.col(key).isNotNull()
        & F.col("__key").isNotNull()
        & (F.col("HashDiff") != F.col("__src_hash"))
    ).select(
        F.col(surrogate),
        F.col(key),
        *[F.col(a) for a in attrs],
        F.col("EffectiveFrom"),
        as_of_lit.alias("EffectiveTo"),
        F.lit(False).alias("IsCurrent"),
        F.col("HashDiff"),
    )

    # fresh rows: brand-new keys (open-ended validity per reference first
    # insert) and replacement rows for changed keys (effective as_of).
    fresh_src = joined.filter(
        F.col("__key").isNotNull()
        & (F.col(key).isNull() | (F.col("HashDiff") != F.col("__src_hash")))
    )
    fresh = fresh_src.select(
        F.col("__key").alias(key),
        *[F.col(f"__src_{a}").alias(a) for a in attrs],
        F.when(F.col(key).isNull(), F.lit(OPEN_FROM).cast("date"))
        .otherwise(as_of_lit)
        .alias("EffectiveFrom"),
        F.lit(OPEN_TO).cast("date").alias("EffectiveTo"),
        F.lit(True).alias("IsCurrent"),
        F.col("__src_hash").alias("HashDiff"),
    )
    max_key = (dim.agg(F.max(surrogate)).first()[0]) or 0
    fresh = fresh.withColumn(
        surrogate,
        (F.row_number().over(Window.orderBy(key)) + F.lit(max_key)).cast(dim.schema[surrogate].dataType),
    ).select(*dim.columns)

    return history.unionByName(unchanged).unionByName(expired).unionByName(fresh)
