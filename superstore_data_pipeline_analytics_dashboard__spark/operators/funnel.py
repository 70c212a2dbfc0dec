"""Ordered-step funnel analysis over an event stream (batch form).

The classic product-analytics operator the reference's dashboard family
implies but T-SQL can't express cleanly: for an ordered list of steps
(e.g. view → click → purchase), find each user's earliest step-1 event,
the earliest step-2 event AT OR AFTER it, and so on, and report how deep
the user got. The "at or after the previous step" dependency is what
makes this a sequence operator rather than a plain pivot.

Plan shape (the 100 TB argument): everything runs inside ONE hash
partitioning on the user key — a chain of Window execs (un-ordered
frames: partition-wide conditional MINs, no sort within the frame beyond
the partition clustering) followed by a hash aggregate that reuses the
same partitioning, so Catalyst emits a single Exchange for the whole
funnel regardless of the number of steps. No joins, no per-step shuffle,
no UDF. User-key cardinality is the parallelism — maximal for event data.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def funnel_stages(
    events: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """One row per user who reached step 1: ``<step>_ts`` per step (NULL
    once the funnel is abandoned) plus ``stage`` = deepest step reached.

    Each step's timestamp is the MIN event time of that type at-or-after
    the previous step's timestamp — earliest-completion semantics, ties
    resolved by the timestamps themselves (MIN is order-free and
    deterministic).
    """
    if not steps:
        raise ValueError("funnel needs at least one step")
    w = Window.partitionBy(user_col)
    df = events.select(user_col, type_col, ts_col)
    ts_cols: list[str] = []
    for step in steps:
        name = f"{step}_ts"
        cond = F.col(type_col) == step
        if ts_cols:
            cond = cond & (F.col(ts_col) >= F.col(ts_cols[-1]))
        df = df.withColumn(name, F.min(F.when(cond, F.col(ts_col))).over(w))
        ts_cols.append(name)
    # per-user the step columns are constants; MIN is a deterministic
    # pick and the aggregate reuses the window's hash partitioning
    per_user = df.groupBy(user_col).agg(
        *[F.min(c).alias(c) for c in ts_cols]
    )
    # deepest non-null step index (later steps are null-chained onto
    # earlier ones, so the max non-null index IS the funnel depth). The
    # F.lit(0) floor keeps greatest() valid for a 1-step funnel
    # (F.greatest requires >= 2 columns).
    stage = F.greatest(
        F.lit(0),
        *[
            F.when(F.col(c).isNotNull(), F.lit(i + 1)).otherwise(F.lit(0))
            for i, c in enumerate(ts_cols)
        ]
    )
    return (
        per_user.filter(F.col(ts_cols[0]).isNotNull())
        .select(user_col, *ts_cols, stage.alias("stage"))
    )
