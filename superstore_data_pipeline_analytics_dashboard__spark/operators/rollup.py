"""Incremental rollup maintenance (batch): merge partial aggregates
instead of recomputing.

The streaming twin lives in ``streaming/incremental.py`` (rollup
maintenance via foreachBatch); this is the batch form a 100 TB daily
load actually runs: yesterday's rollup + today's delta → today's
rollup, cost proportional to the DELTA + the rollup's own (small) size,
never to the full fact history. Correct only for ALGEBRAIC aggregates
carried as mergeable state — SUM and COUNT here (AVG = SUM/COUNT at
read time; MIN/MAX also merge; DISTINCT does not — use the sketch
operators for that).

Sums are carried in exact DECIMAL so a rollup merged in ANY batch order
is bit-identical to the full recompute — the property q93's oracle
checks directly (Spark merges base+delta, DuckDB recomputes from
scratch; they must hash-match).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def partial_rollup(
    df: DataFrame,
    keys: Sequence[str],
    measures: Mapping[str, Column],
) -> DataFrame:
    """One partial: per-key exact SUMs of the measure expressions plus
    ``n_rows``. The output schema is the mergeable state."""
    return df.groupBy(*keys).agg(
        *[F.sum(expr).alias(name) for name, expr in measures.items()],
        F.count("*").alias("n_rows"),
    )


def merge_rollups(rollups: Sequence[DataFrame], keys: Sequence[str]) -> DataFrame:
    """Merge partials by union + re-sum — associative and commutative,
    so any batch arrival order yields the identical rollup. The shuffle
    is rollup-sized (|keys| rows per partial), not fact-sized."""
    if not rollups:
        raise ValueError("need at least one partial rollup")
    out = rollups[0]
    for r in rollups[1:]:
        out = out.unionByName(r)
    measure_cols = [c for c in rollups[0].columns if c not in keys]
    return out.groupBy(*keys).agg(
        *[F.sum(c).alias(c) for c in measure_cols]
    )
