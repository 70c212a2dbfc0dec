"""File-level zone-map manifest: per-file min/max column statistics and
manifest-driven file pruning.

At 100 TB a table is tens of thousands of parquet files; partition
pruning eliminates directories, but range predicates on NON-partition
columns (an id range, a date inside an unpartitioned table, a z-order
key band) still scan every file unless something knows each file's
value bounds.  Lakehouse formats keep these bounds in table metadata
(Delta's `stats` on add-actions, Iceberg's manifest files); for plain
parquet directories this module materializes the same thing as a tiny
DataFrame — the poor-engine's manifest — and uses it to turn a range
predicate into an explicit file list for `spark.read.parquet(*files)`.

Pairs with `functions/zorder.py`: a z-ordered write clusters value
ranges per file, which is exactly what makes these zone maps selective
(a random layout gives every file near-global bounds and prunes
nothing — the test demonstrates both regimes).

Scale shape: stats collection is one narrow scan — `input_file_name()`
groupBy with min/max partial-aggregated map-side; the manifest is
#files rows and lives comfortably as a broadcast or a saved table that
incremental loads append to (new files only — the same append-only
discipline as the incremental-dedup state).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["collect_file_stats", "prune_files", "read_pruned"]


def collect_file_stats(
    spark: SparkSession, path: str, cols: Sequence[str]
) -> DataFrame:
    """One row per data file: row count + min/max for each of ``cols``.

    Columns produced: ``file``, ``n_rows``, ``min_<c>`` / ``max_<c>``
    per requested column.  Column pruning applies — only ``cols`` are
    read, so collection cost is a narrow scan of the stats columns.
    """
    df = spark.read.parquet(path)
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs.append(F.min(c).alias(f"min_{c}"))
        aggs.append(F.max(c).alias(f"max_{c}"))
    return (
        df.select(F.input_file_name().alias("file"), *cols)
        .groupBy("file")
        .agg(*aggs)
    )


def prune_files(stats: DataFrame, col: str, lo, hi) -> list[str]:
    """Files whose [min, max] envelope intersects [lo, hi] — the files a
    ``col BETWEEN lo AND hi`` query must read.  Envelope logic is
    conservative: a file overlapping the range boundary is kept."""
    kept = stats.filter(
        (F.col(f"max_{col}") >= F.lit(lo)) & (F.col(f"min_{col}") <= F.lit(hi))
    )
    return [r["file"] for r in kept.select("file").collect()]


def read_pruned(
    spark: SparkSession, stats: DataFrame, col: str, lo, hi
) -> DataFrame:
    """Read only the files the manifest says can contain
    ``col BETWEEN lo AND hi``; the residual filter still applies (zone
    maps bound, they don't guarantee).  An empty prune result returns an
    empty DataFrame with the right schema via an always-false filter on
    one file (schema source only — no data is read past the footer)."""
    files = prune_files(stats, col, lo, hi)
    pred = (F.col(col) >= F.lit(lo)) & (F.col(col) <= F.lit(hi))
    if not files:
        any_file = [r["file"] for r in stats.select("file").limit(1).collect()]
        if not any_file:
            # a zero-row manifest has no file to borrow a schema from;
            # spark.read.parquet() with no paths raises an opaque
            # analysis error — fail with the actual cause instead
            raise ValueError(
                "read_pruned: manifest has no files — collect_file_stats "
                "over the table (or its first load) must run before "
                "pruned reads"
            )
        return spark.read.parquet(*any_file).filter(F.lit(False))
    return spark.read.parquet(*files).filter(pred)
