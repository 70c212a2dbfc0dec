"""Deterministic sampling / splitting for training-data pipelines.

Random sampling (``df.sample``, ``rand()``) is nondeterministic across
runs, partitionings, and engines — useless for reproducible train/val/test
splits or for an oracle-checked downsample. Everything here buckets rows by
a **content-derived md5 integer** instead: the same row lands in the same
bucket on every run, on any cluster size, and in DuckDB
(``CAST('0x' || substr(md5(x),1,15) AS BIGINT)`` — same construction as
``functions.hashing.md5_prefix_long``).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

from .hashing import md5_prefix_long


def hash_bucket(col: Column | str, n_buckets: int = 100) -> Column:
    """Deterministic bucket in ``[0, n_buckets)`` from the md5 of the
    column's string form. Uniform for any key type; stable across engines."""
    c = F.col(col) if isinstance(col, str) else col
    return (md5_prefix_long(c.cast("string")) % F.lit(n_buckets)).cast("int")


def deterministic_split(
    col: Column | str,
    splits: Sequence[tuple[str, float]] = (("train", 0.9), ("val", 0.05), ("test", 0.05)),
    n_buckets: int = 1000,
) -> Column:
    """Label each row with a split name by hash bucket: cumulative weight
    boundaries over ``n_buckets`` buckets. Weights must sum to 1 (±1e-9).
    A row's split never changes when the corpus grows — the property that
    keeps held-out data held out across pipeline re-runs."""
    total = sum(w for _, w in splits)
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {total}")
    bucket = hash_bucket(col, n_buckets)
    expr = None
    cum = 0.0
    for name, w in splits[:-1]:
        cum += w
        bound = int(round(cum * n_buckets))
        cond = bucket < F.lit(bound)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = splits[-1][0]
    return (F.lit(last) if expr is None else expr.otherwise(F.lit(last))).alias("split")


def deterministic_sample(col: Column | str, fraction: float, n_buckets: int = 100000) -> Column:
    """Boolean keep-mask selecting ~``fraction`` of rows, deterministically
    by content hash — the scale-safe downsample (no coordination, no seed
    plumbing, reproducible row set)."""
    return hash_bucket(col, n_buckets) < F.lit(int(round(fraction * n_buckets)))
