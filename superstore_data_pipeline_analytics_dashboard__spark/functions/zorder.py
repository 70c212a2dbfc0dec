"""Z-order (Morton) keys: multi-column clustering for min-max skipping.

Sorting a table by ``z2(a, b)`` before writing parquet gives row groups
whose min/max ranges are tight in BOTH dimensions at once — the layout
trick behind Delta/Iceberg ``OPTIMIZE ZORDER BY``, re-expressed as a
plain deterministic integer expression + ``sortWithinPartitions``/
``repartitionByRange`` write. A reader filtering on either column (or
both) then prunes most row groups from the footer statistics alone,
where a single-column sort only helps its own column.

The key is pure bit arithmetic (shifts/masks/ors), whole-stage-codegen
JVM-side, and identical in any engine — the catalog query value-checks
it against DuckDB bit ops.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def z2(a: Column | str, b: Column | str, bits: int = 16) -> Column:
    """Morton-interleave the low ``bits`` bits of two non-negative ints:
    bit i of ``a`` lands at position 2i+1, bit i of ``b`` at 2i. Columns
    are masked to ``bits`` first so oversized values wrap instead of
    colliding across dimensions."""
    if not 1 <= bits <= 31:
        raise ValueError(f"bits must be in [1, 31], got {bits}")
    ca = (F.col(a) if isinstance(a, str) else a).cast("bigint").bitwiseAND(
        F.lit((1 << bits) - 1)
    )
    cb = (F.col(b) if isinstance(b, str) else b).cast("bigint").bitwiseAND(
        F.lit((1 << bits) - 1)
    )
    parts = []
    for i in range(bits):
        parts.append(F.shiftleft(F.shiftright(ca, i).bitwiseAND(F.lit(1)), 2 * i + 1))
        parts.append(F.shiftleft(F.shiftright(cb, i).bitwiseAND(F.lit(1)), 2 * i))
    return reduce(lambda x, y: x.bitwiseOR(y), parts).alias("z")


def zorder_write_ready(
    df: DataFrame, a: str, b: str, bits: int = 16, partitions: int | None = None
) -> DataFrame:
    """Range-partition + sort by the z key — the frame to hand straight
    to a parquet writer for a z-clustered layout. Range partitioning
    keeps the z-curve contiguous ACROSS files (global clustering), the
    within-partition sort makes each row group a tight z-interval."""
    keyed = df.withColumn("__z", z2(a, b, bits))
    ranged = (
        keyed.repartitionByRange(partitions, "__z")
        if partitions
        else keyed.repartitionByRange("__z")
    )
    return ranged.sortWithinPartitions("__z").drop("__z")
