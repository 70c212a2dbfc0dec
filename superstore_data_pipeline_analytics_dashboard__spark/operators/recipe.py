"""Training-mix recipe operators: temperature weighting, epoch planning,
and the SHARDED hash-order quota fill.

The reference pipeline (SQLproject1.sql) stops at analytics; these are
the large-scale training-data extensions the catalog's q103/q123/q124/
q134/q139 family exposes.  Factored here (round 5) so the flagship
recipe (q134) composes the SAME functions its component queries run —
a stage-semantics fix can no longer drift the composition (VERDICT r4
item 3).

Scale design — the sharded running sum (VERDICT r4 item 2):

``Window.partitionBy("source").orderBy(h, doc_id)`` puts an ENTIRE
source into one task; at 100 TB a big source is a straggler/OOM.  But
the fill order is an md5 HEX string, so a hex PREFIX of the order key
is a valid range-shard: rows in shard ``s`` (first nibble(s) of ``h``)
all sort before rows in shard ``s+1``.  That turns the global per-source
cumsum into the classic two-phase distributed prefix sum:

1. shard-local cumulative sums — ``16**prefix_len`` independent window
   partitions per source, each a single sequential pass;
2. per-(source, shard) totals — a tiny aggregate (|sources| x shards
   rows) whose EXCLUSIVE prefix sum over shard order gives each shard
   its starting offset, broadcast back onto the local sums.

The result is BIT-IDENTICAL to the single-partition window (same order,
same sums — integer addition is associative), so oracles written
against the naive form stay valid, while the longest task shrinks from
|source| to |source|/shards.  This is exactly what Spark's global sort
does internally (range exchange); here it is explicit because the
windowed cumsum would otherwise hash-partition on the GROUP key only.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "two_phase_running_sum",
    "sharded_running_sum",
    "hash_order_cumsum",
    "with_temperature_weights",
    "plan_epochs",
    "waterfill_budget",
    "integer_apportion",
]


def two_phase_running_sum(
    df: DataFrame,
    group_cols: Sequence[str],
    shard: Column,
    order: Sequence[Column],
    value_col: str,
    out_col: str = "cum",
) -> DataFrame:
    """The two-phase core. CONTRACT: ``shard`` must be a PREFIX of the
    total order — for rows a, b in the same group, a before b in
    ``order`` implies shard(a) <= shard(b) (a hex prefix of a hash
    order key, a value-range bucket of a sort column, ...).  Under
    that contract the result is bit-identical to the naive
    ``Window.partitionBy(group_cols).orderBy(order)`` running sum.
    ``group_cols`` may be empty: a GLOBAL ordered running sum with no
    single-partition window anywhere — the explicit form of the range
    exchange Spark's own global sort uses."""
    staged = df.withColumn("__shard", shard)
    w_local = (
        Window.partitionBy(*group_cols, "__shard")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = staged.withColumn("__local_cum", F.sum(value_col).over(w_local))
    # phase 2: tiny (|groups| x shards) totals table; exclusive prefix
    # over shard order gives each shard its starting offset
    totals = staged.groupBy(*group_cols, "__shard").agg(
        F.sum(value_col).alias("__shard_tot")
    )
    w_off = (
        Window.partitionBy(*group_cols)
        .orderBy("__shard")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        *group_cols,
        "__shard",
        F.coalesce(F.sum("__shard_tot").over(w_off), F.lit(0)).alias("__off"),
    )
    joined = local.join(
        F.broadcast(offsets), [*group_cols, "__shard"], "left"
    )
    return joined.withColumn(
        out_col, F.col("__local_cum") + F.coalesce(F.col("__off"), F.lit(0))
    ).drop("__shard", "__local_cum", "__off")


def sharded_running_sum(
    df: DataFrame,
    group_cols: Sequence[str],
    hex_order_col: str,
    tiebreak_cols: Sequence[str],
    value_col: str,
    out_col: str = "cum",
    prefix_len: int = 1,
) -> DataFrame:
    """Running SUM of ``value_col`` over ``ORDER BY (hex_order_col,
    *tiebreak_cols)`` within each ``group_cols`` group, computed as a
    two-phase prefix sum sharded on the first ``prefix_len`` hex chars
    of ``hex_order_col`` (16**prefix_len shards per group).

    Equivalent to the single-partition-per-group window (pinned by
    test); the plan shows the big Exchange hash-partitioned on
    (group_cols..., shard) — parallelism |groups| x shards instead of
    |groups|.  ``hex_order_col`` must be a lowercase hex string (the
    md5 fill-order convention); the shard is a prefix of the sort key,
    which is what makes shard order == global order.
    """
    if prefix_len < 1 or prefix_len > 8:
        raise ValueError(f"prefix_len must be in [1, 8], got {prefix_len}")
    shard = F.conv(
        F.substring(F.col(hex_order_col), 1, prefix_len), 16, 10
    ).cast("int")
    order = [F.col(hex_order_col), *[F.col(c) for c in tiebreak_cols]]
    return two_phase_running_sum(
        df, group_cols, shard, order, value_col, out_col
    )


def hash_order_cumsum(
    staged: DataFrame,
    group_cols: Sequence[str] = ("source",),
    id_col: str = "doc_id",
    value_col: str = "n_tok",
    hash_col: str = "h",
    out_col: str = "cum_tok",
    prefix_len: int = 1,
) -> DataFrame:
    """The quota-fill walk: deterministic md5-hash order (an unbiased,
    reproducible shuffle — no RNG, no seed drift between engines) with
    a running token total, sharded per :func:`sharded_running_sum`.
    Adds ``hash_col`` (md5 of the id's string form) if absent."""
    if hash_col not in staged.columns:
        staged = staged.withColumn(
            hash_col, F.md5(F.col(id_col).cast("string"))
        )
    return sharded_running_sum(
        staged,
        group_cols=group_cols,
        hex_order_col=hash_col,
        tiebreak_cols=[id_col],
        value_col=value_col,
        out_col=out_col,
        prefix_len=prefix_len,
    )


def with_temperature_weights(per: DataFrame, avail_col: str) -> DataFrame:
    """Temperature-0.5 source weighting (the multilingual-sampling
    convention): adds ``share`` (double), ``temp_w`` = sqrt(share) as
    DECIMAL(18,9), and the normalizer ``z`` = sum(temp_w) as
    DECIMAL(28,9) broadcast onto every row.  The sqrt-then-decimal
    trick keeps the only engine-sensitive step (sqrt) IEEE-portable
    and the normalizer an EXACT decimal sum — q103's boundary
    discipline, shared verbatim by q124/q134/q139."""
    tot = per.agg(F.sum(avail_col).alias("__tot"))
    shared = per.crossJoin(F.broadcast(tot)).withColumn(
        "share",
        F.col(avail_col).cast("double") / F.col("__tot").cast("double"),
    )
    weighted = shared.withColumn(
        "temp_w", F.sqrt("share").cast("decimal(18,9)")
    ).drop("__tot")
    norm = weighted.agg(
        F.sum(F.col("temp_w").cast("decimal(28,9)")).alias("z")
    )
    return weighted.crossJoin(F.broadcast(norm))


def plan_epochs(
    per: DataFrame, avail_col: str, budget: int, cap: float = 4.0
) -> DataFrame:
    """Per-source repeat factors from temperature shares: ideal tokens
    = budget * temp_share, epochs = min(ideal / avail, cap) (the
    "don't repeat a small source forever" rule).  Adds
    ``ideal_tokens`` / ``epochs`` columns; callers derive
    planned_tokens (q124) or full_copies + fractional sample (q139)."""
    weighted = with_temperature_weights(per, avail_col)
    ideal = F.lit(float(budget)) * (
        F.col("temp_w").cast("double") / F.col("z").cast("double")
    )
    epochs = F.least(
        ideal / F.col(avail_col).cast("double"), F.lit(float(cap))
    )
    return weighted.withColumn("ideal_tokens", ideal).withColumn(
        "epochs", epochs
    )


def waterfill_budget(
    per: DataFrame,
    avail_col: str,
    budget: int,
    cap: int = 2,
    key_cols: Sequence[str] = ("source",),
) -> DataFrame:
    """Capacity-aware temperature mixing — the redistribution step
    :func:`plan_epochs` stops short of.  ``plan_epochs`` caps a small
    source at ``cap`` epochs and silently DROPS the budget it can no
    longer absorb; real mixing pipelines re-normalize, letting the
    excess flow to the uncapped sources (which may then cap too, and
    so on to a fixpoint).  This is the classic water-filling problem —
    find the level ``lam`` such that ``alloc_i = min(capacity_i,
    lam * w_i)`` and ``sum(alloc) = min(budget, sum(capacity))`` —
    and it has a CLOSED FORM, no iteration: sorted by the cap ratio
    ``r_i = capacity_i / w_i`` ascending, the capped set is a prefix,
    and row ``i`` is capped iff the level implied by capping exactly
    the rows before it still exceeds its own ratio::

        (budget - cum_capacity_before_i) / (Z - cum_w_before_i) > r_i

    (Removing a below-level element raises the pool's implied level,
    an above-level one lowers it, so the scan's per-row verdict equals
    the fixpoint's — pinned against an iterative reference in
    tests/test_recipe.py.)

    Boundary discipline (the q103 pattern): weights come from
    :func:`with_temperature_weights` (sqrt is IEEE-portable, the
    normalizer an exact decimal); every cumulative quantity in the
    scan is an EXACT integer/decimal sum; doubles appear only as
    correctly-rounded casts, divisions and products of those exact
    operands, so a DuckDB oracle running the same scan reproduces the
    allocation bit-for-bit.

    Scale shape: ``per`` is per-SOURCE grain (one row per corpus
    source/band — dozens, never documents), so the order-only window
    is the documented bounded-grain ``Exchange SinglePartition`` and
    every aggregate is summary-sized.  Rows with ``avail_col <= 0``
    carry zero weight and zero capacity and are dropped (documented:
    they could only ever allocate zero).

    Returns one row per surviving input row: ``key_cols...``,
    ``avail_col``, ``share`` / ``temp_w`` / ``z`` (from
    :func:`with_temperature_weights`), ``capacity`` (BIGINT,
    ``avail * cap``), ``cap_ratio`` (DOUBLE), ``capped`` (BOOLEAN),
    ``water_level`` (DOUBLE, the final ``lam`` — identical on every
    row), ``alloc_tokens`` (DOUBLE, ``capacity`` when capped else
    ``lam * temp_w``)."""
    if budget < 0:
        raise ValueError(f"budget must be non-negative, got {budget}")
    if cap <= 0:
        raise ValueError(f"cap must be a positive epoch count, got {cap}")
    weighted = with_temperature_weights(
        per.filter(F.col(avail_col) > 0), avail_col
    )
    staged = weighted.withColumn(
        "capacity",
        (F.col(avail_col).cast("bigint") * F.lit(int(cap))).cast("bigint"),
    ).withColumn(
        "cap_ratio",
        F.col("capacity").cast("double") / F.col("temp_w").cast("double"),
    )
    # the threshold scan: EXCLUSIVE running sums over the ratio order
    # (total order: ratio, then key_cols) — #sources rows, bounded grain
    w_scan = Window.orderBy("cap_ratio", *key_cols).rowsBetween(
        Window.unboundedPreceding, -1
    )
    scanned = staged.select(
        "*",
        F.coalesce(F.sum("capacity").over(w_scan), F.lit(0))
        .cast("bigint")
        .alias("__cum_c"),
        F.coalesce(
            F.sum(F.col("temp_w").cast("decimal(28,9)")).over(w_scan),
            F.lit(0).cast("decimal(28,9)"),
        ).alias("__cum_w"),
    )
    flagged = scanned.withColumn(
        "capped",
        (
            (F.lit(budget) - F.col("__cum_c")).cast("double")
            / (F.col("z") - F.col("__cum_w")).cast("double")
        )
        > F.col("cap_ratio"),
    )
    tots = flagged.agg(
        F.coalesce(F.sum(F.when(F.col("capped"), F.col("capacity"))), F.lit(0))
        .cast("bigint")
        .alias("__c_cap"),
        F.coalesce(
            F.sum(
                F.when(~F.col("capped"), F.col("temp_w").cast("decimal(28,9)"))
            ),
            F.lit(0).cast("decimal(28,9)"),
        ).alias("__w_unc"),
    )
    return (
        flagged.crossJoin(F.broadcast(tots))
        .withColumn(
            "water_level",
            F.when(
                F.col("__w_unc") > 0,
                (F.lit(budget) - F.col("__c_cap")).cast("double")
                / F.col("__w_unc").cast("double"),
            ).otherwise(F.lit(0.0)),
        )
        .withColumn(
            "alloc_tokens",
            F.when(F.col("capped"), F.col("capacity").cast("double")).otherwise(
                F.col("water_level") * F.col("temp_w").cast("double")
            ),
        )
        .drop("__cum_c", "__cum_w", "__c_cap", "__w_unc")
    )




def integer_apportion(
    per: DataFrame,
    weight_col: str,
    total: int,
    key_cols: Sequence[str] = ("source",),
) -> DataFrame:
    """Hamilton (largest-remainder) apportionment: split an integer
    ``total`` across rows proportionally to ``weight_col`` so the
    parts are INTEGERS that sum to EXACTLY ``total`` — the
    schedule-building step after mixing (a sampling plan needs "how
    many sequences from each source", not 8883.91 tokens).  Each row
    gets ``floor(total * w / W)``; the ``total - sum(floors)``
    leftover units go one each to the largest fractional parts
    (ties broken by ``key_cols`` — a total order, so the result is
    deterministic and engine-portable).

    ``weight_col`` must be DECIMAL or integral.  DOUBLE weights are
    REFUSED: their normalizer would be a sum of doubles, which is
    order-dependent under parallel aggregation — nondeterministic on
    one engine, unreproducible across two.  (Exact-typed weights make
    ``W`` an exact sum; the per-row quota is then a product and a
    division of identical exact operands, floor/fraction of a
    correctly-rounded double is bit-portable, and the remainder rank
    is a total order — the same boundary discipline as
    :func:`waterfill_budget`.)

    Zero-weight rows allocate zero and take no part in the remainder
    lottery (their quota is exactly 0.0; they stay in the output).
    Scale shape: per-source grain, bounded-grain windows only.

    Returns the input columns plus ``quota`` (DOUBLE, the real-valued
    entitlement), ``base`` (BIGINT floor), ``extra`` (0/1 leftover
    unit) and ``alloc`` (BIGINT, ``base + extra``; ``sum(alloc) ==
    total`` whenever ``total >= 0`` and the weights are not all
    zero)."""
    from pyspark.sql.types import DecimalType, IntegralType

    if total < 0:
        raise ValueError(f"total must be non-negative, got {total}")
    wtype = per.schema[weight_col].dataType
    # isinstance, not a simpleString prefix: "interval day to second"
    # startswith "int" and would slip a non-numeric column past the
    # named refusal into a raw downstream AnalysisException (review r13)
    if not isinstance(wtype, (DecimalType, IntegralType)):
        raise TypeError(
            f"integer_apportion needs an exact-typed weight column "
            f"(DECIMAL or integer); {weight_col!r} is "
            f"{wtype.simpleString()}. A double weight would make the "
            "normalizer an order-dependent parallel sum — cast to "
            "DECIMAL at a chosen scale first."
        )
    w_exact = F.col(weight_col).cast("decimal(38,9)")
    norm = per.agg(
        F.sum(w_exact).alias("__W"), F.min(w_exact).alias("__w_min")
    )
    # all-zero weights would hit ANSI DIVIDE_BY_ZERO with Spark's
    # generic message, and a NEGATIVE weight silently breaks the
    # sum(alloc) == total contract (its floor can undershoot by more
    # than the remainder lottery can repay — review r13); assert_true
    # turns both into NAMED refusals at zero extra job cost
    # (nvl2(assert, ...) evaluates the assert per-row inside the same
    # projection: NULL when passing, throw when not — the column
    # itself is never materialized)
    quota = F.nvl2(
        F.assert_true(
            (F.col("__W") > 0) & (F.col("__w_min") >= 0),
            F.lit(
                "integer_apportion: weights must be non-negative and "
                "must not all be zero — a negative weight breaks the "
                "exact-sum guarantee and an all-zero set has no "
                "proportion to apportion by"
            ),
        ),
        F.lit(None).cast("double"),
        F.lit(int(total)).cast("double")
        * F.col(weight_col).cast("double")
        / F.col("__W").cast("double"),
    )
    based = (
        per.crossJoin(F.broadcast(norm))
        .withColumn("quota", quota)
        .withColumn("base", F.floor("quota").cast("bigint"))
        .withColumn("__frac", F.col("quota") - F.col("base").cast("double"))
    )
    leftover = based.agg(
        (F.lit(int(total)) - F.coalesce(F.sum("base"), F.lit(0)))
        .cast("bigint")
        .alias("__rem")
    )
    w_rank = Window.orderBy(F.col("__frac").desc(), *key_cols)
    return (
        based.crossJoin(F.broadcast(leftover))
        .withColumn("__rk", F.row_number().over(w_rank))
        .withColumn(
            "extra",
            (
                (F.col("__rk") <= F.col("__rem"))
                & (F.col(weight_col).cast("decimal(38,9)") > 0)
            ).cast("bigint"),
        )
        .withColumn("alloc", F.col("base") + F.col("extra"))
        .drop("__W", "__frac", "__rem", "__rk")
    )
