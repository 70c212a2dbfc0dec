"""Skew mitigation (SURVEY.md §4 / the 100 TB checklist).

AQE's skew-join splitting handles most cases at runtime
(``spark.sql.adaptive.skewJoin.enabled``, on in session.py); these
operators cover the two shapes AQE does not:

* ``salted_agg`` — a hot GROUP BY key overwhelming one reducer: two-phase
  aggregation through a random salt. Correct for any algebraic aggregate
  expressed as (partial, merge) pairs.
* ``salted_join`` — a hot join key on the BIG side against a small-ish
  right side that is too large to broadcast outright: explode the right
  side ×`salt` and salt the left randomly, so the hot key's rows spread
  over `salt` reducers.

Salting uses ``rand(seed)`` — deterministic per seed+partition layout, but
the OUTPUT of these operators is layout-independent (the salt is removed
by the final merge / join equality).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    partial_aggs: dict[str, Column],
    merge_aggs: dict[str, Column],
    salt: int = 32,
    seed: int = 42,
) -> DataFrame:
    """Two-phase skew-safe aggregation:
    phase 1 groups by (keys + salt) with `partial_aggs`,
    phase 2 groups by keys with `merge_aggs` over the partial columns.

    Example (count + sum):
        salted_agg(df, ["k"],
                   {"c": F.count("*"), "s": F.sum("x")},
                   {"c": F.sum("c"),   "s": F.sum("s")})
    """
    salted = df.withColumn("__salt", (F.rand(seed) * salt).cast("int"))
    partial = salted.groupBy(*keys, "__salt").agg(
        *[c.alias(name) for name, c in partial_aggs.items()]
    )
    return partial.groupBy(*keys).agg(
        *[c.alias(name) for name, c in merge_aggs.items()]
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    salt: int = 8,
    seed: int = 42,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: left rows get a random salt in [0, salt);
    right rows are replicated once per salt value; the join adds the salt
    to the key so one hot key spreads across `salt` reducers. Memory cost:
    right side ×`salt` — use only when right is small-ish but above the
    broadcast threshold.

    Only inner/left-flavored joins are valid: a right/full outer would
    emit one null-extended row PER UNMATCHED REPLICA of the right side."""
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi",
               "leftsemi", "left_anti", "leftanti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join supports {sorted(allowed)}; got how={how!r} — "
            "right/full outer joins would duplicate unmatched right rows "
            "once per salt replica"
        )
    l = left.withColumn("__salt", (F.rand(seed) * salt).cast("int"))
    r = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = l.join(r, [*keys, "__salt"], how)
    return out.drop("__salt")
