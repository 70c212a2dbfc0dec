"""CDC changelog apply: fold an I/U/D change stream onto a snapshot.

Generalizes the reference's MERGE (SQLproject1.sql:390-548 — re-expressed
for SCD2 in ``operators/scd2.py``) to the shape a lakehouse actually
replays: a changelog of ``(key, seq, op, payload…)`` rows where ``op`` ∈
{I, U, D} and ``seq`` orders changes per key. The result is the snapshot
with the LATEST surviving change applied — inserts added, updates
replacing, deletes removing — i.e. Debezium/Delta-CDF "apply changes"
semantics as one deterministic batch operator.

Plan shape: one window (latest change per key — partition by key, the
same rewrite W1 uses), then a full-outer join snapshot⋈latest on the key
and a projection choosing sides. ONE shuffle each side on the key;
bucketing both on the key (sinks.save_bucketed) deletes even that. No
iteration, no driver state; at 100 TB the changelog is typically ≪ the
snapshot, and AQE turns the join's changelog side into a broadcast.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def latest_change_per_key(
    changes: DataFrame,
    key: str,
    seq_cols: Sequence[str],
) -> DataFrame:
    """W1-shape: the single winning change row per key — highest
    ``seq_cols`` (a total order per key; pass tie-breakers explicitly,
    nondeterminism here would corrupt the table)."""
    w = Window.partitionBy(key).orderBy(*[F.desc(c) for c in seq_cols])
    return (
        changes.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def apply_changelog(
    snapshot: DataFrame,
    changes: DataFrame,
    key: str,
    seq_cols: Sequence[str],
    op_col: str = "op",
) -> DataFrame:
    """Apply the changelog to the snapshot.

    * key only in snapshot → kept as-is;
    * latest op D → row removed (even if the key was also inserted
      earlier in the stream — the LAST change wins);
    * latest op I/U → the change's payload replaces (or adds) the row.

    Payload columns are the snapshot columns minus the key; the
    changelog must carry the same names (extra bookkeeping columns are
    ignored). Returns exactly the snapshot schema.
    """
    payload = [c for c in snapshot.columns if c != key]
    latest = latest_change_per_key(changes, key, seq_cols)
    ch = latest.select(
        F.col(key).alias("__k"),
        F.col(op_col).alias("__op"),
        *[F.col(c).alias(f"__c_{c}") for c in payload],
    )
    joined = snapshot.join(ch, snapshot[key] == ch["__k"], "full_outer")
    surviving = joined.filter(
        F.col("__op").isNull() | (F.col("__op") != F.lit("D"))
    )
    pick = F.col("__op").isNotNull()
    return surviving.select(
        F.coalesce(F.col(key), F.col("__k")).alias(key),
        *[
            F.when(pick, F.col(f"__c_{c}")).otherwise(F.col(c)).alias(c)
            for c in payload
        ],
    )


def scd2_history(
    changes: DataFrame,
    key: str,
    seq_col: str,
    op_col: str = "op",
) -> DataFrame:
    """Full SCD2 HISTORY from a changelog (round 5): where
    :func:`apply_changelog` answers "what is the table NOW", this
    answers "what was true WHEN" — every change becomes a version row
    with a half-open validity interval over the sequence domain.

    Adds ``valid_from_seq`` (= the row's seq), ``valid_to_seq`` (the
    NEXT change's seq for the key; NULL = still open) and
    ``is_current`` (open interval and not a delete — a delete's
    version records the tombstone but is never current).

    Plan shape: ONE window per key (lead over the per-key seq order) —
    the same partition-by-key shuffle apply_changelog's latest-change
    step uses; no join at all. At 100 TB the changelog shuffles once
    on the key and every version row is emitted map-side after the
    sort."""
    w = Window.partitionBy(key).orderBy(seq_col)
    return (
        changes.withColumn("valid_from_seq", F.col(seq_col))
        .withColumn("valid_to_seq", F.lead(seq_col).over(w))
        .withColumn(
            "is_current",
            F.col("valid_to_seq").isNull()
            & (F.col(op_col) != F.lit("D")),
        )
    )
