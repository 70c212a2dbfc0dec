"""Grouped top-k — exact tier, one-pass mergeable-sketch tier, and a
sketch-candidates + exact-recount verified tier.

"Top k keys per group" (top products per region, top n-grams per
source, top referrers per day) is exact only via a full
``groupBy(group, key)`` — a shuffle of the ENTIRE distinct
(group, key) space, which at 100 TB is often the single largest
shuffle in a report. The sketch tier bounds that: Spark 4.1's
``approx_top_k`` family (Apache DataSketches frequent-items /
Misra-Gries under the hood) keeps one bounded sketch per group,
partially aggregated map-side, so the shuffle carries one
``maxItemsTracked``-bounded state row per group per map partition —
independent of the distinct-key volume. The classic sketch guarantee
applies: any key with true frequency > N_group/maxItemsTracked is
guaranteed tracked, and estimates are within that same bound —
TWO-sided: measured under truncation, Spark's estimate OVER-counts
(the DataSketches frequent-items estimate carries the error offset),
so don't treat it as a lower bound (pinned in tests/test_topk.py).

Tier positioning mirrors the dedup stack (exact tier = verification,
sketch tier = scale): :func:`grouped_topk_exact` is the oracle twin;
:func:`grouped_topk_approx` is the one-pass estimate;
:func:`grouped_topk_verified` uses the sketch ONLY to nominate
candidates, then recounts exactly — the recount's aggregation state is
bounded by the candidate list (groups × candidate_factor·k keys), so
the full key space is still never shuffled, yet reported counts are
exact and the result is deterministic wherever the sketch guarantee
covers the true top-k (pinned under repartitioning in
tests/test_topk.py).

Mergeable state across loads (:func:`topk_state` /
:func:`topk_from_states`): the q128/q138 day-sketch pattern for heavy
hitters. Each ingest window aggregates one ``approx_top_k_accumulate``
state row per (group, window) — a binary DataSketches blob that
SURVIVES A PARQUET ROUND-TRIP (tested) — and any coarser rollup
(week over days, global over sources) is ``approx_top_k_combine`` over
the state rows alone, never a re-scan of raw data. That is the
incremental-maintenance face: per-batch cost ∝ batch, rollup cost ∝
state rows.

Determinism boundary, stated honestly: sketch-tier ESTIMATES are exact
while a group's distinct keys fit ``maxItemsTracked`` (no truncation
ever happens — the CMS/theta "exact mode" contract, value-checkable in
tests) but under truncation the surviving counter values depend on
merge order, so the approx tier is rows-only territory for the oracle
gate; the verified tier's exact recount is what faces the hash gate.
Output rows in every tier carry a total-order rank
(count DESC, key ASC — row_number, no rank ties) so top-k cuts are
reproducible.

NULL keys are excluded from EVERY tier. Spark's ``approx_top_k`` does
track NULL as an item, but before this was made uniform the verified
tier's recount join dropped NULL-key rows while the approx tier ranked
them — tiers silently disagreed exactly when a group's modal key was
NULL (pinned in tests/test_topk.py). A NULL "key" is an absence
marker, its count is a one-line conditional aggregate if wanted, and
cross-engine oracles disagree on NULL grouping/ordering — so the
uniform contract is: ranks cover non-null keys only.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = [
    "grouped_topk_exact",
    "grouped_topk_approx",
    "grouped_topk_verified",
    "topk_state",
    "topk_from_states",
]


def _ranked(counted: DataFrame, group_cols: Sequence[str], k: int) -> DataFrame:
    """(group..., key, cnt) → top-k per group under the TOTAL order
    (cnt DESC, key ASC); row_number so boundary ties cut reproducibly."""
    w = Window.partitionBy(*group_cols).orderBy(
        F.col("cnt").desc(), F.col("key").asc()
    )
    return (
        counted.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(*group_cols, "key", "cnt", "rank")
    )


def grouped_topk_exact(
    df: DataFrame, group_cols: Sequence[str], key_col: str, k: int
) -> DataFrame:
    """Exact top-k keys per group: (group..., key, cnt, rank).

    The verification tier / oracle twin — one full
    ``groupBy(group, key)`` (shuffle ∝ distinct pairs) plus a
    group-partitioned rank window. Correct at any scale, expensive at
    100 TB key cardinalities; position it on bounded key spaces or
    behind :func:`grouped_topk_verified`'s candidate prefilter."""
    counted = (
        df.select(*group_cols, F.col(key_col).alias("key"))
        .filter(F.col("key").isNotNull())  # module docstring: NULL policy
        .groupBy(*group_cols, "key")
        .agg(F.count("*").alias("cnt"))
    )
    return _ranked(counted, group_cols, k)


def _estimate_rows(
    sketched: DataFrame,
    group_cols: Sequence[str],
    k: int,
    est_col: str,
    fetch_n: int,
    max_items_tracked: int,
) -> DataFrame:
    """Explode a fetched estimate array, rank under the total order, cut
    at k — and DETECT the regimes where that cut is not reproducible.
    If the sketch returned exactly ``fetch_n`` items (the fetch was
    TRUNCATED: unfetched tracked items with count ≤ the raw boundary
    count may exist) while more items were tracked
    (``fetch_n < max_items_tracked``), the cut is untrustworthy when
    either (a) a SURVIVING row ties the raw fetch-boundary count — an
    unfetched equal-count key could deserve its place under the (cnt
    DESC, key ASC) total order, so the result depends on
    sketch-internal tie order — or (b) fewer than ``k`` NON-NULL rows
    survive the fetch at all: the sketch tracks NULL as an item, so a
    fetched NULL can consume a truncated-fetch slot that an unfetched
    real key deserved, silently under-filling the top-k (the raw
    ``_nf``/``_min_cnt`` are deliberately computed BEFORE the NULL drop
    — the truncation bound applies to everything the sketch returned,
    NULL included). Rather than let either reach the hash gate as a
    silent value drift, the guard raises at execution time with the fix
    (a larger fetch_factor). It is fused into the output ``key`` column
    so column pruning can never drop it; cost is one array_min + two
    array size/filter expressions per group row — no window, no extra
    shuffle.

    Known conservative false positive (exact-fit): ``_nf >= fetch_n``
    is the truncation signal, and the sketch output does not say
    whether a full-length return was truncated or the group tracked
    EXACTLY ``fetch_n`` distinct items (a complete fetch whose cut
    would be deterministic). A boundary count tie in that exact-fit
    group therefore raises even though no unfetched key can exist.
    This is deliberate fail-loud bias: the two cases are
    indistinguishable from the fetched array alone, a spurious raise
    costs one re-run with a larger ``fetch_factor`` (which then fetches
    the whole group and disarms the guard), while the alternative — a
    side-channel distinct-count to disambiguate — would itself be
    approximate (``approx_count_distinct``) and turn a hard guarantee
    into a probabilistic one. Documented per ADVICE r9."""
    boundary = (
        [
            F.size(F.col(est_col)).alias("_nf"),
            F.array_min(
                F.expr(f"transform({est_col}, x -> x.count)")
            ).alias("_min_cnt"),
            # non-null survivors per group, for failure mode (b) —
            # computed on the ARRAY before explode (one size(filter())
            # per group row; a count-over-window here measured ~0.3-0.7s
            # of avoidable extra window pass at sf0.1)
            F.size(
                F.expr(f"filter({est_col}, x -> x.item is not null)")
            ).alias("_n_nonnull"),
        ]
        if fetch_n < int(max_items_tracked)
        else []
    )
    bcols = ["_nf", "_min_cnt", "_n_nonnull"] if boundary else []
    exploded = (
        sketched.select(*group_cols, *boundary, F.explode(est_col).alias("e"))
        .select(
            *group_cols,
            *bcols,
            F.col("e.item").alias("key"),
            F.col("e.count").alias("cnt"),
        )
        # the sketch DOES track NULL — drop it here for the uniform
        # non-null contract (module docstring)
        .filter(F.col("key").isNotNull())
    )
    w = Window.partitionBy(*group_cols).orderBy(
        F.col("cnt").desc(), F.col("key").asc()
    )
    kept = exploded.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )
    if not boundary:
        # fetch_n == capacity: a full fetch can never truncate a tie
        # run (nothing tracked was left behind), so no guard is needed
        # — and "re-fetch more" would be impossible advice anyway
        return kept.select(*group_cols, "key", "cnt", "rank")
    # _nf >= fetch_n cannot distinguish a truncated fetch from a group
    # that tracked exactly fetch_n items — the exact-fit case raises
    # spuriously on a boundary tie (see docstring: deliberate
    # fail-loud bias, disarmed by a larger fetch_factor)
    overflow = (F.col("_nf") >= F.lit(fetch_n)) & (
        (F.col("cnt") == F.col("_min_cnt"))
        | (F.col("_n_nonnull") < F.lit(k))
    )
    guarded_key = (
        F.when(~overflow, F.col("key"))
        .otherwise(
            F.raise_error(
                F.lit(
                    "approx_top_k fetch-boundary hazard: the fetch was "
                    f"truncated (fetched {fetch_n} of up to "
                    f"{max_items_tracked} tracked items) and either a "
                    f"surviving top-{k} row ties the raw boundary count "
                    "(result would depend on sketch-internal tie order) "
                    f"or fewer than {k} non-null keys were fetched (a "
                    "fetched NULL consumed a slot a real key deserved); "
                    "re-run with a larger fetch_factor (or use the "
                    "exact tier)"
                )
            )
        )
        .alias("key")
    )
    return kept.select(*group_cols, guarded_key, "cnt", "rank")


def _fetch_n(k: int, max_items_tracked: int, fetch_factor: int) -> int:
    """How many items to pull out of a sketch before re-ranking: the
    sketch truncates to its OWN (arbitrary) order among count ties, so
    cutting at exactly k would let sketch internals pick which of the
    boundary-tied keys survive. Over-fetching ``fetch_factor·k`` (capped
    at capacity — a sketch cannot return more than it tracks) and then
    cutting under the (cnt DESC, key ASC) total order makes the result
    reproducible unless a boundary tie RUN exceeds the slack — and at
    that point the contenders are exactly tied, with the exact/verified
    tiers as the fully deterministic faces."""
    return min(int(max_items_tracked), max(int(k), int(fetch_factor) * int(k)))


def grouped_topk_approx(
    df: DataFrame,
    group_cols: Sequence[str],
    key_col: str,
    k: int,
    max_items_tracked: int = 10000,
    fetch_factor: int = 4,
) -> DataFrame:
    """One-pass sketch top-k per group: (group..., key, cnt, rank) with
    ESTIMATED counts.

    One aggregation: per-group ``approx_top_k`` sketches build and
    combine map-side, so the shuffle is one bounded state row per group
    per map partition — the distinct-key space never moves. Estimates
    are exact while each group's distinct keys fit
    ``max_items_tracked``; beyond that they carry the N/maxTracked
    frequency error and the result is an estimate, not an oracle-able
    value (module docstring). Extraction over-fetches ``fetch_factor·k``
    before the total-order cut (:func:`_fetch_n` — boundary-tie
    determinism)."""
    fetch_n = _fetch_n(k, max_items_tracked, fetch_factor)
    sk = df.groupBy(*group_cols).agg(
        F.expr(
            f"approx_top_k(`{key_col}`, {fetch_n}, "
            f"{int(max_items_tracked)})"
        ).alias("est")
    )
    return _estimate_rows(sk, group_cols, k, "est", fetch_n, max_items_tracked)


def grouped_topk_verified(
    df: DataFrame,
    group_cols: Sequence[str],
    key_col: str,
    k: int,
    max_items_tracked: int = 10000,
    candidate_factor: int = 4,
) -> DataFrame:
    """Sketch-nominated candidates, EXACT recount, top-k per group.

    Two bounded passes instead of one unbounded one:

    1. candidate nomination — :func:`grouped_topk_approx` over-fetched
       to ``candidate_factor·k`` per group (slack absorbs estimate
       error reordering near the boundary);
    2. exact recount — inner-join the corpus to the candidate list
       (groups × candidate_factor·k rows — broadcast) and re-count
       exactly. The recount's hash-aggregation state is bounded by the
       candidate list, so map-side combine collapses even a
       heavily-skewed corpus to ≤ partitions × candidates shuffle rows.

    Reported counts are exact; the top-k set itself is correct whenever
    every true top-k key is nominated — guaranteed when its group
    frequency exceeds N_group/max_items_tracked (the sketch tracking
    guarantee), and trivially when distinct keys fit the sketch. This
    is the tier that faces the oracle hash gate; the determinism pin
    (same result under repartitioning) lives in tests/test_topk.py."""
    # a sketch cannot return more than it tracks (Spark enforces
    # k ≤ maxItemsTracked) — clamp the over-fetch to capacity
    n_cand = min(candidate_factor * k, max_items_tracked)
    cands = grouped_topk_approx(
        df, group_cols, key_col, n_cand, max_items_tracked
    ).select(*group_cols, "key")
    rows = df.select(*group_cols, F.col(key_col).alias("key")).filter(
        F.col("key").isNotNull()
    )
    recount = (
        rows.join(F.broadcast(cands), [*group_cols, "key"])
        .groupBy(*group_cols, "key")
        .agg(F.count("*").alias("cnt"))
    )
    return _ranked(recount, group_cols, k)


def topk_state(
    df: DataFrame,
    group_cols: Sequence[str],
    key_col: str,
    max_items_tracked: int = 10000,
) -> DataFrame:
    """One mergeable sketch-state row per group: (group..., state).

    The per-ingest-window maintenance half of the q128/q138 day-sketch
    pattern: include the window key (day, batch, source) in
    ``group_cols``, land the result as a parquet state table (the
    binary DataSketches blob round-trips — tested), and roll up with
    :func:`topk_from_states` without ever re-scanning raw data."""
    return df.groupBy(*group_cols).agg(
        F.expr(
            f"approx_top_k_accumulate(`{key_col}`, {int(max_items_tracked)})"
        ).alias("state")
    )


def topk_from_states(
    states: DataFrame,
    group_cols: Sequence[str],
    k: int,
    max_items_tracked: int = 10000,
    fetch_factor: int = 4,
) -> DataFrame:
    """Combine :func:`topk_state` rows down to ``group_cols`` and
    extract top-k: (group..., key, cnt, rank). Cost ∝ state rows, not
    raw data. All combined states must share ``max_items_tracked``
    (Spark enforces sketch compatibility; pass the same value used at
    accumulate time). Extraction over-fetches before the total-order
    cut (:func:`_fetch_n`)."""
    fetch_n = _fetch_n(k, max_items_tracked, fetch_factor)
    combined = states.groupBy(*group_cols).agg(
        F.expr(
            f"approx_top_k_estimate("
            f"approx_top_k_combine(state, {int(max_items_tracked)}), "
            f"{fetch_n})"
        ).alias("est")
    )
    return _estimate_rows(combined, group_cols, k, "est", fetch_n, max_items_tracked)
