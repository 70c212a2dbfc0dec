"""Grouped top-k tiers (round 8): exact, one-pass sketch, verified
(sketch candidates + exact recount), and mergeable state rollup.

Contract mirrors the sketch modules: while a group's distinct keys fit
``max_items_tracked`` the sketch never truncates, so the approx tier is
value-EXACT (checkable against the exact tier); under truncation the
tracking guarantee (every key with freq > N/maxTracked survives) and
the verified tier's exact recount are what get pinned.
"""

import pytest
from pyspark.sql import functions as F

from superstore_data_pipeline_analytics_dashboard__spark.operators import (
    topk as TK,
)


def _rows(df):
    return sorted(map(tuple, df.collect()))


@pytest.fixture(scope="module")
def skewed(spark):
    # key kNN appears NN times per group: unambiguous frequency order
    rows = [
        (g, f"k{i:02d}")
        for g in ("east", "west")
        for i in range(1, 13)
        for _ in range(i)
    ]
    return spark.createDataFrame(rows, "grp STRING, key STRING").persist()


def test_tiers_agree_in_exact_regime(skewed):
    """Distinct keys (12/group) fit the sketch: all three tiers must
    return identical (group, key, cnt, rank) rows — estimated counts
    included, since no truncation ever happened."""
    exact = _rows(TK.grouped_topk_exact(skewed, ["grp"], "key", 4))
    assert len(exact) == 8  # 4 per group
    approx = _rows(TK.grouped_topk_approx(skewed, ["grp"], "key", 4, 100))
    verified = _rows(TK.grouped_topk_verified(skewed, ["grp"], "key", 4, 100))
    assert approx == exact
    assert verified == exact
    # rank is a total order: top key per group is the heaviest
    top = [r for r in exact if r[3] == 1]
    assert {(r[0], r[1]) for r in top} == {("east", "k12"), ("west", "k12")}


def test_null_keys_excluded_from_every_tier(spark):
    """A group whose MODAL key is NULL: the sketch cannot track NULL,
    so the exact tier must exclude it too (module docstring's NULL
    policy) — otherwise exact ranks a key the other tiers can never
    return and the tier-equivalence contract breaks silently."""
    rows = [("g", None)] * 5 + [("g", "a")] * 3 + [("g", "b")] * 2
    df = spark.createDataFrame(rows, "grp STRING, key STRING")
    exact = _rows(TK.grouped_topk_exact(df, ["grp"], "key", 2))
    assert exact == [("g", "a", 3, 1), ("g", "b", 2, 2)]
    assert _rows(TK.grouped_topk_approx(df, ["grp"], "key", 2, 100)) == exact
    assert _rows(TK.grouped_topk_verified(df, ["grp"], "key", 2, 100)) == exact


def test_rank_tie_break_is_key_ascending(spark):
    df = spark.createDataFrame(
        [("g", "b"), ("g", "a"), ("g", "c")], "grp STRING, key STRING"
    )
    out = TK.grouped_topk_exact(df, ["grp"], "key", 2).collect()
    got = {(r["key"], r["rank"]) for r in out}
    assert got == {("a", 1), ("b", 2)}  # all cnt=1 → key ASC decides


def test_verified_deterministic_under_repartitioning(skewed):
    """Sketch-internal state depends on how data meets the sketch; the
    verified tier's exact recount must erase that — identical output at
    1 and 16 partitions."""
    one = _rows(
        TK.grouped_topk_verified(skewed.repartition(1), ["grp"], "key", 3, 64)
    )
    many = _rows(
        TK.grouped_topk_verified(skewed.repartition(16), ["grp"], "key", 3, 64)
    )
    assert one == many == _rows(TK.grouped_topk_exact(skewed, ["grp"], "key", 3))


def test_under_tracked_guarantee_and_verified_recovery(spark):
    """Force truncation: 40 distinct keys, sketch tracks 10. The three
    heavy keys (freq 60 ≫ N/10 = 15.7) must survive nomination, and the
    verified tier must still return the exact top-3 with exact counts."""
    rows = (
        [("g", f"hot{i}") for i in range(3) for _ in range(60)]
        + [("g", f"cold{i:02d}") for i in range(37)]
    )
    df = spark.createDataFrame(rows, "grp STRING, key STRING")
    exact = _rows(TK.grouped_topk_exact(df, ["grp"], "key", 3))
    verified = _rows(
        TK.grouped_topk_verified(df, ["grp"], "key", 3, max_items_tracked=10)
    )
    assert verified == exact
    nominated = {
        r["key"]
        for r in TK.grouped_topk_approx(
            df, ["grp"], "key", 10, max_items_tracked=10
        ).collect()
    }
    assert {"hot0", "hot1", "hot2"} <= nominated


def test_fetch_boundary_tie_run_raises(spark):
    """A count-tie run straddling a TRUNCATED fetch cut means the
    surviving keys depend on sketch-internal tie order — the estimate
    extraction must refuse loudly (raise) rather than hand the hash
    gate a silently non-deterministic result. No raise when the fetch
    was not truncated: at capacity (nothing tracked was left behind)
    or when the sketch returned fewer items than asked."""
    rows = [("g", f"k{i:02d}") for i in range(30)]  # every key cnt=1
    df = spark.createDataFrame(rows, "grp STRING, key STRING")
    # fetch_n = 4 < 30 tracked: the cut is inside an all-tied run
    with pytest.raises(Exception, match="fetch-boundary hazard"):
        TK.grouped_topk_approx(
            df, ["grp"], "key", 2, max_items_tracked=100, fetch_factor=2
        ).collect()
    # NULL-slot hazard (review find): counts a=9,b=8,c=7,NULL=3,d=2 with
    # k=4, fetch_factor=1 — the sketch fetches {a,b,c,NULL}, the NULL
    # drop leaves only 3 survivors, and pre-fix the guard stayed silent
    # while d (tracked, exact mode!) vanished from the top-4; the raw
    # boundary stats are computed BEFORE the NULL drop so this raises
    nrows = (
        [("g", "a")] * 9 + [("g", "b")] * 8 + [("g", "c")] * 7
        + [("g", None)] * 3 + [("g", "d")] * 2
    )
    ndf = spark.createDataFrame(nrows, "grp STRING, key STRING")
    with pytest.raises(Exception, match="fetch-boundary hazard"):
        TK.grouped_topk_approx(
            ndf, ["grp"], "key", 4, max_items_tracked=100, fetch_factor=1
        ).collect()
    # default fetch_factor over-fetch covers all 5 tracked items
    # (_nf < fetch_n — no truncation): exact, d recovered at rank 4
    ok = _rows(TK.grouped_topk_approx(ndf, ["grp"], "key", 4, 100))
    assert ok == [
        ("g", "a", 9, 1), ("g", "b", 8, 2), ("g", "c", 7, 3),
        ("g", "d", 2, 4),
    ]
    # fetch_n == capacity: same ties, but the fetch is complete — the
    # (cnt DESC, key ASC) cut is deterministic, no guard
    full = _rows(
        TK.grouped_topk_approx(
            df, ["grp"], "key", 2, max_items_tracked=30, fetch_factor=20
        )
    )
    assert full == [("g", "k00", 1, 1), ("g", "k01", 1, 2)]
    # fetch_n > items returned (_nf < fetch_n): nothing unfetched either
    wide = _rows(
        TK.grouped_topk_approx(
            df, ["grp"], "key", 2, max_items_tracked=100, fetch_factor=20
        )
    )
    assert wide == full


def test_truncation_regime_tracking_and_error_bound(spark):
    """The approx tier's honesty claim, pinned by MEASUREMENT in the
    truncation regime (module docstring lines stating the contract):
    3,000 distinct keys against a 64-item sketch. Every key with true
    freq > N_group/max_tracked must be tracked, estimates must sit
    within the two-sided N/max_tracked error band (MEASURED direction:
    Spark's approx_top_k estimate OVER-counts under truncation — the
    DataSketches frequent-items estimate carries the error offset — so
    a one-sided est<=true pin would be wrong), and the verified tier
    must still land the exact top-10."""
    heavies = {f"hot{i}": 150 + 10 * i for i in range(10)}
    rows = [("g", k) for k, n in heavies.items() for _ in range(n)] + [
        ("g", f"cold{i:04d}") for i in range(2990)
    ]
    df = spark.createDataFrame(rows, "grp STRING, key STRING").persist()
    n_group = len(rows)
    max_tracked = 64
    bound = n_group / max_tracked  # ≈ 76 < 150: heavies are guaranteed
    assert min(heavies.values()) > bound
    # capacity fetch (fetch_n == max_tracked): the sketch's whole view
    est = {
        r["key"]: r["cnt"]
        for r in TK.grouped_topk_approx(
            df, ["grp"], "key", max_tracked, max_tracked, fetch_factor=1
        ).collect()
    }
    missing = set(heavies) - set(est)
    assert not missing, f"guaranteed-tracked keys lost: {missing}"
    for k, true_cnt in heavies.items():
        assert abs(est[k] - true_cnt) <= bound, (
            f"{k}: error {est[k] - true_cnt:+} exceeds N/maxTracked {bound}"
        )
    # and the gate-facing tier is exact despite the truncation
    exact = _rows(TK.grouped_topk_exact(df, ["grp"], "key", 10))
    verified = _rows(
        TK.grouped_topk_verified(df, ["grp"], "key", 10, max_tracked)
    )
    assert verified == exact
    df.unpersist()


def test_state_rollup_matches_whole_corpus(spark, tmp_path, skewed):
    """The maintenance path: one state row per (group, day) landed as
    parquet, rolled up with combine — must equal the exact answer over
    the union in the exact regime, raw data untouched at rollup time."""
    d1 = skewed.withColumn("day", F.lit("2024-01-01"))
    d2 = skewed.withColumn("day", F.lit("2024-01-02"))
    both = d1.unionByName(d2)
    states = TK.topk_state(both, ["grp", "day"], "key", 100)
    path = str(tmp_path / "topk_states")
    states.write.mode("overwrite").parquet(path)  # binary blob round-trip
    back = spark.read.parquet(path)
    assert back.count() == 4  # 2 groups × 2 days
    rolled = _rows(TK.topk_from_states(back, ["grp"], 4, 100))
    assert rolled == _rows(TK.grouped_topk_exact(both, ["grp"], "key", 4))


def test_plan_shapes(spark):
    """The scale claims as plan pins (fresh frames + clearCache first —
    the hermetic-pin rule from test_plan_quality):

    * approx tier: exactly ONE shuffle Exchange — the sketch aggregation
      on the group key; the rank window REUSES that partitioning;
    * verified tier: candidate join is a BroadcastHashJoin (never
      SortMergeJoin — the candidate list is bounded by construction)
      and nothing drops to Python;
    * accumulate→combine chained in one lineage also plans ONE Exchange.
    """
    spark.catalog.clearCache()
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    ap = TK.grouped_topk_approx(ev, ["event_type"], "user_id", 5, 1000)
    plan = ap._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan
    assert "partial_approx_top_k" in plan  # map-side sketch combine
    ve = TK.grouped_topk_verified(ev, ["event_type"], "user_id", 5, 1000)
    vplan = ve._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in vplan
    assert "SortMergeJoin" not in vplan
    assert "BatchEvalPython" not in vplan
    roll = TK.topk_from_states(
        TK.topk_state(ev, ["event_type"], "user_id", 1000),
        ["event_type"],
        5,
        1000,
    )
    splan = roll._jdf.queryExecution().executedPlan().toString()
    assert splan.count("Exchange") == 1, splan


def test_events_real_table_verified_equals_exact(spark):
    """The real table has COUNT TIES straddling the k boundary (several
    users tied at the rank-4..6 count per type) — the case where the
    sketch's internal truncation order would leak into the result
    without the over-fetch-then-total-order-cut (_fetch_n). Both
    estimate and verified tiers must match exact, ties included."""
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    exact = _rows(TK.grouped_topk_exact(ev, ["event_type"], "user_id", 5))
    assert (
        _rows(TK.grouped_topk_approx(ev, ["event_type"], "user_id", 5, 20000))
        == exact
    )
    verified = _rows(
        TK.grouped_topk_verified(ev, ["event_type"], "user_id", 5, 20000)
    )
    assert verified == exact


def test_streaming_state_sink_matches_batch_and_survives_replay(
    spark, tmp_path
):
    """The streaming maintenance face: per-batch sketch states landed in
    batch partitions must roll up to the batch-exact answer (exact
    regime), and a REPLAY (same input, fresh checkpoint) must leave the
    state — and therefore the answer — unchanged (dynamic partition
    overwrite, not append)."""
    from superstore_data_pipeline_analytics_dashboard__spark.sources.catalog import (
        load_table,
    )
    from superstore_data_pipeline_analytics_dashboard__spark.streaming import (
        incremental as S,
    )

    drop = tmp_path / "in"
    load_table(spark, "/root/testdata/sf0.001", "events").coalesce(1).write.parquet(
        str(drop)
    )
    state = str(tmp_path / "topk_state")
    stream = S.read_event_stream(spark, str(drop))
    S.start_grouped_topk_sink(
        stream, ["event_type"], "user_id", state, str(tmp_path / "c1"), 20000
    ).awaitTermination(120)
    batch = spark.read.parquet(str(drop))
    exact = _rows(TK.grouped_topk_exact(batch, ["event_type"], "user_id", 5))
    got = _rows(S.read_grouped_topk(spark, state, ["event_type"], 5, 20000))
    assert got == exact
    n_state_rows = spark.read.parquet(state).count()
    # replay with a fresh checkpoint: batch ids repeat, partitions are
    # REPLACED — state row count and rollup answer must not move
    stream2 = S.read_event_stream(spark, str(drop))
    S.start_grouped_topk_sink(
        stream2, ["event_type"], "user_id", state, str(tmp_path / "c2"), 20000
    ).awaitTermination(120)
    assert spark.read.parquet(state).count() == n_state_rows
    assert _rows(S.read_grouped_topk(spark, state, ["event_type"], 5, 20000)) == exact
