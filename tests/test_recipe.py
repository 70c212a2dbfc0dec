"""The sharded quota-fill machinery (operators/recipe.py):

1. sharded_running_sum is BIT-IDENTICAL to the naive one-partition-
   per-group window (the correctness contract that keeps the q123/q134
   oracles valid);
2. the big Exchange hash-partitions on (group, __shard) — the plan pin
   proving the 100 TB path is the executed path (VERDICT r4 item 2:
   "a plan pin showing > |sources| tasks");
3. the composed quota fill is maximal under its quota (greedy in hash
   order: every selected prefix fits, the next doc would not).
"""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from superstore_data_pipeline_analytics_dashboard__spark.operators.recipe import (
    hash_order_cumsum,
    sharded_running_sum,
)
from superstore_data_pipeline_analytics_dashboard__spark.plans import (
    catalog_queries as Q,
)
from tests.conftest import SF_SMOKE


def _docs(spark, n=400, groups=5):
    return spark.range(n).select(
        F.concat(F.lit("g"), (F.col("id") % groups).cast("string")).alias(
            "source"
        ),
        F.col("id").alias("doc_id"),
        ((F.col("id") * 37) % 101 + 1).alias("n_tok"),
        F.md5(F.col("id").cast("string")).alias("h"),
    )


def test_sharded_running_sum_matches_naive_window(spark):
    df = _docs(spark)
    naive_w = (
        Window.partitionBy("source")
        .orderBy("h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    naive = df.withColumn("cum", F.sum("n_tok").over(naive_w))
    for prefix_len in (1, 2):
        sharded = sharded_running_sum(
            df,
            group_cols=["source"],
            hex_order_col="h",
            tiebreak_cols=["doc_id"],
            value_col="n_tok",
            out_col="cum",
            prefix_len=prefix_len,
        )
        a = {(r["doc_id"]): r["cum"] for r in naive.collect()}
        b = {(r["doc_id"]): r["cum"] for r in sharded.collect()}
        assert a == b


def test_sharded_running_sum_rejects_bad_prefix(spark):
    df = _docs(spark, n=10)
    with pytest.raises(ValueError, match="prefix_len"):
        sharded_running_sum(df, ["source"], "h", ["doc_id"], "n_tok", prefix_len=0)


def test_fill_exchange_partitions_on_source_and_shard(spark):
    """The scale pin: the windowed cumsum's Exchange must hash-partition
    on (source, __shard) — 16 sub-partitions per source — not on source
    alone (one straggler task per source)."""
    cum = hash_order_cumsum(_docs(spark))
    plan = cum._jdf.queryExecution().executedPlan().toString()
    import re

    specs = re.findall(r"hashpartitioning\([^)]*\)", plan)
    sharded_specs = [
        s for s in specs if "source" in s and "__shard" in s
    ]
    assert sharded_specs, f"no (source, __shard) exchange in plan:\n{plan}"
    # and the big window itself runs per (source, __shard)
    win_specs = re.findall(r"windowspecdefinition\([^)]*\)", plan)
    assert any(
        "source" in s and "__shard" in s for s in win_specs
    ), f"window not sharded:\n{win_specs}"


def test_quota_fill_respects_quota_and_is_maximal(spark):
    quota = 800
    out = Q.q123_quota_sample(spark, SF_SMOKE, quota=quota)
    per = out.groupBy("source").agg(
        F.sum("n_tok").alias("used"), F.max("cum_tok").alias("max_cum")
    )
    rows = per.collect()
    assert rows, "fill selected nothing"
    for r in rows:
        assert r["used"] <= quota
        assert r["max_cum"] == r["used"]  # cum of last selected == total used
    # maximality: the first NON-selected doc per source (next in hash
    # order) would overflow the quota
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    from superstore_data_pipeline_analytics_dashboard__spark.functions import (
        text as T,
    )

    staged = docs.select(
        "source",
        "doc_id",
        T.token_count("text").cast("bigint").alias("n_tok"),
        F.md5(F.col("doc_id").cast("string")).alias("h"),
    )
    cum = hash_order_cumsum(staged)
    rejected_first = (
        cum.filter(F.col("cum_tok") > quota)
        .groupBy("source")
        .agg(F.min("cum_tok").alias("first_over"))
    )
    for r in rejected_first.collect():
        assert r["first_over"] > quota


def test_two_phase_global_running_sum_matches_naive(spark):
    """group_cols=[] + a value-range shard: the GLOBAL ordered running
    sum (q144's shape) must equal the naive single-partition window."""
    from superstore_data_pipeline_analytics_dashboard__spark.operators.recipe import (
        two_phase_running_sum,
    )

    df = spark.range(500).select(
        F.col("id").alias("doc_id"),
        ((F.col("id") * 7919) % 1000).cast("decimal(9,6)").alias("q"),
        ((F.col("id") * 13) % 50 + 1).alias("n_tok"),
    )
    shard = F.least(
        F.greatest(F.floor(F.col("q") / 63), F.lit(0)), F.lit(15)
    ).cast("int")
    # NOTE shard must be monotone in the DESC order key: q/63 grows
    # with q, so order by q ASC here
    got = two_phase_running_sum(
        df, [], shard, [F.asc("q"), F.asc("doc_id")], "n_tok", "cum"
    )
    w = (
        Window.orderBy("q", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    want = df.withColumn("cum", F.sum("n_tok").over(w))
    a = {r["doc_id"]: r["cum"] for r in want.collect()}
    b = {r["doc_id"]: r["cum"] for r in got.collect()}
    assert a == b


def test_scd2_history_intervals(spark):
    """Half-open validity chain: per key, valid_to == next valid_from,
    exactly one open interval, deletes never current."""
    from superstore_data_pipeline_analytics_dashboard__spark.operators.cdc import (
        scd2_history,
    )

    rows = [
        (1, 0, "I"), (1, 2, "U"), (1, 5, "D"),
        (2, 0, "I"),
        (3, 1, "I"), (3, 4, "U"),
    ]
    ch = spark.createDataFrame(rows, "k long, seq long, op string")
    hist = {(r["k"], r["seq"]): r for r in scd2_history(ch, "k", "seq").collect()}
    assert hist[(1, 0)]["valid_to_seq"] == 2
    assert hist[(1, 2)]["valid_to_seq"] == 5
    assert hist[(1, 5)]["valid_to_seq"] is None
    assert not hist[(1, 5)]["is_current"]  # delete tombstone, never current
    assert hist[(2, 0)]["is_current"]
    assert hist[(3, 4)]["is_current"] and not hist[(3, 1)]["is_current"]


def test_two_phase_running_sum_property(spark):
    """Hypothesis sweep: for arbitrary small corpora (group counts,
    value ranges, duplicate hashes impossible — ids unique), the
    sharded sum equals the naive window for every prefix length."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=8, deadline=None)
    @given(
        n=st.integers(min_value=1, max_value=120),
        groups=st.integers(min_value=1, max_value=6),
        mult=st.integers(min_value=1, max_value=997),
    )
    def check(n, groups, mult):
        df = spark.range(n).select(
            (F.col("id") % groups).cast("string").alias("source"),
            F.col("id").alias("doc_id"),
            ((F.col("id") * mult) % 53 + 1).alias("n_tok"),
            F.md5((F.col("id") * mult).cast("string")).alias("h"),
        )
        naive_w = (
            Window.partitionBy("source")
            .orderBy("h", "doc_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        want = {
            r["doc_id"]: r["cum"]
            for r in df.withColumn("cum", F.sum("n_tok").over(naive_w)).collect()
        }
        got = {
            r["doc_id"]: r["cum"]
            for r in sharded_running_sum(
                df, ["source"], "h", ["doc_id"], "n_tok", "cum", prefix_len=1
            ).collect()
        }
        assert got == want

    check()


def test_abc_window_runs_per_shard_not_single_partition(spark):
    """q169's scale pin: the data-grain cumulative window must run per
    __shard (a parallel Exchange on the value-range shard), with the
    only SinglePartition exchange under the 16-row shard-offsets branch
    — never a global window over the part grain."""
    df = Q.q169_abc_classification(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    import re

    win_specs = re.findall(r"windowspecdefinition\([^)]*\)", plan)
    assert any("__shard" in s and "rev_cents" in s for s in win_specs), (
        f"data window not sharded:\n{win_specs}"
    )
    # the single-partition window exists only for the shard OFFSETS
    # (16 rows): every windowspec ordering raw rev_cents must be
    # shard-partitioned
    for s in win_specs:
        if "rev_cents" in s and "part_key" in s:
            assert "__shard" in s, f"global data-grain window:\n{s}"


def _ref_waterfill(avails, budget, cap):
    """Iterative water-filling fixpoint (float weights — the textbook
    algorithm waterfill_budget's closed-form scan must reproduce):
    repeat {lam = remaining budget / uncapped weight; cap every source
    whose capacity falls below its lam-share} until stable."""
    import math

    tot = sum(avails.values())
    w = {k: math.sqrt(a / tot) for k, a in avails.items()}
    cap_tok = {k: a * cap for k, a in avails.items()}
    capped: set = set()
    while True:
        w_unc = sum(w[k] for k in w if k not in capped)
        if w_unc == 0:
            lam = 0.0
            break
        lam = (budget - sum(cap_tok[k] for k in capped)) / w_unc
        new = {
            k for k in w if k not in capped and cap_tok[k] < lam * w[k]
        }
        if not new:
            break
        capped |= new
    alloc = {
        k: (float(cap_tok[k]) if k in capped else lam * w[k]) for k in w
    }
    return capped, alloc


def test_waterfill_matches_iterative_fixpoint(spark):
    """The closed-form threshold scan IS the fixpoint: same capped set,
    same allocations (within the decimal(18,9) weight quantization),
    and conservation sum(alloc) == min(budget, total capacity) — over
    a deterministic grid of skews, budgets and caps including the
    all-capped, none-capped and zero-budget corners."""
    from superstore_data_pipeline_analytics_dashboard__spark.operators.recipe import (
        waterfill_budget,
    )

    import random

    rng = random.Random(1234)
    for trial in range(8):
        n = rng.randint(1, 10)
        avails = {
            f"s{i}": rng.randint(1, 10 ** rng.randint(1, 6))
            for i in range(n)
        }
        tot = sum(avails.values())
        budget = [0, tot // 2, tot, 3 * tot // 2, 3 * tot, 10 * tot][
            trial % 6
        ]
        cap = [1, 2, 4][trial % 3]
        per = spark.createDataFrame(
            list(avails.items()), "source STRING, avail BIGINT"
        )
        out = {
            r["source"]: r
            for r in waterfill_budget(
                per, "avail", budget, cap=cap
            ).collect()
        }
        ref_capped, ref_alloc = _ref_waterfill(avails, budget, cap)
        got_capped = {k for k, r in out.items() if r["capped"]}
        assert got_capped == ref_capped, (
            f"trial {trial}: capped set {sorted(got_capped)} != "
            f"fixpoint {sorted(ref_capped)}"
        )
        for k, r in out.items():
            assert abs(r["alloc_tokens"] - ref_alloc[k]) <= max(
                1e-6 * max(budget, 1), 1e-6
            ), f"trial {trial}/{k}: {r['alloc_tokens']} vs {ref_alloc[k]}"
        tot_alloc = sum(r["alloc_tokens"] for r in out.values())
        target = min(budget, cap * tot)
        assert abs(tot_alloc - target) <= 1e-6 * max(target, 1)


def test_waterfill_drops_zero_avail_and_validates(spark):
    from superstore_data_pipeline_analytics_dashboard__spark.operators.recipe import (
        waterfill_budget,
    )

    per = spark.createDataFrame(
        [("a", 100), ("b", 0), ("c", 300)], "source STRING, avail BIGINT"
    )
    out = waterfill_budget(per, "avail", 500, cap=2).collect()
    assert sorted(r["source"] for r in out) == ["a", "c"]
    with pytest.raises(ValueError, match="budget"):
        waterfill_budget(per, "avail", -1)
    with pytest.raises(ValueError, match="cap"):
        waterfill_budget(per, "avail", 10, cap=0)


def test_integer_apportion_sums_exactly_and_orders_remainders(spark):
    """Hamilton apportionment: allocs are integers summing to EXACTLY
    the total, each within 1 of its real-valued quota (the classic
    quota property largest-remainder satisfies), leftovers go to the
    largest fractional parts, and zero-weight rows allocate zero."""
    from decimal import Decimal

    from superstore_data_pipeline_analytics_dashboard__spark.operators.recipe import (
        integer_apportion,
    )

    import random

    rng = random.Random(77)
    for trial in range(6):
        n = rng.randint(1, 12)
        weights = {f"s{i}": rng.randint(0, 1000) for i in range(n)}
        if sum(weights.values()) == 0:
            weights["s0"] = 1
        total = rng.choice([0, 1, 7, 100, 12345])
        per = spark.createDataFrame(
            [(k, Decimal(v)) for k, v in weights.items()],
            "source STRING, w DECIMAL(18,9)",
        )
        out = {
            r["source"]: r
            for r in integer_apportion(per, "w", total).collect()
        }
        assert sum(r["alloc"] for r in out.values()) == total
        W = sum(weights.values())
        for k, r in out.items():
            q = total * weights[k] / W
            assert r["alloc"] >= int(q) - 0 and r["alloc"] <= int(q) + 1, (
                f"trial {trial}/{k}: alloc {r['alloc']} vs quota {q}"
            )
            if weights[k] == 0:
                assert r["alloc"] == 0


def test_integer_apportion_refuses_double_weights(spark):
    from superstore_data_pipeline_analytics_dashboard__spark.operators.recipe import (
        integer_apportion,
    )

    per = spark.createDataFrame(
        [("a", 1.5), ("b", 2.5)], "source STRING, w DOUBLE"
    )
    with pytest.raises(TypeError, match="order-dependent"):
        integer_apportion(per, "w", 10)
    with pytest.raises(ValueError, match="total"):
        integer_apportion(
            spark.createDataFrame([("a", 1)], "source STRING, w BIGINT"),
            "w",
            -5,
        )


def test_integer_apportion_refuses_all_zero_weights(spark):
    from decimal import Decimal

    from superstore_data_pipeline_analytics_dashboard__spark.operators.recipe import (
        integer_apportion,
    )

    per = spark.createDataFrame(
        [("a", Decimal(0)), ("b", Decimal(0))],
        "source STRING, w DECIMAL(18,9)",
    )
    with pytest.raises(Exception, match="no proportion to apportion"):
        integer_apportion(per, "w", 10).collect()


def test_integer_apportion_refuses_negative_and_interval_weights(spark):
    """Review r13: a negative weight silently breaks the exact-sum
    contract (its floor undershoots by more than the remainder lottery
    can repay), and the old simpleString-prefix type check let
    interval types ('interval...' startswith 'int') slip past the
    named refusal into a raw downstream error."""
    from decimal import Decimal

    from superstore_data_pipeline_analytics_dashboard__spark.operators.recipe import (
        integer_apportion,
    )

    neg = spark.createDataFrame(
        [("a", Decimal(-1)), ("b", Decimal(3))],
        "source STRING, w DECIMAL(18,9)",
    )
    with pytest.raises(Exception, match="non-negative"):
        integer_apportion(neg, "w", 7).collect()
    iv = spark.sql(
        "SELECT 'a' AS source, INTERVAL '1' DAY AS w"
    )
    with pytest.raises(TypeError, match="DECIMAL or integer"):
        integer_apportion(iv, "w", 10)
