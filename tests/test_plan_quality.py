"""Plan-shape assertions: the scale checklist (pushdown, pruning,
broadcast, codegen) enforced by tests, not hope. If Catalyst stops
producing these shapes after a refactor, these fail."""

import pytest

from superstore_data_pipeline_analytics_dashboard__spark.plans import catalog_queries as Q
from tests.conftest import SF_SMOKE


@pytest.fixture(autouse=True)
def _hermetic_cache(spark):
    """Plan-SHAPE pins must not see ambient cache entries: CacheManager
    substitutes equivalent persisted frames into new plans
    order-dependently, so a pin that passes standalone can fail
    mid-suite (or silently assert against another test's cache). Clear
    BEFORE each test — never after the query under test is built, since
    several pins assert on the query's OWN persisted frames."""
    spark.catalog.clearCache()
    yield


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _formatted(df) -> str:
    qe = df._jdf.queryExecution()
    mode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return qe.explainString(mode)


def test_slicer_filters_push_to_scan(spark):
    plan = _formatted(Q.q07_slicer_dashboard(spark, SF_SMOKE))
    assert "In(r_name, [ASIA,EUROPE" in plan
    assert "In(c_mktsegment, [AUTOMOBILE,BUILDING" in plan


def test_rollup_prunes_columns(spark):
    """q05 projects 2 part columns + 4 lineitem columns — the scan must
    not read more."""
    plan = _formatted(Q.q05_sales_by_brand_rollup(spark, SF_SMOKE))
    assert "ReadSchema: struct<l_partkey:bigint,l_quantity:double," \
           "l_extendedprice:double,l_discount:double>" in plan
    assert "ReadSchema: struct<p_partkey:bigint,p_brand:string>" in plan


def test_dims_broadcast_in_fact_build(spark):
    plan = _executed_plan(Q.q04_fact_build(spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan  # everything broadcastable at this SF


def test_semi_and_anti_joins_stay_semi_anti(spark):
    semi = _executed_plan(Q.q16_semi_join_active(spark, SF_SMOKE))
    assert "LeftSemi" in semi
    anti = _executed_plan(Q.q15_idempotent_append(spark, SF_SMOKE))
    assert "LeftAnti" in anti


def test_whole_stage_codegen_covers_hot_path(spark):
    """The staging-typer projection must run inside WholeStageCodegen
    (no Python, no interpreted expressions)."""
    plan = _executed_plan(Q.q01_typed_staging(spark, SF_SMOKE))
    # "*(n)" prefixes mark WholeStageCodegen stages in the plan tree
    assert "*(1)" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_global_topk_is_take_ordered_not_full_sort(spark):
    """q59 must compile to TakeOrderedAndProject (per-partition top-k,
    driver merges k·p rows) — a global Sort of the fact would be the
    wrong plan at any scale."""
    plan = _executed_plan(Q.q59_global_topk(spark, SF_SMOKE))
    assert "TakeOrderedAndProject" in plan
    assert "Exchange rangepartitioning" not in plan


def test_exists_notexists_compile_to_semi_and_anti(spark):
    """q60's EXISTS/NOT EXISTS pair must stay one LeftSemi + one LeftAnti
    — no materialized subquery results."""
    plan = _executed_plan(Q.q60_late_unreturned_orders(spark, SF_SMOKE))
    assert "LeftSemi" in plan
    assert "LeftAnti" in plan


def test_correlated_subquery_shape_single_aggregate(spark):
    """q54 (decorrelated Q17): exactly one per-part aggregate pass over
    lineitem feeding the join — the naive plan would scan lineitem once
    per subquery."""
    plan = _executed_plan(Q.q54_small_quantity_parts(spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan  # part side broadcast
    # lineitem is scanned exactly twice (one shared per-part aggregate +
    # the probe side); the naive correlated plan would scan it three times
    # (once per subquery) or worse, once per outer row
    assert plan.count("lineitem.parquet") == 2
    # both subqueries fused into ONE per-part aggregate (count+sum together)
    assert "functions=[partial_count(1), partial_sum" in plan


def test_dynamic_partition_pruning_fires(spark, tmp_path):
    """A partitioned fact joined to a filtered dim must get a runtime
    partition filter (DPP) — the scan reads only the partitions the dim
    subset selects, decided at execution time. This is the mechanism that
    replaces the reference's covering date index at 100 TB."""
    from superstore_data_pipeline_analytics_dashboard__spark.sources.catalog import (
        load_table,
    )
    from pyspark.sql import functions as F

    li = load_table(spark, SF_SMOKE, "lineitem").withColumn(
        "ship_month",
        (F.year(F.col("l_shipdate").cast("date")) * 100
         + F.month(F.col("l_shipdate").cast("date"))).cast("int"),
    )
    path = str(tmp_path / "fact_parted")
    li.write.partitionBy("ship_month").parquet(path)
    fact = spark.read.parquet(path)

    # DPP only injects the runtime filter when the dim side carries a
    # selective predicate — mirror the real shape (filtered date dim)
    months = (
        spark.range(199501, 199601)
        .select(F.col("id").cast("int").alias("ship_month"))
        .filter(F.col("ship_month") < 199503)
    )
    joined = fact.join(months, "ship_month").agg(
        F.sum("l_quantity").alias("total_qty")
    )
    plan = _formatted(joined)
    assert "dynamicpruning" in plan.lower()
    assert joined.first()["total_qty"] is not None


def test_sequence_pack_runs_per_shard_windows(spark):
    """q75's running sum must partition by shard (independent per-shard
    cumulative scans) — never collapse to a single-partition window."""
    plan = _executed_plan(Q.QUERIES["q75_sequence_pack"](spark, SF_SMOKE))
    assert "hashpartitioning(shard" in plan
    assert "SinglePartition" not in plan


def test_tfidf_broadcasts_only_the_one_row_total(spark):
    """q76 joins tf×df on term (vocab-sized — must stay a real join) and
    crosses with the 1-row corpus total, which must be the broadcast side;
    the rank window partitions on doc_id for full parallelism."""
    plan = _executed_plan(Q.QUERIES["q76_tfidf_topterms"](spark, SF_SMOKE))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "hashpartitioning(doc_id" in plan


def test_source_mix_is_two_aggregates_and_a_broadcast(spark):
    """q77: per-source agg (map-side combined), 1-row totals broadcast
    back — no sort, no window, no Python."""
    plan = _executed_plan(Q.QUERIES["q77_source_mix"](spark, SF_SMOKE))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "SortExec" not in plan and "Window" not in plan


def test_funnel_is_single_exchange_on_user(spark):
    """q78's window chain + aggregate must reuse one hash partitioning on
    user_id — one Exchange for the whole funnel, no joins."""
    plan = _executed_plan(Q.QUERIES["q78_event_funnel"](spark, SF_SMOKE))
    assert plan.count("Exchange hashpartitioning(user_id") == 1
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan


def test_throttle_batch_twin_single_exchange_no_window(spark):
    """q100 (event throttle, batch twin of streaming.throttle_events):
    the first-event-per-(window,user,type) pick must ride the aggregate's
    min-over-struct — ONE hash Exchange for the whole query, partial agg
    before it, and no Window node or join (a row_number formulation would
    shuffle AND sort globally). min(struct) is not hash-aggregable, so
    Spark plans SortAggregate with partition-LOCAL sorts ("false, 0" =
    non-global) — acceptable; a global range Exchange would not be."""
    plan = _executed_plan(Q.QUERIES["q100_event_throttle"](spark, SF_SMOKE))
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Exchange rangepartitioning" not in plan
    assert "partial_min" in plan  # map-side combine before the shuffle
    assert "Window" not in plan
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan


def test_vocab_oov_topk_and_broadcast_membership(spark):
    """q104: the top-K vocabulary must compile to TakeOrderedAndProject
    (K is bounded regardless of corpus size — a global Sort of the df
    table would be the wrong plan), and the vocabulary membership join
    must broadcast (K rows against the exploded token stream)."""
    plan = _executed_plan(Q.QUERIES["q104_vocab_oov"](spark, SF_SMOKE))
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_label_cohesion_broadcasts_centroids(spark):
    """q105: the centroid table is labels×dims (tiny) — members must
    join it via broadcast, never a shuffled join of the embedding scan."""
    plan = _executed_plan(Q.QUERIES["q105_label_cohesion"](spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_content_chunks_single_exchange(spark):
    """q110: the (doc, chunk) rollup must reuse the window's hash
    partitioning on doc_id — ONE Exchange for explode + cumsum + rollup."""
    plan = _executed_plan(Q.QUERIES["q110_content_chunks"](spark, SF_SMOKE))
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Exchange rangepartitioning" not in plan


def test_content_chunks_stable_under_insertion(spark):
    """The CDC property: inserting tokens at the head of a document must
    leave the fingerprints of all later chunks unchanged (only the
    chunk containing the edit — and possibly its neighbor — differs).
    A fixed-size chunker would re-fingerprint EVERY window after the
    insertion point."""
    import superstore_data_pipeline_analytics_dashboard__spark.plans.catalog_queries as C
    from superstore_data_pipeline_analytics_dashboard__spark.functions.hashing import (
        md5_prefix_long,
    )
    from pyspark.sql import functions as F

    # build a long synthetic doc and its edited twin via the same code
    # path the catalog query uses, just on an in-memory table
    words = [f"w{i}" for i in range(400)]
    base = " ".join(words)
    edited = "inserted tokens here " + base
    docs = spark.createDataFrame(
        [(1, base), (2, edited)], ["doc_id", "text"]
    )

    import superstore_data_pipeline_analytics_dashboard__spark.functions.text as T
    from pyspark.sql import Window

    toks = docs.select(
        "doc_id", F.posexplode(T.tokens("text")).alias("pos", "term")
    )
    flag = (md5_prefix_long(F.col("term")) % 16 == 0).cast("int")
    w = Window.partitionBy("doc_id").orderBy("pos")
    chunks = (
        toks.select("doc_id", "pos", "term", F.sum(flag).over(w).alias("c"))
        .groupBy("doc_id", "c")
        .agg(
            F.md5(
                F.concat_ws(
                    " ",
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("pos", "term"))),
                        lambda s: s["term"],
                    ),
                )
            ).alias("md5")
        )
    )
    a = {r["md5"] for r in chunks.filter(F.col("doc_id") == 1).collect()}
    b = {r["md5"] for r in chunks.filter(F.col("doc_id") == 2).collect()}
    # every chunk of the original except (at most) the first survives
    # verbatim in the edited doc
    assert len(a - b) <= 1
    assert len(a) > 5  # the doc actually split into many chunks


def test_heavy_keys_is_topk_not_full_sort(spark):
    """q79's top-20 must be TakeOrderedAndProject (per-partition k + merge),
    never a global Sort of all keys."""
    plan = _executed_plan(Q.QUERIES["q79_heavy_join_keys"](spark, SF_SMOKE))
    assert "TakeOrderedAndProject" in plan


def test_q90_broadcasts_dims_and_pushes_type_filter(spark):
    """TPC-H Q9 shape: part/supplier/nation must broadcast, the p_type
    filter must reach the part scan (PushedFilters or pre-broadcast
    Filter), and the only Exchange joins the two facts."""
    df = Q.QUERIES["q90_profit_by_nation_year"](spark, SF_SMOKE)
    plan = _executed_plan(df)
    assert plan.count("BroadcastHashJoin") >= 3
    formatted = _formatted(df)
    assert "Contains(p_type" in formatted or "p_type" in formatted.split(
        "PushedFilters"
    )[1].split("\n")[0]


def test_window_queries_deterministic_across_partitioning(spark):
    """The catalog's tie-break convention must make results identical
    under different parallelism — rerun representative window/dedup/
    packing queries with a different shuffle-partition count and compare
    full row sets."""
    names = ["q03_dedup_latest", "q08_rolling_30row", "q75_sequence_pack"]
    base = {}
    for n in names:
        base[n] = sorted(map(repr, Q.QUERIES[n](spark, SF_SMOKE).collect()))
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "5")
        for n in names:
            again = sorted(map(repr, Q.QUERIES[n](spark, SF_SMOKE).collect()))
            assert again == base[n], n
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def test_kmeans_assignment_is_broadcast_row_not_literals(spark):
    """q117's per-iteration assignment must join the ONE-ROW centroid
    DataFrame via a broadcast nested-loop (narrow, zero shuffle) — and
    the whole query must never fall back to a sort-merge join or
    Python."""
    from superstore_data_pipeline_analytics_dashboard__spark.operators.clustering import (
        _assign,
        quantize_embeddings,
    )

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    quant = quantize_embeddings(emb)
    seed = quant.select("vec_id", "q").orderBy("vec_id").limit(4).collect()
    cents = [(i, list(r["q"])) for i, r in enumerate(seed)]
    plan = _executed_plan(_assign(quant, cents))
    assert "BroadcastNestedLoopJoin" in plan
    # the only exchange is the one-row IdentityBroadcast of the centroids
    # — no shuffle of the vector side
    assert "Exchange hashpartitioning" not in plan
    assert "BatchEvalPython" not in plan and "MapInPandas" not in plan


def test_random_projection_broadcasts_matrix(spark):
    """q126: the d×d_out projection table must be the broadcast side of
    the explode join; partial sums aggregate onto (vec_id, dout) keys."""
    plan = _executed_plan(Q.QUERIES["q126_random_projection"](spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_boilerplate_strip_broadcasts_mined_set(spark):
    """q121: the top-20 mined shingle set is K rows and must broadcast
    against the gram stream — never shuffle the grams onto shingle keys
    for the hit join."""
    plan = _executed_plan(Q.QUERIES["q121_boilerplate_strip"](spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan


def test_quota_sample_windows_per_source(spark):
    """q123's running token sum must partition by source — never a
    single-partition global cumsum."""
    plan = _executed_plan(Q.QUERIES["q123_quota_sample"](spark, SF_SMOKE))
    assert "hashpartitioning(source" in plan
    assert "SinglePartition" not in plan


def test_bigram_lift_topk_is_take_ordered(spark):
    """q146's top-20 must compile to TakeOrderedAndProject (per-partition
    k + driver merge), never a full sort of the bigram table."""
    plan = _executed_plan(Q.q146_bigram_lift(spark, SF_SMOKE))
    assert "TakeOrderedAndProject" in plan


def test_global_nucleus_fill_has_no_global_window(spark):
    """q144's corpus-wide ordered cut must run entirely on sharded
    windows — every window spec in the plan carries the __shard key,
    and the big Exchanges partition on it (the two-phase prefix sum);
    an empty-partition windowspecdefinition would be the single-task
    global sort this operator exists to avoid."""
    import re

    plan = _executed_plan(Q.q144_global_nucleus_fill(spark, SF_SMOKE))
    wins = re.findall(r"windowspecdefinition\([^)]*\)", plan)
    assert wins, "expected window specs in plan"
    assert all("__shard" in w for w in wins), wins
    assert any(
        "__shard" in s
        for s in re.findall(r"hashpartitioning\([^)]*\)", plan)
    )


def test_interleave_order_windows_are_all_sharded(spark):
    """q155: both rank stages (per-source rank, GLOBAL step) must window
    per shard — the manifest materializes with no single-partition
    stage."""
    import re

    plan = _executed_plan(Q.q155_interleave_order(spark, SF_SMOKE))
    wins = re.findall(r"windowspecdefinition\([^)]*\)", plan)
    assert wins and all("__shard" in w for w in wins), wins


def test_triangle_dag_is_persisted_single_pass(spark):
    """q88 (VERDICT r5 item 2): `und` and `oriented` are persisted, so
    the wedge sides and the closing-edge set scan the cache instead of
    re-expanding the whole q41 co-purchase pipeline per consumer (the
    228-raw-Exchange plan), and both counts come from ONE aggregate over
    the wedge⋈closing left join (no join of two one-row count subplans).
    Hermetic via the module's autouse clearCache fixture."""
    plan = _executed_plan(Q.q88_copurchase_triangles(spark, SF_SMOKE))
    # oriented is scanned 4x (two wedge sides, closing both directions),
    # each printing und's cached scans — the count is plan-shaped
    assert plan.count("InMemoryTableScan") >= 6
    assert "BroadcastNestedLoopJoin" not in plan


def test_q243_shingle_frame_built_once(spark):
    """q243 (VERDICT r5 item 3): the (doc_id, shingle) frame — the
    dominant tokenize→shingle cost — is built ONCE and shared by both
    exact tiers via their `shingles` parameter. Pin: of the DISTINCT
    cached subtrees in the executed plan, exactly one contains the
    shingle tokenize (`explode`), and none runs in the outer
    (uncached) plan. If sharing regresses, each tier persists its OWN
    shingle build and TWO distinct cached blocks carry the explode."""
    from tools.scale_audit import _decompose

    # Hermetic via the module's autouse clearCache fixture: earlier
    # tests leave cache entries for EQUIVALENT frames (q20/q214 persist
    # the same canonicalized shingle plans), and CacheManager
    # substitution against those makes the plan shape order-dependent.
    plan = _executed_plan(Q.q243_tier_disagreement(spark, SF_SMOKE))
    outer, cached = _decompose(plan)
    assert outer.count("explode(") == 0
    tokenizing = [k for k in cached if "explode(" in k]
    assert len(tokenizing) == 1, f"{len(tokenizing)} cached tokenize blocks"


def test_catalog_wide_plan_hygiene(spark):
    """Global anti-pattern audit over EVERY registry query at smoke
    scale, in ONE construction+plan pass (r14: this used to be three
    separate catalog sweeps — plan hygiene, the no-Python-UDF audit and
    the complex-boundary-type audit — and each sweep runs the eager
    operators inside the query bodies, so the trio cost ~12 min of the
    suite; same assertions, one pass):

    * no row-at-a-time Python (BatchEvalPython) anywhere;
    * no CartesianProduct (one-row normalizer crossJoins compile to
      BroadcastNestedLoopJoin over a single-row side, which is fine);
    * Arrow-batched Python only in the queries documented to need it
      (byte codecs, GEMM, BPE encode), with MapInPandas under the
      stricter documented-tool list;
    * no list/struct/map column survives to the registry boundary
      (the external gate canonicalizes through pandas, which cannot
      sort/hash such cells — round-2's q67 crash)."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    ARROW_OK = {
        "q67_multimodal_features",
        "q69_sign_lsh_neardup",  # plane-projection GEMM (similarity.py:216)
        "q72_semantic_dedup",
        "q102_video_frame_sample",
        "q127_bpe_encode",
        "q135_audio_features",
    }
    # MapInPandas specifically: the documented right-tool list (BLAS
    # block GEMM, hyperplane projection, byte codecs, the BPE
    # distinct-word encoder)
    MAPINPANDAS_OK = {
        "q33_embedding_neardup",
        "q67_multimodal_features",
        "q69_sign_lsh_neardup",
        "q102_video_frame_sample",
        "q127_bpe_encode",
        "q135_audio_features",
    }
    failures = []
    for name, fn in Q.QUERIES.items():
        try:
            df = fn(spark, SF_SMOKE)
            plan = _executed_plan(df)
        except Exception as e:  # pragma: no cover - any failure is a bug
            failures.append((name, f"plan build failed: {e}"))
            continue
        bad_cols = [
            f.name
            for f in df.schema.fields
            if isinstance(f.dataType, (ArrayType, MapType, StructType))
        ]
        if bad_cols:
            failures.append((name, f"complex boundary type(s): {bad_cols}"))
        if "BatchEvalPython" in plan:
            failures.append((name, "row-at-a-time Python UDF in plan"))
        if "CartesianProduct" in plan:
            failures.append((name, "CartesianProduct in plan"))
        if name not in MAPINPANDAS_OK and "MapInPandas" in plan:
            failures.append((name, "undocumented MapInPandas stage"))
        if name not in ARROW_OK and (
            "ArrowEvalPython" in plan
            or "MapInPandas" in plan
            or "FlatMapGroupsInPandas" in plan
        ):
            failures.append((name, "undocumented Arrow Python stage"))
    assert not failures, failures


def test_margin_sample_is_take_ordered(spark):
    """q240's global top-20 must be TakeOrderedAndProject — never a
    global sort of the doc grain."""
    plan = _executed_plan(Q.q240_margin_sample(spark, SF_SMOKE))
    assert "TakeOrderedAndProject" in plan
    assert "Sort [" not in plan.split("TakeOrderedAndProject")[0]


def test_elasticity_broadcasts_part_dim(spark):
    """q225: the part dim join must broadcast; the regression agg is
    the only wide op."""
    plan = _executed_plan(Q.q225_discount_elasticity(spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_revenue_decomposition_is_one_scan(spark):
    """q228: gross/discount/net/tax/charged all come from ONE lineitem
    scan (conditional aggregation, never five passes)."""
    plan = _executed_plan(Q.q228_revenue_decomposition(spark, SF_SMOKE))
    assert plan.count("Scan parquet") == 1
    assert "Join" not in plan
