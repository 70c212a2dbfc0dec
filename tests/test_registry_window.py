"""Audit-window contract pins.

The external correctness gate audits only the FIRST 50 entries of the
`QUERIES` registry per round, so dict ORDER is load-bearing (see
COVERAGE.md's window paragraph). These pins make the contract explicit:
an accidental insertion or reorder at the top of the registry would
silently spend a driver-audit slot on the wrong query — the rotation
must always be a conscious, documented edit that also updates this
file."""

from superstore_data_pipeline_analytics_dashboard__spark.plans.catalog_queries import (
    ORACLES,
    QUERIES,
)

# Round-12 window (VERDICT r11 item 1): positions 1-6 are the SIX new
# queries — q276-q281, the r11 maintenance/repair tier (bloom-store
# consistency audit, erasure crash repair + resume, NDV bloom
# autosizing, composite-key bloomed erasure with store maintenance,
# the compaction crash → vacuum-refusal → repair chain, standalone
# manifest repair), staged dormant through round 11 and parity-tested
# at sf0.001 + sf0.01 before registration.
# Positions 7-50: the 44 oldest-verdict canaries — the 8 remaining
# r6-verdict queries, then the first 36 queries of the r7-verdict
# block, unchanged relative order. Displaced r11-window entries keep
# their pass(r11) verdicts and queue at the back of the
# oldest-verdict-first re-audit order.
R12_NEW = [
    "q276_bloom_store_audit",
    "q277_erasure_crash_repair",
    "q278_bloom_autosize",
    "q279_multicol_bloomed_erasure",
    "q280_compaction_crash_chain",
    "q281_manifest_repair",
]
R12_R6_CANARIES = [
    # the 8 r6-verdict queries the r11 window didn't re-audit,
    # unchanged relative order
    "q192_dead_stock",
    "q193_token_weighted_median",
    "q194_embedding_drift",
    "q243_tier_disagreement",
    "q88_copurchase_triangles",
    "q123_quota_sample",
    "q134_training_recipe",
    "q08_rolling_30row",
]
R12_R7_CANARIES = [
    # the first 36 of the r7-verdict block, unchanged relative order
    "q195_benford_audit",
    "q196_revenue_anomaly_mad",
    "q197_keyword_search",
    "q198_bucket_skew_audit",
    "q199_reconciliation_audit",
    "q200_release_readiness",
    "q201_double_billing_exposure",
    "q202_ensemble_neardup",
    "q203_contingency_residuals",
    "q204_fiscal_calendar",
    "q205_touch_attribution",
    "q206_knn_label_accuracy",
    "q207_session_concurrency",
    "q208_cusum_changepoint",
    "q209_xyz_volatility",
    "q210_quantile_normalize",
    "q211_frequent_triples",
    "q212_price_volume_bridge",
    "q213_unknown_member_repair",
    "q214_weighted_jaccard",
    "q215_rebalance_plan",
    "q216_stats_merge_audit",
    "q217_stratified_kfold",
    "q218_equidepth_histogram",
    "q219_user_lifecycle",
    "q221_backfill_restatement",
    "q222_dedup_cost_model",
    "q223_sla_attainment",
    "q224_basket_diversity",
    "q225_discount_elasticity",
    "q226_cohort_ltv",
    "q227_session_paths",
    "q228_revenue_decomposition",
    "q229_lang_confusion",
    "q230_share_matrix",
    "q231_hhi_trend",
]
R12_WINDOW = R12_NEW + R12_R6_CANARIES + R12_R7_CANARIES


def test_registry_counts():
    assert len(QUERIES) == 281
    assert len(ORACLES) == 264
    assert set(ORACLES) <= set(QUERIES)


def test_window_is_50_and_fully_oracled():
    window = list(QUERIES)[:50]
    assert len(window) == 50
    # an audit slot spent on a rows-only query is a wasted slot
    not_oracled = [q for q in window if q not in ORACLES]
    assert not not_oracled, not_oracled


def test_window_composition_matches_coverage_doc():
    window = list(QUERIES)[:50]
    assert len(R12_WINDOW) == 50
    assert window == R12_WINDOW


def test_queue_past_window_is_oldest_verdict_first():
    # past the window the oracled re-audit queue is monotone
    # oldest-verdict-first (the 14 r7-block queries the 36-canary
    # window didn't re-audit, then the r8, r9, r10 and displaced r11
    # blocks), then the rows-only tail closes the registry
    names = list(QUERIES)
    r7_rest = names[50:64]
    assert r7_rest == [
        "q232_tokenizer_fertility",
        "q233_review_queue",
        "q234_gate_ablation",
        "q236_reorder_survival",
        "q237_vocab_growth",
        "q238_fd_audit",
        "q239_lsh_param_planner",
        "q240_margin_sample",
        "q241_join_cost_audit",
        "q242_seasonal_decomposition",
        "q244_discount_cap_whatif",
        "q245_order_fill_rate",
        "q246_acquisition_curve",
        "q247_top_customer_share",
    ]
    assert names[64] == "q248_charset_audit"  # r8 displaced block head
    assert names[114] == "q251_pagerank_checkpoint_resume"  # r9 head
    assert names[164] == "q266_lineitem_contract"  # displaced r10 head
    i = names.index("q268_ledger_contract")  # displaced r11 head
    assert i == 214
    # the displaced r11 window, in its r11-window order: q268-q275,
    # then the 42-query r6-verdict band
    r11_band = names[i : i + 50]
    assert r11_band[:8] == [
        "q268_ledger_contract",
        "q269_topk_truncation_band",
        "q270_bloom_point_prune",
        "q271_multibatch_erasure",
        "q272_bloomed_erasure",
        "q273_filegrain_erasure",
        "q274_compact_batch",
        "q275_streamed_bloom_chain",
    ]
    assert r11_band[8] == "q150_survivorship_merge"
    assert r11_band[-1] == "q191_funnel_summary"
    assert all(n in ORACLES for n in r11_band)
    # everything after the displaced r11 block is the rows-only tail
    assert all(n not in ORACLES for n in names[i + 50 :])
    assert len(names[i + 50 :]) == 17
