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

# Round-13 window (VERDICT r12 item 1): positions 1-5 are the FIVE new
# queries — q282-q286, the r12 repair-hardening tier (targeted
# bloom-store repair over four damage classes planted at once,
# no-op-resume journal retirement, whole-table erasure crash repair
# over a fully-emptied manifest, journaled bloom-store reconciliation
# through a swap/refresh crash, marker-keyed compaction repair with
# _SUCCESS deleted), staged dormant through round 12 and parity-tested
# at sf0.001 + sf0.01 before registration.
# Positions 6-50: the 45 oldest-verdict canaries — the 14 remaining
# r7-verdict queries, then the first 31 queries of the r8-verdict
# block, unchanged relative order. Displaced r12-window entries keep
# their pass(r12) verdicts and queue at the back of the
# oldest-verdict-first re-audit order.
R13_NEW = [
    "q282_bloom_store_repair",
    "q283_noop_resume_retirement",
    "q284_wholetable_crash_repair",
    "q285_journaled_store_reconciliation",
    "q286_compaction_marker_repair",
]
R13_R7_CANARIES = [
    # the 14 r7-verdict queries no earlier window re-audited,
    # unchanged relative order
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
R13_R8_CANARIES = [
    # the first 31 of the r8-verdict block, unchanged relative order
    "q248_charset_audit",
    "q249_lead_time_stats",
    "q250_unbilled_orders",
    "q103_temperature_mix",
    "q124_epoch_plan",
    "q139_epoch_execute",
    "q01_typed_staging",
    "q02_date_dim",
    "q10_customer_cohort",
    "q11_suspicious_discounts",
    "q12_qa_load_issues",
    "q13_geo_dim",
    "q14_scd2_first_load",
    "q16_semi_join_active",
    "q18_nullsafe_geo_lookup",
    "q19_exact_dedup",
    "q21_lang_id",
    "q23_token_stats",
    "q24_doc_fingerprint",
    "q35_approx_distinct",
    "q36_order_cadence",
    "q39_messy_line_repair",
    "q40_rolling_hash",
    "q41_copurchase_pairs",
    "q43_fuzzy_part_names",
    "q44_set_ops_active_customers",
    "q70_contamination_check",
    "q71_doc_repetition",
    "q73_pii_redaction",
    "q74_embedding_quant",
    "q75_sequence_pack",
]
R13_WINDOW = R13_NEW + R13_R7_CANARIES + R13_R8_CANARIES


def test_registry_counts():
    assert len(QUERIES) == 286
    assert len(ORACLES) == 275
    assert set(ORACLES) <= set(QUERIES)


def test_window_is_50_and_fully_oracled():
    window = list(QUERIES)[:50]
    assert len(window) == 50
    # an audit slot spent on a rows-only query is a wasted slot
    not_oracled = [q for q in window if q not in ORACLES]
    assert not not_oracled, not_oracled


def test_window_composition_matches_coverage_doc():
    window = list(QUERIES)[:50]
    assert len(R13_WINDOW) == 50
    assert window == R13_WINDOW


def test_queue_past_window_is_oldest_verdict_first():
    # past the window the oracled re-audit queue is monotone
    # oldest-verdict-first: FIRST the six r13 partial-oracle upgrades
    # (former rows-only — never hash-audited, so they have the oldest
    # possible oracled verdict: none; the r14 rotation splices them
    # into the window), then the 19 r8-block queries the 31-canary
    # window didn't re-audit, then the r9, r10, r11 and displaced r12
    # blocks, then the rows-only tail closes the registry
    names = list(QUERIES)
    upgraded = names[50:56]
    assert upgraded == [
        "q26_minhash_dedup",
        "q69_sign_lsh_neardup",
        "q72_semantic_dedup",
        "q81_kll_quantiles",
        "q82_theta_distinct",
        "q87_join_overlap_estimate",
    ]
    assert all(n in ORACLES for n in upgraded)
    r8_rest = names[56:75]
    assert r8_rest[0] == "q76_tfidf_topterms"
    assert r8_rest[-1] == "q98_order_count_histogram"
    assert names[75] == "q251_pagerank_checkpoint_resume"  # r9 head
    assert names[125] == "q266_lineitem_contract"  # displaced r10 head
    assert names[175] == "q268_ledger_contract"  # displaced r11 head
    i = names.index("q276_bloom_store_audit")  # displaced r12 head
    assert i == 225
    # the displaced r12 window, in its r12-window order: q276-q281,
    # then the 8 old-r6 + 36 r7-head canaries
    r12_band = names[i : i + 50]
    assert r12_band[:6] == [
        "q276_bloom_store_audit",
        "q277_erasure_crash_repair",
        "q278_bloom_autosize",
        "q279_multicol_bloomed_erasure",
        "q280_compaction_crash_chain",
        "q281_manifest_repair",
    ]
    assert r12_band[6] == "q192_dead_stock"
    assert r12_band[-1] == "q231_hhi_trend"
    assert all(n in ORACLES for n in r12_band)
    # everything after the displaced r12 block is the rows-only tail
    assert all(n not in ORACLES for n in names[i + 50 :])
    assert len(names[i + 50 :]) == 11
