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

# Round-8 window (VERDICT r7 item 1): finish driver certification.
# Positions 1-3: the last 3 never-driver-audited queries. Positions
# 4-6: the q103/q124/q139 refactor trio (r4 greens whose r5
# composition refactor is output-identical). Positions 7-50: 44
# regression canaries, OLDEST-verdict-first — all 43 queries whose
# most recent driver verdict is round 3, plus q98 (the first
# r4-verdict query in prior registry order) as the 44th. After this
# round the never-audited backlog is 0 and every oracled query holds
# a driver verdict no older than r4 — catalog growth resumes
# (VERDICT r7 item 6), with new queries landing at the window head.
R8_NEVER_AUDITED = [
    "q248_charset_audit",
    "q249_lead_time_stats",
    "q250_unbilled_orders",
]
R8_REFACTOR_TRIO = [
    "q103_temperature_mix",
    "q124_epoch_plan",
    "q139_epoch_execute",
]
R8_CANARIES = [
    # the 43 r3-verdict queries, unchanged relative order
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
    "q76_tfidf_topterms",
    "q77_source_mix",
    "q78_event_funnel",
    "q79_heavy_join_keys",
    "q80_cms_heavy_hitters",
    "q83_cdc_apply",
    "q84_length_outliers",
    "q85_zorder_key",
    "q86_token_chunks",
    "q89_apply_source_mix",
    "q90_profit_by_nation_year",
    "q91_bilateral_volume",
    "q92_hierarchy_shares",
    "q93_incremental_rollup",
    "q94_distinct_under_rollup",
    "q95_order_history_nested",
    "q96_gap_filled_daily_revenue",
    "q97_drift_chi2",
    # 44th canary: first r4-verdict query in prior registry order
    "q98_order_count_histogram",
]
R8_WINDOW = R8_NEVER_AUDITED + R8_REFACTOR_TRIO + R8_CANARIES


def test_registry_counts():
    assert len(QUERIES) == 250
    assert len(ORACLES) == 233
    assert set(ORACLES) <= set(QUERIES)


def test_window_is_50_and_fully_oracled():
    window = list(QUERIES)[:50]
    assert len(window) == 50
    # an audit slot spent on a rows-only query is a wasted slot
    not_oracled = [q for q in window if q not in ORACLES]
    assert not not_oracled, not_oracled


def test_window_composition_matches_coverage_doc():
    window = list(QUERIES)[:50]
    assert len(R8_WINDOW) == 50
    assert window == R8_WINDOW


def test_queue_past_window_is_oldest_verdict_first():
    # past the window the oracled re-audit queue is monotone
    # oldest-verdict-first (r4 block, r5 block, r6 block, r7 block),
    # then the rows-only tail closes the registry
    names = list(QUERIES)
    assert names[50] == "q99_split_leakage"  # r4 block head
    assert names[85] == "q15_idempotent_append"  # r5 block head
    assert names[133] == "q150_survivorship_merge"  # r6 block head
    i = names.index("q195_benford_audit")  # r7 displaced block
    # numeric span 195-247 minus q220/q235 (rows-only by design) and
    # q243 (re-audited in r6, lives in the r6 block) = 50
    r7_band = [
        n
        for n in names
        if n.startswith(tuple(f"q{k}_" for k in range(195, 248)))
        and n in ORACLES
        and n != "q243_tier_disagreement"
    ]
    assert names[i : i + 50] == r7_band
    assert len(r7_band) == 50
    # everything after the displaced r7 block is the rows-only tail
    assert all(n not in ORACLES for n in names[i + 50 :])
    assert len(names[i + 50 :]) == 17
