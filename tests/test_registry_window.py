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

# Round-9 window (VERDICT r8 items 1, 3 and 7): catalog growth
# resumes now that the whole catalog is driver-certified. Positions
# 1-15: the fifteen NEW queries — q251-q258 (the round-8 operator
# families, staged dormant through the r8 certification freeze and
# parity-tested at sf0.001 + sf0.01 before registration), q259/q260
# (the damage-class audit queries for snapshot drift and manifest
# consistency), and q261-q265 (item-7 growth: schema evolution under
# snapshot pins, composite-envelope grid erasure, watermark late-event
# audit, ledger-under-log-retention semantics, the incremental-rollup-
# via-diff identity). Positions 16-50: exactly the 35-query r4-verdict
# block — the oldest driver verdicts remaining after r8 re-certified
# the r3 band — as OLDEST-verdict-first canaries; no r5 queries are in
# the window. Displaced r8-window entries keep their pass(r8) verdicts
# and queue at the back of the oldest-verdict-first re-audit order.
R9_NEW = [
    "q251_pagerank_checkpoint_resume",
    "q252_grouped_topk_verified",
    "q253_topk_state_rollup",
    "q254_delivery_ledger",
    "q255_snapshot_as_of",
    "q256_snapshot_ledger",
    "q257_targeted_erasure",
    "q258_snapshot_diff",
    "q259_snapshot_drift_audit",
    "q260_manifest_consistency_audit",
    "q261_schema_evolution_pin",
    "q262_grid_erasure",
    "q263_late_event_audit",
    "q264_log_retention_ledger",
    "q265_incremental_rollup_via_diff",
]
R9_R4_CANARIES = [
    # the full 35-query r4-verdict block, unchanged relative order
    "q99_split_leakage",
    "q100_event_throttle",
    "q101_rolling_distinct_users",
    "q104_vocab_oov",
    "q105_label_cohesion",
    "q106_leakage_safe_split",
    "q107_incremental_exact_dedup",
    "q109_corpus_datacard",
    "q110_content_chunks",
    "q111_chunk_dup_fraction",
    "q112_chunk_dedup_rewrite",
    "q113_pagerank_copurchase",
    "q115_boilerplate_ngrams",
    "q116_rolling_distinct_by_type",
    "q117_kmeans_quantized",
    "q118_embedding_dim_stats",
    "q119_token_rarity",
    "q120_source_overlap",
    "q121_boilerplate_strip",
    "q122_canonical_selection",
    "q125_ngram_novelty",
    "q126_random_projection",
    "q128_rolling_distinct_sketch",
    "q129_event_anomaly",
    "q130_pair_containment",
    "q131_packing_efficiency",
    "q132_dup_cluster_sizes",
    "q133_quality_percentiles_by_source",
    "q137_adaptive_quality_gate",
    "q03_dedup_latest",
    "q04_fact_build",
    "q05_sales_by_brand_rollup",
    "q06_year_month_rollup",
    "q07_slicer_dashboard",
    "q09_top5_parts_per_brand",
]
R9_WINDOW = R9_NEW + R9_R4_CANARIES


def test_registry_counts():
    assert len(QUERIES) == 265
    assert len(ORACLES) == 248
    assert set(ORACLES) <= set(QUERIES)


def test_window_is_50_and_fully_oracled():
    window = list(QUERIES)[:50]
    assert len(window) == 50
    # an audit slot spent on a rows-only query is a wasted slot
    not_oracled = [q for q in window if q not in ORACLES]
    assert not not_oracled, not_oracled


def test_window_composition_matches_coverage_doc():
    window = list(QUERIES)[:50]
    assert len(R9_WINDOW) == 50
    assert window == R9_WINDOW


def test_queue_past_window_is_oldest_verdict_first():
    # past the window the oracled re-audit queue is monotone
    # oldest-verdict-first (r5 remainder, r6 block, r7 block, r8
    # block), then the rows-only tail closes the registry
    names = list(QUERIES)
    assert names[50] == "q15_idempotent_append"  # r5 block head
    assert names[98] == "q150_survivorship_merge"  # r6 block head
    assert names[148] == "q195_benford_audit"  # r7 block head
    i = names.index("q248_charset_audit")  # r8 displaced block head
    assert i == 198
    # the displaced r8 window, in its r8-window order: q248-q250, the
    # q103/q124/q139 refactor trio, the 43 r3-era canaries + q98
    r8_band = names[i : i + 50]
    assert r8_band[:6] == [
        "q248_charset_audit",
        "q249_lead_time_stats",
        "q250_unbilled_orders",
        "q103_temperature_mix",
        "q124_epoch_plan",
        "q139_epoch_execute",
    ]
    assert r8_band[6] == "q01_typed_staging"
    assert r8_band[-1] == "q98_order_count_histogram"
    assert all(n in ORACLES for n in r8_band)
    # everything after the displaced r8 block is the rows-only tail
    assert all(n not in ORACLES for n in names[i + 50 :])
    assert len(names[i + 50 :]) == 17
