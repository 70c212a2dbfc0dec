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

# Round-7 window (VERDICT r6 items 1-2): the 50 oldest never-audited
# oracled queries — the backlog head q195-q247 in registry order
# (skipping the rows-only-by-design q220/q235). Deliberately NO
# regression canaries this round (53 backlog vs 50 slots); r8's
# mostly-canary window compensates. q248-q250 + the q103/q124/q139
# refactor trio queue immediately past the window as the r8 head.
R7_WINDOW = (
    [f"q{n}_" for n in range(195, 220)]
    + [f"q{n}_" for n in range(221, 235)]
    + [f"q{n}_" for n in range(236, 243)]
    + [f"q{n}_" for n in range(244, 248)]
)
R8_HEAD = [
    "q248_charset_audit",
    "q249_lead_time_stats",
    "q250_unbilled_orders",
    "q103_temperature_mix",
    "q124_epoch_plan",
    "q139_epoch_execute",
]


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
    assert len(R7_WINDOW) == 50
    for pos, (got, want_prefix) in enumerate(zip(window, R7_WINDOW)):
        assert got.startswith(want_prefix), (pos + 1, got, want_prefix)
    # the r8 head (last 3 never-audited + the refactor trio) queues
    # immediately past the window
    assert list(QUERIES)[50:56] == R8_HEAD


def test_displaced_r6_window_kept_at_back_of_queue():
    # displaced r6-window entries keep their pass(r6) verdicts and sit
    # at the back of the oracled re-audit queue (just before the
    # rows-only block that closes the registry)
    names = list(QUERIES)
    i = names.index("q150_survivorship_merge")
    assert names[i : i + 45] == [
        n for n in names if n.startswith(tuple(f"q{k}_" for k in range(150, 195)))
    ]
    assert names[i + 45 : i + 50] == [
        "q243_tier_disagreement",
        "q88_copurchase_triangles",
        "q123_quota_sample",
        "q134_training_recipe",
        "q08_rolling_30row",
    ]
    # everything after the displaced block is the rows-only tail
    assert all(n not in ORACLES for n in names[i + 50 :])
