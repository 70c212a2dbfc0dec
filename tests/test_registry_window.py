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

# Round-6 window (VERDICT r5 items 1 + 6): the never-audited backlog
# head q150-q194 in registry order, the two queries round 6 changed,
# and three regression canaries held from the r5 window.
R6_WINDOW_HEAD = [f"q{n}_" for n in range(150, 195)]
R6_WINDOW_TAIL = [
    "q243_tier_disagreement",
    "q88_copurchase_triangles",
    "q123_quota_sample",
    "q134_training_recipe",
    "q08_rolling_30row",
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
    for pos, (got, want_prefix) in enumerate(zip(window, R6_WINDOW_HEAD)):
        assert got.startswith(want_prefix), (pos + 1, got, want_prefix)
    assert window[45:] == R6_WINDOW_TAIL
