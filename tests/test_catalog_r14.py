"""Parity gate for the DORMANT round-14 staging catalog
(plans/catalog_queries_r14.py): every staged query vs its DuckDB
oracle at sf0.001 AND at sf0.01 — the driver's audit scale — so the
r14 rotation is a pure registry splice of already-certified queries.

Deliberately the same comparator as the main gate (tools/parity.compare:
Arrow-canonical types, bit-identical floats, banned boundary types)."""

import duckdb
import pytest

from superstore_data_pipeline_analytics_dashboard__spark.plans.catalog_queries_r14 import (
    R14_ORACLES,
    R14_QUERIES,
)
from superstore_data_pipeline_analytics_dashboard__spark.sources.catalog import TABLES
from tests.conftest import SF_ORACLE, SF_SMOKE  # noqa: F401
from tools.parity import compare

_SFS = [SF_SMOKE, SF_ORACLE]


@pytest.fixture(scope="module", params=_SFS, ids=["sf0.001", "sf0.01"])
def duck_sf(request):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{request.param}/{t}.parquet'"
        )
    yield request.param, con
    con.close()


def test_every_staged_query_has_an_oracle():
    assert set(R14_QUERIES) == set(R14_ORACLES)


@pytest.mark.parametrize("name", sorted(R14_ORACLES))
def test_staged_query_matches_oracle(spark, duck_sf, name):
    sf, con = duck_sf
    df = R14_QUERIES[name](spark, sf)
    problems = compare(name, df, con, R14_ORACLES[name])
    assert not problems, problems


# NOTE: q290, q292 and q293 are the staged queries whose executedPlan
# is a real distributed plan (the incident chains return driver-local
# createDataFrame rows of already-collected scalars — LocalTableScan,
# vacuously clean); their hygiene is pinned here so registration adds
# them to the catalog sweep pre-certified. The mixing queries' only
# SinglePartition exchanges must sit on the bounded length-band grain
# (the scan/rank windows over ~7 rows), never the document grain —
# pinned by asserting the document-grain aggregation shuffles on the
# band key first.


@pytest.mark.parametrize(
    "qname",
    [
        "q290_corpus_release_report",
        "q292_lengthband_waterfill",
        "q293_apportion_schedule",
    ],
)
def test_staged_distributed_plans_are_clean(spark, qname):
    spark.catalog.clearCache()  # CacheManager substitution is order-dependent
    plan = (
        R14_QUERIES[qname](spark, SF_SMOKE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
    if qname != "q290_corpus_release_report":
        # the document-grain rollup must hash-partition on the band key
        # before any order-only (SinglePartition) window runs: the
        # windows themselves then see only the ~7 band rows
        assert "hashpartitioning(band" in plan, plan


def test_staged_names_not_yet_registered():
    # dormancy contract: registration is the r14 rotation commit, which
    # must ALSO rewrite tests/test_registry_window.py — at that point
    # this test is deleted alongside the module's dormancy docstring
    from superstore_data_pipeline_analytics_dashboard__spark.plans.catalog_queries import (
        QUERIES,
    )

    assert not set(R14_QUERIES) & set(QUERIES)
