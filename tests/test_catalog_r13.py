"""Parity gate for the DORMANT round-13 staging catalog
(plans/catalog_queries_r13.py): every staged query vs its DuckDB
oracle at sf0.001 AND at sf0.01 — the driver's audit scale — so the
r13 rotation is a pure registry splice of already-certified queries.

Deliberately the same comparator as the main gate (tools/parity.compare:
Arrow-canonical types, bit-identical floats, banned boundary types)."""

import duckdb
import pytest

from superstore_data_pipeline_analytics_dashboard__spark.plans.catalog_queries_r13 import (
    R13_ORACLES,
    R13_QUERIES,
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
    assert set(R13_QUERIES) == set(R13_ORACLES)


@pytest.mark.parametrize("name", sorted(R13_ORACLES))
def test_staged_query_matches_oracle(spark, duck_sf, name):
    sf, con = duck_sf
    df = R13_QUERIES[name](spark, sf)
    problems = compare(name, df, con, R13_ORACLES[name])
    assert not problems, problems


# NOTE: no plan-hygiene sweep here, deliberately — every r13 staged
# query returns a driver-local createDataFrame of already-collected
# scalars, so its executedPlan is a LocalTableScan that could never
# contain an anti-pattern regardless of what the internal jobs did
# (the sweep would re-run five heavyweight crash/repair scenarios to
# assert a vacuous property). The operators these queries exercise
# carry their own plan pins in test_bloom.py / test_retention.py.


def test_staged_names_not_yet_registered():
    # dormancy contract: registration is the r13 rotation commit, which
    # must ALSO rewrite tests/test_registry_window.py — at that point
    # this test is deleted alongside the module's dormancy docstring
    from superstore_data_pipeline_analytics_dashboard__spark.plans.catalog_queries import (
        QUERIES,
    )

    assert not set(R13_QUERIES) & set(QUERIES)
