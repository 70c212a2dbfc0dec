"""The driver's correctness gate, replicated locally: every queries()
entry vs its DuckDB oracle_sql() at sf0.001 (fast; sf0.01 via
`python tools/parity.py /root/testdata/sf0.01`)."""

import duckdb
import pytest

from superstore_data_pipeline_analytics_dashboard__spark.sources.catalog import TABLES
from tests.conftest import SF_SMOKE
from tools.parity import compare

import __spark_entry__ as entrymod

_QUERIES = entrymod.queries()
_ORACLES = entrymod.oracle_sql()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_SMOKE}/{t}.parquet'")
    yield con


@pytest.mark.parametrize("name", sorted(_ORACLES))
def test_query_matches_oracle(spark, duck, name):
    df = _QUERIES[name](spark, SF_SMOKE)
    problems = compare(name, df, duck, _ORACLES[name])
    assert not problems, problems


@pytest.mark.parametrize("name", sorted(set(_QUERIES) - set(_ORACLES)))
def test_rows_only_queries_run(spark, name):
    assert _QUERIES[name](spark, SF_SMOKE).count() >= 0


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
