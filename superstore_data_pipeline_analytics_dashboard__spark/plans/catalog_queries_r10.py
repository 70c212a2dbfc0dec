"""Round-10 staging catalog: the declarative data-contract operator
(operators/expectations.py) as gate-ready queries + DuckDB oracles,
NOT yet registered.

Why staged DORMANT: the round-9 audit window is a pinned contract
(tests/test_registry_window.py — q251–q265 + the full r4-verdict
canary block). These queries are fully written, canon-wrapped and
parity-tested at sf0.001 AND sf0.01 (tests/test_catalog_r10.py), and
registration is a round-10 rotation step: MERGE this module's body
into ``catalog_queries.py`` ahead of the registry (exactly as the r9
rotation merged catalog_queries_r9.py — a back-import from
catalog_queries would be circular, since this module imports
``_canon_query``/``_li`` from it), splice the queries at the window
head, update tests/test_registry_window.py + COVERAGE.md, and delete
this docstring's dormancy paragraph plus the dormancy pin test.

Same conventions as :mod:`catalog_queries`: aliases identical on both
sides, exact BIGINT counts, violation rates as integer ppm (positive
operands — Spark ``div`` ≡ DuckDB ``//``), no doubles anywhere in the
output.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.expectations import (
    Expectation,
    check_expectations,
    enforce_expectations,
)
from ..sources.catalog import load_table
from .catalog_queries import _canon_query, _li


# ------------------------------------------------- data contracts
#
# q266: the CHECK face — a five-line contract over lineitem with every
# verdict class represented on real data: passing error lines with
# zero budget (returnflag domain, positive price), a passing warn line
# with measured headroom (quantity cap: ~99k ppm against a 200k
# budget), a FAILING warn line (deep discounts run ~448k ppm against a
# 400k budget at every SF — the generator's uniform discount makes the
# rate scale-stable), all from ONE conditional-aggregation scan. The
# oracle recomputes every count, the integer-ppm division, and the
# verdict booleans. q267: the ENFORCE face — a referential contract
# over the orders←lineitem join certifying the gate's pass path (the
# collected-and-rebuilt report must hash-match SQL): unbilled parents
# run ~17k ppm against a 25k warn budget... no — see inline: the warn
# line FAILS its 10k budget (visible in the report, non-blocking),
# while the error lines pass, so the gate RETURNS rather than raises —
# certifying severity routing end to end, not just arithmetic.

def q266_lineitem_contract(spark: SparkSession, sf: str) -> DataFrame:
    li = _li(spark, sf)
    contract = {
        "returnflag_domain": Expectation(
            F.col("l_returnflag").isNull()
            | ~F.col("l_returnflag").isin("A", "N", "R")
        ),
        "positive_price": Expectation(F.col("l_extendedprice") <= 0),
        "key_not_null": Expectation(
            F.col("l_orderkey").isNull() | F.col("l_partkey").isNull()
        ),
        "qty_cap": Expectation(
            F.col("l_quantity") > 45, max_ppm=200_000, severity="warn"
        ),
        "deep_discount": Expectation(
            F.col("l_discount") > 0.05, max_ppm=400_000, severity="warn"
        ),
    }
    return check_expectations(li, contract)


Q266_SQL = """
WITH c AS (
  SELECT count(*) AS n,
    count(*) FILTER (WHERE l_returnflag NOT IN ('A','N','R')
                        OR l_returnflag IS NULL) AS v_rf,
    count(*) FILTER (WHERE l_extendedprice <= 0) AS v_px,
    count(*) FILTER (WHERE l_orderkey IS NULL
                        OR l_partkey IS NULL) AS v_nk,
    count(*) FILTER (WHERE l_quantity > 45) AS v_q,
    count(*) FILTER (WHERE l_discount > 0.05) AS v_d
  FROM lineitem
), e AS (
  SELECT 'returnflag_domain' AS expectation, 'error' AS severity,
         v_rf AS v, CAST(0 AS BIGINT) AS max_ppm FROM c
  UNION ALL
  SELECT 'positive_price', 'error', v_px, 0 FROM c
  UNION ALL
  SELECT 'key_not_null', 'error', v_nk, 0 FROM c
  UNION ALL
  SELECT 'qty_cap', 'warn', v_q, 200000 FROM c
  UNION ALL
  SELECT 'deep_discount', 'warn', v_d, 400000 FROM c
)
SELECT expectation, severity, c.n AS n_rows,
       CAST(v AS BIGINT) AS n_violations,
       CAST(v * 1000000 // c.n AS BIGINT) AS violation_ppm,
       max_ppm,
       v * 1000000 // c.n <= max_ppm AS passed
FROM e, c
"""


def q267_referential_gate(spark: SparkSession, sf: str) -> DataFrame:
    orders = load_table(spark, sf, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    li_keys = (
        _li(spark, sf).select(F.col("l_orderkey").alias("lk")).distinct()
    )
    joined = orders.join(
        li_keys, orders["o_orderkey"] == F.col("lk"), "left"
    )
    contract = {
        "order_key_not_null": Expectation(F.col("o_orderkey").isNull()),
        "positive_total": Expectation(F.col("o_totalprice") <= 0),
        # the generator plants unbilled orders (~17k ppm, the q250
        # family): over the 10k warn budget at every SF — the gate must
        # REPORT the failure and still return (severity routing)
        "orders_have_lines": Expectation(
            F.col("lk").isNull(), max_ppm=10_000, severity="warn"
        ),
    }
    return enforce_expectations(joined, contract)


Q267_SQL = """
WITH j AS (
  SELECT o.o_orderkey, o.o_totalprice, l.l_orderkey AS lk
  FROM orders o
  LEFT JOIN (SELECT DISTINCT l_orderkey FROM lineitem) l
    ON o.o_orderkey = l.l_orderkey
), c AS (
  SELECT count(*) AS n,
    count(*) FILTER (WHERE o_orderkey IS NULL) AS v_k,
    count(*) FILTER (WHERE o_totalprice <= 0) AS v_t,
    count(*) FILTER (WHERE lk IS NULL) AS v_u
  FROM j
), e AS (
  SELECT 'order_key_not_null' AS expectation, 'error' AS severity,
         v_k AS v, CAST(0 AS BIGINT) AS max_ppm FROM c
  UNION ALL
  SELECT 'positive_total', 'error', v_t, 0 FROM c
  UNION ALL
  SELECT 'orders_have_lines', 'warn', v_u, 10000 FROM c
)
SELECT expectation, severity, c.n AS n_rows,
       CAST(v AS BIGINT) AS n_violations,
       CAST(v * 1000000 // c.n AS BIGINT) AS violation_ppm,
       max_ppm,
       v * 1000000 // c.n <= max_ppm AS passed
FROM e, c
"""


# ---------------------------------------------------------- registry
#
# Dormant: consumed only by tests/test_catalog_r10.py until the r10
# rotation merges this module into catalog_queries.py and splices
# these dicts at the main registry's window head.

R10_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "q266_lineitem_contract": q266_lineitem_contract,
    "q267_referential_gate": q267_referential_gate,
}
R10_ORACLES: dict[str, str] = {
    "q266_lineitem_contract": Q266_SQL,
    "q267_referential_gate": Q267_SQL,
}

R10_QUERIES = {name: _canon_query(fn) for name, fn in R10_QUERIES.items()}
