"""Round-9 staging catalog: the round-8 operator families
(checkpoint/restart, grouped top-k tiers, exactly-once sink audit,
snapshot pinning, compliance erasure) as gate-ready queries + DuckDB
oracles, NOT yet registered.

Why a separate module: the r8 audit window is a pinned contract
(tests/test_registry_window.py — certification-first, zero new
queries until CORRECTNESS_r08 lands). These queries are therefore
staged DORMANT: fully written, canon-wrapped, parity-tested at
sf0.001 AND sf0.01 (tests/test_catalog_r9.py), but absent from the
main ``QUERIES``/``ORACLES`` dicts. Registration is round 9's first
commit: splice ``R9_QUERIES``/``R9_ORACLES`` at the window HEAD
(VERDICT r7 item 6: growth resumes with new queries at positions
1..n), update tests/test_registry_window.py and COVERAGE.md's window
paragraph in the same commit, and delete this docstring's dormancy
paragraph.

Same conventions as :mod:`catalog_queries` (aliases identical on both
sides, no DECIMAL/TIMESTAMP at the boundary, total-order windows,
BIGINT casts over every DuckDB sum that would widen to HUGEINT).
"""

from __future__ import annotations

import shutil
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.graph import pagerank
from ..operators.topk import (
    grouped_topk_verified,
    topk_from_states,
    topk_state,
)
from ..sources.catalog import load_table
from ..sources.manifest import collect_file_stats
from ..sources.retention import erase_rows
from ..sources.snapshots import (
    commit_snapshot,
    read_as_of,
    snapshot_diff,
    snapshot_ledger,
)
from ..streaming.audit import exactly_once_audit
from .catalog_queries import Q113_SQL, _canon_query, _li


# ------------------------------------------------- checkpoint/restart
#
# The operational face of 100 TB iteration (operators/checkpoint.py):
# a resumed run must be BIT-IDENTICAL to an uninterrupted one. q251
# makes that claim driver-auditable: it runs the q113 copurchase
# PageRank to iteration 2 WITH a checkpoint dir (two node-sized state
# parquets land eagerly inside the call), then issues the iters=3 call
# against the same dir — which must LOAD v000002 and execute only the
# third round. The oracle is q113's own 3-iteration unrolled CTE, so a
# resume that silently restarted from iteration 0 with damaged state,
# or double-applied a round, hash-mismatches. Exact BIGINT fixed-point
# state is what makes this a value equality, not a tolerance check.

def q251_pagerank_checkpoint_resume(
    spark: SparkSession, sf: str
) -> DataFrame:
    # fresh dir per invocation: checkpoint state is stamped with the
    # operator config (damping, scale) but NOT the input scale factor,
    # so reusing a dir across sf0.001/sf0.01 runs would resume one
    # scale's ranks against the other's edges
    ckpt = tempfile.mkdtemp(prefix="q251_pr_ckpt_")

    # same copurchase edge derivation as q113 (its oracle is q251's
    # oracle, so the constructions must stay in lockstep — the r9
    # rotation commit extracts a shared _copurchase_edges helper in
    # catalog_queries.py; deferred now to keep q113's registered plan
    # byte-untouched during the certification round)
    li = _li(spark, sf).select("l_orderkey", "l_partkey").distinct()
    a, b = li.alias("a"), li.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("pa"), F.col("b.l_partkey").alias("pb")
        )
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= 2)
    )
    # persisted here because BOTH pagerank calls consume it (pagerank
    # persists and unpersists its own projection internally, so nothing
    # survives between the calls without this outer persist)
    edges = (
        pairs.select(
            F.explode(
                F.array(
                    F.struct(F.col("pa").alias("src"), F.col("pb").alias("dst")),
                    F.struct(F.col("pb").alias("src"), F.col("pa").alias("dst")),
                )
            ).alias("e")
        )
        .select("e.src", "e.dst")
        .persist()
    )

    # interrupted run: checkpoints v1, v2 are written EAGERLY (each
    # save is a parquet write action); the returned frame is unused
    pagerank(edges, iters=2, damping=0.85, checkpoint_dir=ckpt)
    # resumed run: loads v000002, executes round 3 only
    pr = pagerank(edges, iters=3, damping=0.85, checkpoint_dir=ckpt)
    out = pr.select(F.col("node").alias("part"), "rank")
    # the final ranks were reloaded from the round-3 checkpoint files
    # (pagerank saves the last round and reloads after each save), so
    # the result must be detached from BOTH the edge cache and the
    # about-to-be-deleted checkpoint dir before cleanup
    out = out.localCheckpoint(eager=True)
    edges.unpersist()
    shutil.rmtree(ckpt, ignore_errors=True)
    return out


# q113's oracle IS q251's oracle: resume must equal straight-through.
Q251_SQL = Q113_SQL


# ---------------------------------------------------- grouped top-k
#
# operators/topk.py verified tier: sketch-nominated candidates
# (one bounded approx_top_k pass — the shuffle carries one state row
# per group per map partition, never the distinct key space), exact
# broadcast-join recount, total-order (cnt DESC, key ASC) cut. In the
# exact regime (distinct parts per flag ≈ 2k at sf0.01, 20k at sf0.1,
# both < max_items_tracked) the nomination is lossless, so the result
# equals the full groupBy answer — which is exactly what the plain-SQL
# oracle computes. Beyond the regime the sketch guarantee (tracked if
# freq > N_group/max_items_tracked) takes over and the EXACT tier is
# the audit path — the tier positioning the module docstring states.

def q252_grouped_topk_verified(spark: SparkSession, sf: str) -> DataFrame:
    li = _li(spark, sf)
    out = grouped_topk_verified(
        li,
        group_cols=["l_returnflag"],
        key_col="l_partkey",
        k=10,
        max_items_tracked=65536,
    )
    # row_number is INT on Spark, BIGINT on DuckDB — widen here
    return out.withColumn("rank", F.col("rank").cast("long"))


Q252_SQL = """
WITH c AS (
  SELECT l_returnflag, l_partkey AS key, count(*) AS cnt
  FROM lineitem GROUP BY 1, 2
), r AS (
  SELECT l_returnflag, key, cnt,
         row_number() OVER (
           PARTITION BY l_returnflag ORDER BY cnt DESC, key ASC
         ) AS rank
  FROM c
)
SELECT l_returnflag, key, cnt, rank FROM r WHERE rank <= 10
"""


# ------------------------------------------- mergeable sketch states
#
# The q128/q138 day-sketch pattern on the oracle gate: accumulate one
# approx_top_k state row per (l_returnflag, l_linestatus) ingest grain,
# then roll up to l_linestatus with approx_top_k_combine — cost ∝ state
# rows, raw data never re-scanned. In the exact regime (per-sketch AND
# combined distinct keys < max_items_tracked — the DataSketches
# frequent-items exact mode) every counter is exact, so the rollup
# hash-matches the plain recount oracle. The parquet round-trip of the
# state blob is pinned separately (tests/test_topk.py) — the query
# keeps the states in-plan so the gate run stays write-free.

def q253_topk_state_rollup(spark: SparkSession, sf: str) -> DataFrame:
    li = _li(spark, sf)
    states = topk_state(
        li,
        group_cols=["l_linestatus", "l_returnflag"],
        key_col="l_partkey",
        max_items_tracked=65536,
    )
    out = topk_from_states(
        states,
        group_cols=["l_linestatus"],
        k=15,
        max_items_tracked=65536,
    )
    return out.withColumn("rank", F.col("rank").cast("long"))


Q253_SQL = """
WITH c AS (
  SELECT l_linestatus, l_partkey AS key, count(*) AS cnt
  FROM lineitem GROUP BY 1, 2
), r AS (
  SELECT l_linestatus, key, cnt,
         row_number() OVER (
           PARTITION BY l_linestatus ORDER BY cnt DESC, key ASC
         ) AS rank
  FROM c
)
SELECT l_linestatus, key, cnt, rank FROM r WHERE rank <= 15
"""


# --------------------------------------------- exactly-once ledger
#
# streaming/audit.exactly_once_audit over a deterministically FAULTED
# sink: drop every 89th order key (a lost batch), replay every 97th (a
# retry between sink write and checkpoint commit), and inject phantom
# keys the source never had (a sink path collision) — the three
# failure modes the module docstring names, each planted so the ledger
# must report a non-zero count for it. Keys divisible by both 89 and
# 97 land exactly once (dropped, then replayed) — the ledger correctly
# reads them as neither over- nor under-delivered. Every output is an
# exact integer from one full-outer key join; the oracle is the same
# arithmetic in ANSI SQL.

def q254_delivery_ledger(spark: SparkSession, sf: str) -> DataFrame:
    src = load_table(spark, sf, "orders").select("o_orderkey")
    delivered = src.filter(F.col("o_orderkey") % 89 != 0)
    replayed = src.filter(F.col("o_orderkey") % 97 == 0)
    phantom = src.filter(F.col("o_orderkey") % 101 == 0).select(
        (F.col("o_orderkey") + F.lit(10_000_000)).alias("o_orderkey")
    )
    sink = delivered.unionByName(replayed).unionByName(phantom)
    return exactly_once_audit(src, sink, ["o_orderkey"], expect="all_rows")


Q254_SQL = """
WITH src AS (SELECT o_orderkey FROM orders),
snk AS (
  SELECT o_orderkey FROM orders WHERE o_orderkey % 89 <> 0
  UNION ALL
  SELECT o_orderkey FROM orders WHERE o_orderkey % 97 = 0
  UNION ALL
  SELECT o_orderkey + 10000000 AS o_orderkey FROM orders
  WHERE o_orderkey % 101 = 0
),
s AS (SELECT o_orderkey, count(*) AS n_src FROM src GROUP BY 1),
k AS (SELECT o_orderkey, count(*) AS n_snk FROM snk GROUP BY 1),
j AS (
  SELECT coalesce(s.n_src, 0) AS n_src, coalesce(k.n_snk, 0) AS n_snk
  FROM s FULL OUTER JOIN k USING (o_orderkey)
),
g AS (
  SELECT n_src, n_snk,
         greatest(n_snk - n_src, 0) AS over_rows,
         greatest(n_src - n_snk, 0) AS under_rows
  FROM j
),
rep AS (
  SELECT
    CAST(coalesce(sum(n_src), 0) AS BIGINT) AS n_source_rows,
    CAST(coalesce(sum(CASE WHEN n_src > 0 THEN 1 END), 0) AS BIGINT)
      AS n_source_keys,
    CAST(coalesce(sum(n_snk), 0) AS BIGINT) AS n_sink_rows,
    CAST(coalesce(sum(CASE WHEN n_snk > 0 THEN 1 END), 0) AS BIGINT)
      AS n_sink_keys,
    CAST(coalesce(sum(CASE WHEN n_src > 0 AND over_rows > 0 THEN 1 END),
                  0) AS BIGINT) AS n_over_keys,
    CAST(coalesce(sum(CASE WHEN n_src > 0 THEN over_rows ELSE 0 END),
                  0) AS BIGINT) AS n_over_rows,
    CAST(coalesce(sum(CASE WHEN under_rows > 0 THEN 1 END), 0) AS BIGINT)
      AS n_under_keys,
    CAST(coalesce(sum(under_rows), 0) AS BIGINT) AS n_under_rows,
    CAST(coalesce(sum(CASE WHEN n_src = 0 AND n_snk > 0 THEN 1 END), 0)
      AS BIGINT) AS n_unexpected_keys
  FROM g
)
SELECT *,
       (n_over_rows = 0 AND n_under_rows = 0 AND n_unexpected_keys = 0)
         AS exactly_once
FROM rep
"""


# ------------------------------------------------ snapshot pinning
#
# sources/snapshots.py: reproducible "as of" reads over the
# batch-partitioned manifest sink. Both queries build a real two-batch
# sink + manifest + snapshot log on disk (fresh tmp dir per call, same
# reasoning as q251), landing orders split by key parity as two ingest
# batches with a snapshot commit after each — then certify that the
# VERSION-1 pin still reads exactly batch 0 after the table grew
# (q255), and that the commit ledger's per-version rollups and
# rows_added deltas are the exact batch arithmetic (q256). Both
# oracles derive from the orders table alone: the entire
# write→commit→pin→read round-trip through real parquet must land on
# numbers DuckDB computes without ever seeing the sink.

def _land_orders_two_batches(
    spark: SparkSession, sf: str
) -> tuple[str, str, str]:
    """orders keys land as batch 0 (even keys) then batch 1 (odd), with
    manifest rows and a snapshot commit after each — the sink layout of
    streaming/incremental.start_append_with_manifest, built directly."""
    base = tempfile.mkdtemp(prefix="q255_snap_")
    sink, man, log = f"{base}/sink", f"{base}/man", f"{base}/log"
    orders = load_table(spark, sf, "orders").select("o_orderkey")
    for batch_id, keep in ((0, 0), (1, 1)):
        part = orders.filter(F.col("o_orderkey") % 2 == keep)
        part.coalesce(1).write.mode("overwrite").parquet(
            f"{sink}/batch={batch_id}"
        )
        stats = collect_file_stats(
            spark, f"{sink}/batch={batch_id}", ["o_orderkey"]
        ).withColumn("batch", F.lit(batch_id))
        (
            stats.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch")
            .parquet(man)
        )
        commit_snapshot(spark, man, log)
    return sink, man, log


def _detach_and_clean(out: DataFrame, sink: str) -> DataFrame:
    """Materialize a result that still reads from the scratch sink
    (localCheckpoint detaches it from the files), then delete the
    scratch tree — repeated gate/bench/census invocations must not
    accumulate /tmp copies of the orders table."""
    out = out.localCheckpoint(eager=True)
    shutil.rmtree(sink.rsplit("/", 1)[0], ignore_errors=True)
    return out


def q255_snapshot_as_of(spark: SparkSession, sf: str) -> DataFrame:
    sink, _, log = _land_orders_two_batches(spark, sf)
    return _detach_and_clean(
        read_as_of(spark, sink, log, 1).select("o_orderkey"), sink
    )


Q255_SQL = """
SELECT o_orderkey FROM orders WHERE o_orderkey % 2 = 0
"""


def q256_snapshot_ledger(spark: SparkSession, sf: str) -> DataFrame:
    sink, _, log = _land_orders_two_batches(spark, sf)
    return _detach_and_clean(snapshot_ledger(spark, log), sink)


# coalesce(1) pins n_files to one per landed batch, so the ledger is
# pure batch arithmetic over the even/odd key split
Q256_SQL = """
WITH c AS (
  SELECT count(*) FILTER (WHERE o_orderkey % 2 = 0) AS even_rows,
         count(*) AS total_rows
  FROM orders
)
SELECT CAST(1 AS BIGINT) AS version, CAST(1 AS BIGINT) AS n_batches,
       CAST(1 AS BIGINT) AS n_files, even_rows AS n_rows,
       even_rows AS rows_added
FROM c
UNION ALL
SELECT CAST(2 AS BIGINT), CAST(2 AS BIGINT), CAST(2 AS BIGINT),
       total_rows, total_rows - even_rows
FROM c
"""


def q258_snapshot_diff(spark: SparkSession, sf: str) -> DataFrame:
    """Incremental-training read: everything added between pin v1 and
    pin v2 — here, exactly the second (odd-key) ingest batch. Batch-set
    difference + static partition filter; no row-level anti-join."""
    sink, _, log = _land_orders_two_batches(spark, sf)
    return _detach_and_clean(
        snapshot_diff(spark, sink, log, 1, 2).select("o_orderkey"), sink
    )


Q258_SQL = """
SELECT o_orderkey FROM orders WHERE o_orderkey % 2 = 1
"""


# ------------------------------------------------ compliance erasure
#
# sources/retention.py: right-to-be-forgotten deletes as
# manifest-pruned targeted partition rewrites. The sink lands orders
# RANGE-clustered (keys ≤ max/2 → batch 0, rest → batch 1 — the layout
# where zone-map envelopes can prune), the opt-out list is every 100th
# key in the LOW half, and the query returns the erasure report: batch
# 0 rewritten with the exact erased count, batch 1 untouched because
# its envelope provably cannot contain a doomed key. The oracle
# recomputes the whole report from orders arithmetic — so the
# prune-decide-rewrite-restat machinery, run against real files, must
# land on DuckDB's numbers.

def q257_targeted_erasure(spark: SparkSession, sf: str) -> DataFrame:
    base = tempfile.mkdtemp(prefix="q257_erase_")
    sink, man = f"{base}/sink", f"{base}/man"
    orders = load_table(spark, sf, "orders").select("o_orderkey")
    half = orders.agg(F.expr("max(o_orderkey) div 2").alias("h")).collect()[
        0
    ]["h"]
    for batch_id, part in (
        (0, orders.filter(F.col("o_orderkey") <= half)),
        (1, orders.filter(F.col("o_orderkey") > half)),
    ):
        part.coalesce(1).write.mode("overwrite").parquet(
            f"{sink}/batch={batch_id}"
        )
        stats = collect_file_stats(
            spark, f"{sink}/batch={batch_id}", ["o_orderkey"]
        ).withColumn("batch", F.lit(batch_id))
        (
            stats.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch")
            .parquet(man)
        )
    optout = orders.filter(
        (F.col("o_orderkey") % 100 == 0) & (F.col("o_orderkey") <= half)
    )
    rep = erase_rows(spark, sink, man, "o_orderkey", optout)
    # the report is createDataFrame'd from driver-side scalars — already
    # detached from the scratch sink, which can go immediately
    shutil.rmtree(base, ignore_errors=True)
    return rep


Q257_SQL = """
WITH h AS (SELECT max(o_orderkey) // 2 AS half FROM orders),
lo AS (SELECT count(*) AS n FROM orders, h WHERE o_orderkey <= half),
hi AS (SELECT count(*) AS n FROM orders, h WHERE o_orderkey > half),
er AS (SELECT count(*) AS n FROM orders, h
       WHERE o_orderkey % 100 = 0 AND o_orderkey <= half)
SELECT CAST(0 AS BIGINT) AS batch, true AS rewritten,
       lo.n AS rows_before, er.n AS rows_erased,
       lo.n - er.n AS rows_after
FROM lo, er
UNION ALL
SELECT CAST(1 AS BIGINT) AS batch, false AS rewritten,
       hi.n AS rows_before, CAST(0 AS BIGINT) AS rows_erased,
       hi.n AS rows_after
FROM hi
"""


# ---------------------------------------------------------- registry
#
# Dormant: consumed only by tests/test_catalog_r9.py until the r9
# rotation splices these dicts at the main registry's window head.

R9_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "q251_pagerank_checkpoint_resume": q251_pagerank_checkpoint_resume,
    "q252_grouped_topk_verified": q252_grouped_topk_verified,
    "q253_topk_state_rollup": q253_topk_state_rollup,
    "q254_delivery_ledger": q254_delivery_ledger,
    "q255_snapshot_as_of": q255_snapshot_as_of,
    "q256_snapshot_ledger": q256_snapshot_ledger,
    "q257_targeted_erasure": q257_targeted_erasure,
    "q258_snapshot_diff": q258_snapshot_diff,
}
R9_ORACLES: dict[str, str] = {
    "q251_pagerank_checkpoint_resume": Q251_SQL,
    "q252_grouped_topk_verified": Q252_SQL,
    "q253_topk_state_rollup": Q253_SQL,
    "q254_delivery_ledger": Q254_SQL,
    "q255_snapshot_as_of": Q255_SQL,
    "q256_snapshot_ledger": Q256_SQL,
    "q257_targeted_erasure": Q257_SQL,
    "q258_snapshot_diff": Q258_SQL,
}

R9_QUERIES = {name: _canon_query(fn) for name, fn in R9_QUERIES.items()}
