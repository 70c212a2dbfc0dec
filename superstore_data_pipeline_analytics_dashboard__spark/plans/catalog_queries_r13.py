"""Round-13 staging catalog — five gate-ready queries + DuckDB
oracles, NOT yet registered: the targeted Bloom-store repair over
four damage classes planted at once (q282), the no-op-resume journal
retirement that breaks the vacuum-refusal loop (q283), the
whole-table-erasure crash repair over a fully-emptied manifest
(q284), the journaled-store reconciliation through a crash between
the sink swap and the store refresh (q285), and compaction crash
repair keyed on the writer-independent commit marker (q286) — the
r12 operator families (``sources/bloom.py:repair_bloom_store``, the
hardened ``sources/retention.py:repair_erasure`` resume paths, the
``sources/formats.py`` compaction durability marker) under the
driver's gate.

Why staged DORMANT: the round-12 audit window is a pinned contract
(tests/test_registry_window.py — q276–q281 + the 44-query
oldest-verdict canary block). These queries are fully written,
canon-wrapped and parity-tested at sf0.001 AND sf0.01
(tests/test_catalog_r13.py), and registration is a round-13 rotation
step: MERGE this module's body into ``catalog_queries.py`` ahead of
the registry (exactly as the r9–r12 rotations merged their staging
modules — a back-import from catalog_queries would be circular,
since this module imports ``_canon_query``/``_scratch`` from it),
splice the queries at the window head, update
tests/test_registry_window.py + COVERAGE.md, and delete this
docstring's dormancy paragraph plus the dormancy pin test.

Same conventions as :mod:`catalog_queries`: aliases identical on both
sides, exact BIGINT counts, guarantee booleans oracle-pinned at
literal true/false (a broken guarantee is a hash mismatch, not silent
drift), integer arithmetic only.
"""

from __future__ import annotations

import json
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from .catalog_queries import _canon_query, _scratch



def _orderkey_manifest(spark: SparkSession, sink: str, man: str) -> None:
    """Per-file (n_rows, min/max o_orderkey) manifest rows for a
    batch-partitioned o_orderkey sink — the landing contract the
    erasure/repair chains read envelopes from. Built ONCE here for the
    three crash-chain fixtures below: a drifting copy of this block
    would be an SF-dependent parity mismatch at rotation time."""
    src = spark.read.option("basePath", sink).parquet(sink)
    (
        src.select(
            F.input_file_name().alias("file"), "batch", "o_orderkey"
        )
        .groupBy("file", "batch")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("o_orderkey").alias("min_o_orderkey"),
            F.max("o_orderkey").alias("max_o_orderkey"),
        )
        .select(
            "file", "n_rows", "min_o_orderkey", "max_o_orderkey", "batch"
        )
        .write.partitionBy("batch")
        .parquet(man)
    )


# ------------------------------------------- targeted bloom-store repair
#
# q282: the r12 repair_bloom_store under the gate — all four audit
# damage classes planted AT ONCE on a five-batch residue sink (an
# out-of-band append the store never saw, a replayed batch whose
# recorded n_keys no longer matches, a dropped batch whose summary
# survived as an orphan, and a corrupted out-of-range position — the
# silent false-negative vector), repaired in ONE call. The repair is
# TARGETED: the untouched batch's summary row must survive
# byte-identical (untouched_identical is the guarantee boolean a full
# rebuild would break only by luck — it is pinned by comparing the
# recorded row before and after), per-class counts are exact, and the
# repaired store's total key count is oracle-recomputed from orders
# residue arithmetic.

def q282_bloom_store_repair(spark: SparkSession, sf: str) -> DataFrame:
    from ..sources.bloom import (
        bloom_store_audit,
        collect_batch_blooms,
        repair_bloom_store,
    )
    from ..sources.retention import _fs

    with _scratch("q282_blrepair_") as base:
        sink, blm = f"{base}/sink", f"{base}/blm"
        orders = load_table(spark, sf, "orders").select("o_orderkey")
        df = orders.select(
            "o_orderkey", (F.col("o_orderkey") % 5).alias("batch")
        )
        df.filter(F.col("batch") <= 3).write.partitionBy("batch").parquet(
            sink
        )
        collect_batch_blooms(spark, sink, "o_orderkey").write.partitionBy(
            "batch"
        ).parquet(blm)
        # missing: batch 4 lands out of band, the store never sees it
        df.filter(F.col("batch") == 4).write.mode("append").partitionBy(
            "batch"
        ).parquet(sink)
        # mismatch: batch 3 replayed with half its keys
        (
            df.filter(
                (F.col("batch") == 3) & (F.col("o_orderkey") % 10 == 3)
            )
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch")
            .parquet(sink)
        )
        # orphan: batch 2 dropped behind the store's back
        fs, hpath = _fs(spark, sink)
        fs.delete(hpath(f"{sink}/batch=2"), True)
        # structural: batch 1's recorded positions corrupted with an
        # out-of-range bit — a probe can never match it
        bad = (
            spark.read.parquet(blm)
            .filter(F.col("batch") == 1)
            .withColumn(
                "bloom_pos",
                F.array_union("bloom_pos", F.array(F.lit(1 << 40))),
            )
            .localCheckpoint(eager=True)
        )
        (
            bad.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch")
            .parquet(blm)
        )
        before0 = (
            spark.read.parquet(blm).filter(F.col("batch") == 0).collect()
        )
        rep = repair_bloom_store(spark, sink, blm).collect()[0]
        after0 = (
            spark.read.parquet(blm).filter(F.col("batch") == 0).collect()
        )
        ident = lambda rows: sorted(  # noqa: E731
            (r["key_col"], int(r["n_keys"]), tuple(r["bloom_pos"]))
            for r in rows
        )
        untouched_identical = ident(before0) == ident(after0)
        audit = bloom_store_audit(spark, sink, blm).collect()[0]
        store = spark.read.parquet(blm)
        n_keys_after = int(store.agg(F.sum("n_keys")).collect()[0][0])
        n_store_batches = store.select("batch").distinct().count()
        return spark.createDataFrame(
            [
                (
                    rep["key_col"],
                    int(rep["n_missing_collected"]),
                    int(rep["n_mismatch_recollected"]),
                    int(rep["n_structural_recollected"]),
                    int(rep["n_orphan_rows_dropped"]),
                    bool(rep["current_after"]),
                    untouched_identical,
                    bool(audit["current"]),
                    n_keys_after,
                    n_store_batches,
                )
            ],
            "key_col STRING, n_missing_collected BIGINT, "
            "n_mismatch_recollected BIGINT, n_structural_recollected "
            "BIGINT, n_orphan_rows_dropped BIGINT, current_after BOOLEAN, "
            "untouched_identical BOOLEAN, audit_current BOOLEAN, "
            "n_keys_after BIGINT, n_store_batches BIGINT",
        )


Q282_SQL = """
WITH c AS (
  SELECT count(*) FILTER (WHERE o_orderkey % 5 = 0) AS n0,
         count(*) FILTER (WHERE o_orderkey % 5 = 1) AS n1,
         count(*) FILTER (WHERE o_orderkey % 10 = 3) AS n3keep,
         count(*) FILTER (WHERE o_orderkey % 5 = 4) AS n4
  FROM orders
)
SELECT 'o_orderkey' AS key_col,
       CAST(1 AS BIGINT) AS n_missing_collected,
       CAST(1 AS BIGINT) AS n_mismatch_recollected,
       CAST(1 AS BIGINT) AS n_structural_recollected,
       CAST(1 AS BIGINT) AS n_orphan_rows_dropped,
       true AS current_after,
       true AS untouched_identical,
       true AS audit_current,
       CAST(n0 + n1 + n3keep + n4 AS BIGINT) AS n_keys_after,
       CAST(4 AS BIGINT) AS n_store_batches
FROM c
"""


# --------------------------------------- no-op resume journal retirement
#
# q283: the r12 refusal-loop fix under the gate. A crashed erasure's
# journal survives with opt-out keys that fall OUTSIDE every surviving
# file envelope — the resume finds zero candidates and (pre-r12)
# cleaned up nothing, leaving every later vacuum_maintenance refusing
# and every repair re-running a no-op forever. repair_erasure now
# retires the journal itself: the chain pins the no-op resume's exact
# zero, the journal's disappearance, the vacuum running WITHOUT
# refusal afterwards (zero residue left to reclaim — both counts
# pinned at 0), a second repair finding nothing, and the sink's rows
# untouched throughout (oracle-recomputed).

def q283_noop_resume_retirement(spark: SparkSession, sf: str) -> DataFrame:
    from ..sources.retention import (
        _write_text,
        repair_erasure,
        vacuum_maintenance,
    )

    with _scratch("q283_noop_") as base:
        sink, man = f"{base}/sink", f"{base}/man"
        orders = load_table(spark, sf, "orders").select("o_orderkey")
        hi = orders.agg(F.max("o_orderkey").alias("m")).collect()[0]["m"]
        w = hi // 2 + 1
        df = orders.select(
            "o_orderkey",
            F.expr(f"o_orderkey div {w}").cast("int").alias("batch"),
        )
        df.write.partitionBy("batch").parquet(sink)
        _orderkey_manifest(spark, sink, man)
        # the crash residue: a journal whose keys no surviving envelope
        # admits — the resume will be a pure no-op
        spark.createDataFrame(
            [(int(hi) + 1,), (int(hi) + 2,)], "o_orderkey BIGINT"
        ).write.parquet(f"{sink}/.erase_keys")
        _write_text(
            spark,
            f"{sink}/.erase_intent.json",
            json.dumps(
                {"key_cols": ["o_orderkey"], "bloom_store_path": None}
            ),
        )
        rep = repair_erasure(spark, sink, man).collect()[0]
        from ..sources.retention import _fs

        fs, hpath = _fs(spark, sink)
        journal_gone = not (
            fs.exists(hpath(f"{sink}/.erase_intent.json"))
            or fs.exists(hpath(f"{sink}/.erase_keys"))
        )
        vac = vacuum_maintenance(spark, sink).collect()[0]
        rep2 = repair_erasure(spark, sink, man).collect()[0]
        n_rows = spark.read.option("basePath", sink).parquet(sink).count()
        return spark.createDataFrame(
            [
                (
                    bool(rep["found_residue"]),
                    bool(rep["rolled_forward"]),
                    bool(rep["erasure_resumed"]),
                    int(rep["n_rows_erased_on_resume"]),
                    bool(rep["consistent_after"]),
                    journal_gone,
                    int(vac["n_paths_removed"]),
                    int(vac["n_files_removed"]),
                    bool(rep2["found_residue"]),
                    n_rows,
                )
            ],
            "found_residue BOOLEAN, rolled_forward BOOLEAN, "
            "erasure_resumed BOOLEAN, n_rows_erased_on_resume BIGINT, "
            "consistent_after BOOLEAN, journal_retired BOOLEAN, "
            "vacuum_paths_removed BIGINT, vacuum_files_removed BIGINT, "
            "second_repair_found_residue BOOLEAN, n_rows_surviving BIGINT",
        )


Q283_SQL = """
SELECT true AS found_residue,
       false AS rolled_forward,
       true AS erasure_resumed,
       CAST(0 AS BIGINT) AS n_rows_erased_on_resume,
       true AS consistent_after,
       true AS journal_retired,
       CAST(0 AS BIGINT) AS vacuum_paths_removed,
       CAST(0 AS BIGINT) AS vacuum_files_removed,
       false AS second_repair_found_residue,
       (SELECT CAST(count(*) AS BIGINT) FROM orders) AS n_rows_surviving
"""


# ------------------------------------ whole-table erasure crash repair
#
# q284: the r12 empty-manifest guard under the gate. A whole-table
# opt-out (every key doomed) empties every batch and drops every
# manifest partition; a crash in the final instant — after the last
# refresh, before the journal retires — leaves only the journal. The
# pre-r12 resume aborted mid-phase reading the schema-less manifest
# directory (AnalysisException), stranding the journal forever; repair
# now treats the state as nothing-left-to-erase: journal retired,
# consistent (an empty manifest is consistent exactly when the sink
# holds no rows), vacuum refusal-free. The initial erasure's exact
# whole-table counts are oracle-recomputed from orders.

def q284_wholetable_crash_repair(spark: SparkSession, sf: str) -> DataFrame:
    from ..sources.retention import (
        _fs,
        _write_text,
        erase_rows,
        repair_erasure,
        vacuum_maintenance,
    )

    with _scratch("q284_wt_") as base:
        sink, man = f"{base}/sink", f"{base}/man"
        orders = load_table(spark, sf, "orders").select("o_orderkey")
        df = orders.select(
            "o_orderkey", (F.col("o_orderkey") % 3).alias("batch")
        )
        df.write.partitionBy("batch").parquet(sink)
        _orderkey_manifest(spark, sink, man)
        doomed = orders.select("o_orderkey")
        rep0 = erase_rows(spark, sink, man, "o_orderkey", doomed).persist()
        erased_total = int(
            rep0.agg(F.sum("rows_erased")).collect()[0][0]
        )
        n_emptied = rep0.filter("rows_after = 0").count()
        rep0.unpersist()
        # the final-instant crash: everything done, journal not retired
        doomed.write.parquet(f"{sink}/.erase_keys")
        _write_text(
            spark,
            f"{sink}/.erase_intent.json",
            json.dumps(
                {"key_cols": ["o_orderkey"], "bloom_store_path": None}
            ),
        )
        rep = repair_erasure(spark, sink, man).collect()[0]
        fs, hpath = _fs(spark, sink)
        journal_gone = not (
            fs.exists(hpath(f"{sink}/.erase_intent.json"))
            or fs.exists(hpath(f"{sink}/.erase_keys"))
        )
        vacuum_maintenance(spark, sink)  # must not refuse
        n_after = spark.read.option("basePath", sink).parquet(sink).count()
        return spark.createDataFrame(
            [
                (
                    erased_total,
                    n_emptied,
                    bool(rep["found_residue"]),
                    bool(rep["erasure_resumed"]),
                    int(rep["n_rows_erased_on_resume"]),
                    bool(rep["consistent_after"]),
                    journal_gone,
                    n_after,
                )
            ],
            "rows_erased_total BIGINT, n_batches_emptied BIGINT, "
            "found_residue BOOLEAN, erasure_resumed BOOLEAN, "
            "n_rows_erased_on_resume BIGINT, consistent_after BOOLEAN, "
            "journal_retired BOOLEAN, n_rows_after BIGINT",
        )


Q284_SQL = """
SELECT (SELECT CAST(count(*) AS BIGINT) FROM orders) AS rows_erased_total,
       CAST(3 AS BIGINT) AS n_batches_emptied,
       true AS found_residue,
       true AS erasure_resumed,
       CAST(0 AS BIGINT) AS n_rows_erased_on_resume,
       true AS consistent_after,
       true AS journal_retired,
       CAST(0 AS BIGINT) AS n_rows_after
"""


# --------------------------------- journaled bloom-store reconciliation
#
# q285: the r12 store-reconciliation path under the gate — the exact
# ADVICE r11 crash window: an erase_rows(bloom_store_path=) call whose
# sink swap and manifest refresh completed but which crashed BEFORE
# the store refresh, journal intact. The store is stale (the rewritten
# batch's recorded n_keys no longer matches) in a way the resume alone
# would never touch (it recomputes candidates from the POST-erasure
# manifest). repair_erasure must reconcile the journaled store via
# repair_bloom_store before resuming; afterwards the store is current
# for the maintained column, the journal is retired, and the erased /
# surviving / per-batch store counts are oracle-recomputed from orders
# residue arithmetic.

def q285_journaled_store_reconciliation(
    spark: SparkSession, sf: str
) -> DataFrame:
    from ..sources.bloom import (
        bloom_store_audit,
        collect_batch_blooms,
        load_bloom_store,
    )
    from ..sources.retention import (
        _fs,
        _write_text,
        erase_rows,
        repair_erasure,
    )

    with _scratch("q285_recon_") as base:
        sink, man, blm = f"{base}/sink", f"{base}/man", f"{base}/blm"
        orders = load_table(spark, sf, "orders").select("o_orderkey")
        df = orders.select(
            "o_orderkey", (F.col("o_orderkey") % 3).alias("batch")
        )
        df.write.partitionBy("batch").parquet(sink)
        _orderkey_manifest(spark, sink, man)
        collect_batch_blooms(spark, sink, "o_orderkey").write.partitionBy(
            "batch"
        ).parquet(blm)
        # the doomed keys live in residue slice 0 only; the bloom
        # confines the rewrite on this layout where envelopes cannot
        doomed = orders.filter(
            (F.col("o_orderkey") % 3 == 0) & (F.col("o_orderkey") % 97 == 0)
        ).select("o_orderkey")
        n_doomed = doomed.count()
        store = load_bloom_store(spark, blm, "o_orderkey")
        # the swap + manifest refresh completed WITHOUT the store
        # refresh (the crash hit between them), journal intact:
        erase_rows(
            spark, sink, man, "o_orderkey", doomed,
            blooms={"o_orderkey": store},
        )
        doomed.write.parquet(f"{sink}/.erase_keys")
        _write_text(
            spark,
            f"{sink}/.erase_intent.json",
            json.dumps(
                {"key_cols": ["o_orderkey"], "bloom_store_path": blm}
            ),
        )
        pre_current = all(
            r["current"]
            for r in bloom_store_audit(spark, sink, blm).collect()
        )
        rep = repair_erasure(spark, sink, man).collect()[0]
        post_current = all(
            r["current"]
            for r in bloom_store_audit(spark, sink, blm).collect()
        )
        fs, hpath = _fs(spark, sink)
        journal_gone = not (
            fs.exists(hpath(f"{sink}/.erase_intent.json"))
            or fs.exists(hpath(f"{sink}/.erase_keys"))
        )
        n_after = spark.read.option("basePath", sink).parquet(sink).count()
        n_keys_b0 = int(
            spark.read.parquet(blm)
            .filter(F.col("batch") == 0)
            .agg(F.sum("n_keys"))
            .collect()[0][0]
        )
        return spark.createDataFrame(
            [
                (
                    n_doomed,
                    pre_current,
                    bool(rep["erasure_resumed"]),
                    bool(rep["consistent_after"]),
                    post_current,
                    journal_gone,
                    n_after,
                    n_keys_b0,
                )
            ],
            "n_doomed BIGINT, pre_current BOOLEAN, erasure_resumed "
            "BOOLEAN, consistent_after BOOLEAN, store_current_after "
            "BOOLEAN, journal_retired BOOLEAN, n_rows_after BIGINT, "
            "store_n_keys_batch0 BIGINT",
        )


Q285_SQL = """
WITH d AS (
  SELECT count(*) AS n FROM orders
  WHERE o_orderkey % 3 = 0 AND o_orderkey % 97 = 0
), b0 AS (
  SELECT count(*) AS n FROM orders WHERE o_orderkey % 3 = 0
)
SELECT (SELECT CAST(n AS BIGINT) FROM d) AS n_doomed,
       false AS pre_current,
       true AS erasure_resumed,
       true AS consistent_after,
       true AS store_current_after,
       true AS journal_retired,
       (SELECT CAST(count(*) AS BIGINT) FROM orders)
         - (SELECT CAST(n AS BIGINT) FROM d) AS n_rows_after,
       (SELECT CAST(b0.n - d.n AS BIGINT) FROM b0, d)
         AS store_n_keys_batch0
"""


# ------------------------------ compaction repair without _SUCCESS
#
# q286: the r12 durability marker under the gate — q280's crash chain
# on a cluster that DISABLES the writer's _SUCCESS file
# (mapreduce.fileoutputcommitter.marksuccessfuljobs=false, the ADVICE
# r11 scenario): the staged compaction is durable, its _SUCCESS
# deleted, compact_batch's own commit marker present. Keying the
# repair on _SUCCESS would misread the staging as torn and silently
# discard the compaction; keying on the marker completes the swap —
# the pinned file count proves which path ran (completed = 1 file,
# restored = 4). Manifest reconciled, pruned read oracle-exact,
# marker cleaned.

def q286_compaction_marker_repair(
    spark: SparkSession, sf: str
) -> DataFrame:
    from ..sources.formats import repair_compaction
    from ..sources.manifest import collect_file_stats, read_pruned
    from ..sources.retention import _fs, _write_text

    with _scratch("q286_marker_") as base:
        sink, man = f"{base}/sink", f"{base}/man"
        orders = load_table(spark, sf, "orders").select("o_orderkey")
        for m in range(4):  # four single-file appends
            (
                orders.filter(F.col("o_orderkey") % 4 == m)
                .coalesce(1)
                .write.mode("append")
                .parquet(f"{sink}/batch=0")
            )
        stats = collect_file_stats(
            spark, f"{sink}/batch=0", ["o_orderkey"]
        ).withColumn("batch", F.lit(0))
        (
            stats.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch")
            .parquet(man)
        )
        fs, hpath = _fs(spark, sink)
        # mid-swap crash on a _SUCCESS-less cluster: durable staging
        # with its _SUCCESS removed, compact_batch's own marker
        # present, partition retired to the hidden trash
        staging = f"{sink}/.compact_staging_batch=0"
        spark.read.parquet(f"{sink}/batch=0").coalesce(1).write.parquet(
            staging
        )
        fs.delete(hpath(f"{staging}/_SUCCESS"), False)
        _write_text(
            spark,
            f"{sink}/.compact_commit_batch=0.json",
            json.dumps({"batch": 0}),
        )
        fs.rename(
            hpath(f"{sink}/batch=0"),
            hpath(f"{sink}/.compact_trash_batch=0"),
        )
        rep = repair_compaction(spark, sink, man, 0).collect()[0]
        files_after = sum(
            1
            for st in fs.listStatus(hpath(f"{sink}/batch=0"))
            if st.getPath().getName().startswith("part-")
        )
        marker_cleaned = not fs.exists(
            hpath(f"{sink}/.compact_commit_batch=0.json")
        )
        n_rows = spark.read.parquet(f"{sink}/batch=0").count()
        lo = orders.agg(F.min("o_orderkey").alias("lo")).collect()[0]["lo"]
        pruned_n = read_pruned(
            spark, spark.read.parquet(man), "o_orderkey", lo, lo + 99
        ).count()
        return spark.createDataFrame(
            [
                (
                    rep["action"] == "completed",
                    files_after,
                    marker_cleaned,
                    bool(rep["consistent_after"]),
                    n_rows,
                    pruned_n,
                )
            ],
            "swap_completed BOOLEAN, files_after BIGINT, "
            "marker_cleaned BOOLEAN, consistent_after BOOLEAN, "
            "n_rows BIGINT, pruned_read_rows BIGINT",
        )


Q286_SQL = """
WITH lo AS (SELECT min(o_orderkey) AS lo FROM orders)
SELECT true AS swap_completed,
       CAST(1 AS BIGINT) AS files_after,
       true AS marker_cleaned,
       true AS consistent_after,
       (SELECT CAST(count(*) AS BIGINT) FROM orders) AS n_rows,
       (SELECT CAST(count(*) AS BIGINT) FROM orders, lo
        WHERE o_orderkey BETWEEN lo AND lo + 99) AS pruned_read_rows
"""


# ---------------------------------------------------------- registry
#
# Dormant: consumed only by tests/test_catalog_r13.py until the r13
# rotation merges this module into catalog_queries.py and splices
# these dicts at the main registry's window head.

R13_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "q282_bloom_store_repair": q282_bloom_store_repair,
    "q283_noop_resume_retirement": q283_noop_resume_retirement,
    "q284_wholetable_crash_repair": q284_wholetable_crash_repair,
    "q285_journaled_store_reconciliation": (
        q285_journaled_store_reconciliation
    ),
    "q286_compaction_marker_repair": q286_compaction_marker_repair,
}
R13_ORACLES: dict[str, str] = {
    "q282_bloom_store_repair": Q282_SQL,
    "q283_noop_resume_retirement": Q283_SQL,
    "q284_wholetable_crash_repair": Q284_SQL,
    "q285_journaled_store_reconciliation": Q285_SQL,
    "q286_compaction_marker_repair": Q286_SQL,
}

R13_QUERIES = {name: _canon_query(fn) for name, fn in R13_QUERIES.items()}
