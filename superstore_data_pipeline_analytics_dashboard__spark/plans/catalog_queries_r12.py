"""Round-12 staging catalog — six gate-ready queries + DuckDB
oracles, NOT yet registered: the Bloom-store consistency audit with a
rebuild fix (q276), the erasure crash-repair chain (q277), the
NDV-derived bloom autosizing default with saturation honesty (q278),
composite-key bloom-confined erasure over a multi-column one-scan
store with the store maintained through the delete (q279), and the
compaction crash → vacuum-refusal → repair → surviving-pin chain
(q280), and the standalone three-damage-class manifest repair (q281)
— the r11 operator families
(``sources/bloom.py:bloom_store_audit``,
``sources/retention.py:repair_erasure``/``repair_manifest``, the
self-describing summary metadata and ``bloom_summary_rows``) under
the driver's gate.

Why staged DORMANT: the round-11 audit window is a pinned contract
(tests/test_registry_window.py — q268–q275 + the 42-query r6-verdict
canary block). These queries are fully written, canon-wrapped and
parity-tested at sf0.001 AND sf0.01 (tests/test_catalog_r12.py), and
registration is a round-12 rotation step: MERGE this module's body
into ``catalog_queries.py`` ahead of the registry (exactly as the
r9–r11 rotations merged their staging modules — a back-import from
catalog_queries would be circular, since this module imports
``_canon_query``/``_scratch`` from it), splice the queries at the
window head, update tests/test_registry_window.py + COVERAGE.md, and
delete this docstring's dormancy paragraph plus the dormancy pin
test.

Same conventions as :mod:`catalog_queries`: aliases identical on both
sides, exact BIGINT counts, guarantee booleans oracle-pinned at
literal true/false (the q269/q270 pattern — a broken guarantee is a
hash mismatch, not silent drift), integer arithmetic only.
"""

from __future__ import annotations

import json
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from .catalog_queries import _canon_query, _scratch


# ------------------------------------------- bloom-store consistency
#
# q276: the r11 bloom_store_audit under the driver's gate — the
# currency contract that q275's chain satisfies BY CONSTRUCTION,
# here violated deliberately and detected. Three residue batches land
# and the store is collected (NDV-autosized, so `saturated` is
# deterministically false at every SF); then batch 3 lands OUT OF
# BAND (the store never sees it — n_missing_batches=1: the damage
# class a non-streaming writer leaves) and batch 2 is REPLAYED with
# half its keys (recorded n_keys no longer matches —
# n_count_mismatches=1). The audit reports both, `current` goes
# false; a store rebuild flips it back and the rebuilt store's total
# recorded key count is oracle-exact from orders arithmetic.

def q276_bloom_store_audit(spark: SparkSession, sf: str) -> DataFrame:
    from ..sources.bloom import bloom_store_audit, collect_batch_blooms

    with _scratch("q276_blaudit_") as base:
        sink, blm = f"{base}/sink", f"{base}/blm"
        orders = load_table(spark, sf, "orders").select("o_orderkey")
        df = orders.select(
            "o_orderkey", (F.col("o_orderkey") % 4).alias("batch")
        )
        df.filter(F.col("batch") <= 2).write.partitionBy("batch").parquet(
            sink
        )
        collect_batch_blooms(spark, sink, "o_orderkey").write.partitionBy(
            "batch"
        ).parquet(blm)
        # out-of-band append: a batch the store never saw
        df.filter(F.col("batch") == 3).write.mode("append").partitionBy(
            "batch"
        ).parquet(sink)
        # replayed batch: same id, half the keys
        (
            df.filter(
                (F.col("batch") == 2) & (F.col("o_orderkey") % 8 == 2)
            )
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch")
            .parquet(sink)
        )
        bad = bloom_store_audit(spark, sink, blm).collect()[0]
        # the fix the audit directs: rebuild, then re-audit
        collect_batch_blooms(spark, sink, "o_orderkey").write.mode(
            "overwrite"
        ).partitionBy("batch").parquet(blm)
        good = bloom_store_audit(spark, sink, blm).collect()[0]
        store = spark.read.parquet(blm)
        n_keys_after = int(
            store.agg(F.sum("n_keys")).collect()[0][0]
        )
        return spark.createDataFrame(
            [
                (
                    bad["key_col"],
                    int(bad["n_sink_batches"]),
                    int(bad["n_store_batches"]),
                    int(bad["n_missing_batches"]),
                    int(bad["n_orphan_batches"]),
                    int(bad["n_count_mismatches"]),
                    bool(bad["type_ok"]),
                    bool(bad["geometry_ok"]),
                    bool(bad["positions_ok"]),
                    bool(bad["saturated"]),
                    bool(bad["current"]),
                    bool(good["current"]),
                    n_keys_after,
                )
            ],
            "key_col STRING, n_sink_batches BIGINT, n_store_batches BIGINT, "
            "n_missing_batches BIGINT, n_orphan_batches BIGINT, "
            "n_count_mismatches BIGINT, type_ok BOOLEAN, "
            "geometry_ok BOOLEAN, positions_ok BOOLEAN, "
            "saturated BOOLEAN, current BOOLEAN, "
            "current_after_rebuild BOOLEAN, n_keys_after_rebuild BIGINT",
        )


Q276_SQL = """
WITH c AS (
  SELECT count(*) FILTER (WHERE o_orderkey % 4 <= 1) AS n01,
         count(*) FILTER (WHERE o_orderkey % 8 = 2) AS n2keep,
         count(*) FILTER (WHERE o_orderkey % 4 = 3) AS n3
  FROM orders
)
SELECT 'o_orderkey' AS key_col,
       CAST(4 AS BIGINT) AS n_sink_batches,
       CAST(3 AS BIGINT) AS n_store_batches,
       CAST(1 AS BIGINT) AS n_missing_batches,
       CAST(0 AS BIGINT) AS n_orphan_batches,
       CAST(1 AS BIGINT) AS n_count_mismatches,
       true AS type_ok, true AS geometry_ok, true AS positions_ok,
       false AS saturated, false AS current,
       true AS current_after_rebuild,
       CAST(n01 + n2keep + n3 AS BIGINT) AS n_keys_after_rebuild
FROM c
"""


# --------------------------------------------- erasure crash repair
#
# q277: the r11 repair face end to end under the gate. A 4-range-batch
# sink is built, then crash window (b) is constructed EXACTLY as a
# real mid-swap crash leaves it (the journaled plan, the completed
# staging tree with batch 1's survivors, batch 1's candidate files
# retired to the hidden trash, replacements NOT landed): the doomed
# rows (batch-1 keys ≡ 0 mod 13) are at that instant physically
# missing along with their surviving file-mates, and the audit says so
# (pre_consistent=false). repair_erasure rolls the swap forward from
# the commit marker, reconciles the manifest, and RESUMES the delete
# from the journaled keys (here a no-op: the roll-forward already
# erased everything — n_rows_erased_on_resume pinned at 0); afterwards
# the sink holds exactly orders-minus-doomed rows, zero doomed keys
# remain, and the audit is green — all counts oracle-recomputed from
# the range arithmetic.

def q277_erasure_crash_repair(spark: SparkSession, sf: str) -> DataFrame:
    from ..sources.retention import _fs, _write_text, repair_erasure
    from ..streaming.audit import manifest_consistency_audit

    with _scratch("q277_crash_") as base:
        sink, man = f"{base}/sink", f"{base}/man"
        orders = load_table(spark, sf, "orders").select("o_orderkey")
        w = orders.agg(
            (F.expr("max(o_orderkey) div 4") + 1).alias("w")
        ).collect()[0]["w"]
        df = orders.select(
            "o_orderkey",
            F.expr(f"o_orderkey div {w}").cast("int").alias("batch"),
        )
        df.write.partitionBy("batch").parquet(sink)
        src = spark.read.option("basePath", sink).parquet(sink)
        stats = (
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
        )
        stats.write.partitionBy("batch").parquet(man)
        n_before = orders.count()
        doomed = df.filter(
            (F.col("batch") == 1) & (F.col("o_orderkey") % 13 == 0)
        ).select("o_orderkey")
        n_doomed = doomed.count()
        # --- construct crash window (b), exactly as erase_rows leaves
        # it: resumability journal (keys + intent), staged survivors,
        # the post-staging commit marker, candidates retired, nothing
        # landed
        doomed.write.parquet(f"{sink}/.erase_keys")
        _write_text(
            spark,
            f"{sink}/.erase_intent.json",
            json.dumps(
                {"key_cols": ["o_orderkey"], "bloom_store_path": None}
            ),
        )
        cand = [
            r["file"]
            for r in spark.read.parquet(man)
            .filter(F.col("batch") == 1)
            .collect()
        ]
        csrc = spark.read.option("basePath", sink).parquet(*cand)
        kept = csrc.join(F.broadcast(doomed), "o_orderkey", "left_anti")
        kept.write.partitionBy("batch").parquet(f"{sink}/.erase_staging")
        _write_text(
            spark,
            f"{sink}/.erase_commit.json",
            json.dumps(
                {"batches": {"1": {"files": cand, "n_untouched": 0}}}
            ),
        )
        fs, hpath = _fs(spark, sink)
        fs.mkdirs(hpath(f"{sink}/.erase_trash/batch=1"))
        for u in cand:
            name = u.rsplit("/", 1)[1]
            fs.rename(
                hpath(u), hpath(f"{sink}/.erase_trash/batch=1/{name}")
            )
        pre_ok = bool(
            manifest_consistency_audit(spark, sink, man).collect()[0][
                "consistent"
            ]
        )
        rep = repair_erasure(spark, sink, man).collect()[0]
        after = spark.read.option("basePath", sink).parquet(sink)
        n_after = after.count()
        n_remaining = after.join(doomed, "o_orderkey", "left_semi").count()
        return spark.createDataFrame(
            [
                (
                    n_before,
                    n_doomed,
                    pre_ok,
                    bool(rep["found_residue"]),
                    bool(rep["rolled_forward"]),
                    n_after,
                    n_remaining,
                    bool(rep["erasure_resumed"]),
                    int(rep["n_rows_erased_on_resume"]),
                    bool(rep["consistent_after"]),
                )
            ],
            "n_rows_before BIGINT, n_doomed BIGINT, "
            "pre_consistent BOOLEAN, found_residue BOOLEAN, "
            "rolled_forward BOOLEAN, n_rows_after BIGINT, "
            "n_doomed_remaining BIGINT, erasure_resumed BOOLEAN, "
            "n_rows_erased_on_resume BIGINT, consistent_after BOOLEAN",
        )


Q277_SQL = """
WITH w AS (SELECT max(o_orderkey) // 4 + 1 AS w FROM orders),
d AS (
  SELECT count(*) AS n FROM orders, w
  WHERE o_orderkey // w = 1 AND o_orderkey % 13 = 0
)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM orders) AS n_rows_before,
       CAST(d.n AS BIGINT) AS n_doomed,
       false AS pre_consistent,
       true AS found_residue,
       true AS rolled_forward,
       (SELECT CAST(count(*) AS BIGINT) FROM orders) - d.n AS n_rows_after,
       CAST(0 AS BIGINT) AS n_doomed_remaining,
       true AS erasure_resumed,
       CAST(0 AS BIGINT) AS n_rows_erased_on_resume,
       true AS consistent_after
FROM d
"""


# ------------------------------------------- bloom sizing honesty
#
# q278: the r11 NDV-derived autosizing default under the gate, against
# the deliberately-undersized store that motivated it (VERDICT r10
# "what's wrong" item 3: the old fixed default was honest but useless
# on large batches). Same hostile md5-random 8-batch layout as q270.
# The autosized store must be a power of two, unsaturated (fill ≤ 1/8
# by the 16·ndv·k formula — deterministic at every SF), keep the
# no-false-negative guarantee, and actually prune; the 2^10 store
# must report saturation (fill > 1/8 at every SF: ≥ ~180 distinct
# keys/batch × 3 positions against 1024 bits). True-hit counts are
# oracle-recomputed from the portable-md5 bucket arithmetic.

def q278_bloom_autosize(spark: SparkSession, sf: str) -> DataFrame:
    from ..functions.sampling import hash_bucket
    from ..sources.bloom import bloom_candidates, collect_batch_blooms

    nb = 8
    with _scratch("q278_autosize_") as base:
        sink = f"{base}/sink"
        orders = load_table(spark, sf, "orders").select("o_orderkey")
        df = orders.select(
            "o_orderkey", hash_bucket("o_orderkey", nb).alias("batch")
        )
        df.write.partitionBy("batch").parquet(sink)
        keys = (
            orders.filter(F.col("o_orderkey") % 97 == 0)
            .orderBy("o_orderkey")
            .limit(3)
            .persist()
        )
        n_keys = keys.count()
        src = spark.read.option("basePath", sink).parquet(sink)
        true_pairs = src.join(keys, "o_orderkey").select(
            "batch", "o_orderkey"
        ).persist()
        n_hit = true_pairs.select("batch").distinct().count()
        auto = collect_batch_blooms(spark, sink, "o_orderkey").persist()
        geom = auto.select("n_bits").distinct().collect()
        pow2_ok = len(geom) == 1 and (
            int(geom[0]["n_bits"]) & (int(geom[0]["n_bits"]) - 1) == 0
        )
        sat = auto.agg(
            F.max(
                F.size("bloom_pos").cast("long") * 8 - F.col("n_bits")
            ).alias("m")
        ).collect()[0]["m"]
        auto_not_saturated = int(sat) < 0
        cand = bloom_candidates(auto, keys, "o_orderkey").persist()
        n_missed = true_pairs.join(
            cand, ["batch", "o_orderkey"], "left_anti"
        ).count()
        n_auto_batches = cand.select("batch").distinct().count()
        tiny = collect_batch_blooms(
            spark, sink, "o_orderkey", n_bits=1 << 10
        )
        tiny_sat = tiny.agg(
            F.max(
                F.size("bloom_pos").cast("long") * 8 - F.col("n_bits")
            ).alias("m")
        ).collect()[0]["m"]
        for p in (cand, auto, true_pairs, keys):
            p.unpersist()
        return spark.createDataFrame(
            [
                (
                    nb,
                    n_keys,
                    n_hit,
                    pow2_ok,
                    auto_not_saturated,
                    n_missed == 0,
                    n_auto_batches < nb,
                    int(tiny_sat) >= 0,
                )
            ],
            "n_batches BIGINT, n_keys BIGINT, n_true_hit_batches BIGINT, "
            "autosized_pow2 BOOLEAN, auto_not_saturated BOOLEAN, "
            "no_false_negatives BOOLEAN, auto_pruned BOOLEAN, "
            "tiny_saturated BOOLEAN",
        )


Q278_SQL = """
WITH b AS (
  SELECT o_orderkey,
         CAST(CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 15))
              AS BIGINT) % 8 AS INT) AS batch
  FROM orders
), k AS (
  SELECT o_orderkey FROM orders
  WHERE o_orderkey % 97 = 0 ORDER BY o_orderkey LIMIT 3
), hits AS (
  SELECT count(DISTINCT b.batch) AS n FROM b JOIN k USING (o_orderkey)
)
SELECT CAST(8 AS BIGINT) AS n_batches,
       (SELECT CAST(count(*) AS BIGINT) FROM k) AS n_keys,
       CAST(hits.n AS BIGINT) AS n_true_hit_batches,
       true AS autosized_pow2,
       true AS auto_not_saturated,
       true AS no_false_negatives,
       true AS auto_pruned,
       true AS tiny_saturated
FROM hits
"""


# ----------------------------- composite multi-column bloomed erasure
#
# q279: the r11 one-scan multi-column collection feeding a
# COMPOSITE-key bloom-confined erasure — q272's shape upgraded to two
# key columns: the store holds both o_orderkey and o_custkey
# summaries from ONE scan, erase_rows intersects the two blooms
# tuple-precisely, and the probe geometry comes from the store's
# recorded metadata (no explicit n_bits anywhere — the r11
# auto-resolution path under the gate). On the md5-random layout only
# the bloom can confine; a false negative on EITHER column would
# leave rows_erased_total short and hash-mismatch. The store is
# MAINTAINED through the delete (bloom_store_path=): afterwards
# bloom_store_audit must be green for both columns
# (store_current_after), closing the maintenance loop under the gate.

def q279_multicol_bloomed_erasure(
    spark: SparkSession, sf: str
) -> DataFrame:
    from ..functions.sampling import hash_bucket
    from ..sources.bloom import (
        bloom_store_audit,
        collect_batch_blooms,
        load_bloom_store,
    )
    from ..sources.retention import erase_rows

    nb = 8
    with _scratch("q279_mcerase_") as base:
        sink, man, blm = f"{base}/sink", f"{base}/man", f"{base}/blm"
        orders = load_table(spark, sf, "orders").select(
            "o_orderkey", "o_custkey"
        )
        df = orders.select(
            "o_orderkey",
            "o_custkey",
            hash_bucket("o_orderkey", nb).alias("batch"),
        )
        df.write.partitionBy("batch").parquet(sink)
        src = spark.read.option("basePath", sink).parquet(sink)
        stats = (
            src.select(
                F.input_file_name().alias("file"),
                "batch",
                "o_orderkey",
                "o_custkey",
            )
            .groupBy("file", "batch")
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.min("o_orderkey").alias("min_o_orderkey"),
                F.max("o_orderkey").alias("max_o_orderkey"),
                F.min("o_custkey").alias("min_o_custkey"),
                F.max("o_custkey").alias("max_o_custkey"),
            )
            .select(
                "file",
                "n_rows",
                "min_o_orderkey",
                "max_o_orderkey",
                "min_o_custkey",
                "max_o_custkey",
                "batch",
            )
        )
        stats.write.partitionBy("batch").parquet(man)
        # ONE scan collects BOTH columns' summaries (2^18 spans every
        # SF's per-batch NDV comfortably: ≤ ~19k keys/batch at sf0.1)
        collect_batch_blooms(
            spark, sink, ["o_orderkey", "o_custkey"], n_bits=1 << 18
        ).write.partitionBy("batch").parquet(blm)
        stores = {
            c: load_bloom_store(spark, blm, c)
            for c in ("o_orderkey", "o_custkey")
        }
        doomed = (
            orders.filter(F.col("o_orderkey") % 97 == 0)
            .orderBy("o_orderkey")
            .limit(3)
            .select("o_orderkey", "o_custkey")
        )
        rep = erase_rows(
            spark,
            sink,
            man,
            ["o_orderkey", "o_custkey"],
            doomed,
            blooms=stores,
            bloom_store_path=blm,
        ).persist()
        n_batches = rep.count()
        n_rewritten = rep.filter("rewritten").count()
        agg = rep.agg(
            F.sum("rows_erased").alias("er"),
            F.sum("rows_after").alias("af"),
        ).collect()[0]
        rep.unpersist()
        store_ok = all(
            r["current"]
            for r in bloom_store_audit(spark, sink, blm).collect()
        )
        n_hit = (
            df.join(doomed, ["o_orderkey", "o_custkey"])
            .select("batch")
            .distinct()
            .count()
        )
        return spark.createDataFrame(
            [
                (
                    n_batches,
                    n_hit,
                    int(agg["er"]),
                    int(agg["af"]),
                    n_rewritten < n_batches,
                    store_ok,
                )
            ],
            "n_batches BIGINT, n_true_hit_batches BIGINT, "
            "rows_erased_total BIGINT, rows_after_total BIGINT, "
            "bloom_confined BOOLEAN, store_current_after BOOLEAN",
        )


Q279_SQL = """
WITH b AS (
  SELECT o_orderkey,
         CAST(CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 15))
              AS BIGINT) % 8 AS INT) AS batch
  FROM orders
), k AS (
  SELECT o_orderkey FROM orders
  WHERE o_orderkey % 97 = 0 ORDER BY o_orderkey LIMIT 3
)
SELECT (SELECT CAST(count(DISTINCT batch) AS BIGINT) FROM b) AS n_batches,
       (SELECT CAST(count(DISTINCT b.batch) AS BIGINT)
        FROM b JOIN k USING (o_orderkey)) AS n_true_hit_batches,
       (SELECT CAST(count(*) AS BIGINT) FROM k) AS rows_erased_total,
       (SELECT CAST(count(*) AS BIGINT) FROM orders)
         - (SELECT CAST(count(*) AS BIGINT) FROM k) AS rows_after_total,
       true AS bloom_confined,
       true AS store_current_after
"""


# ----------------------------- compaction crash, refusal, repair, pin
#
# q280: the compaction side of the r11 crash story in one chain — the
# q274 six-file batch is compacted BY HAND up to the mid-swap instant
# (durable staging, partition retired to the hidden trash: exactly the
# state a crash between compact_batch's two renames leaves), then:
# vacuum_maintenance REFUSES (the trash holds the partition's only
# copy — vacuum_refused is the guarantee boolean), repair_compaction
# COMPLETES the swap to the compacted copy and reconciles the
# manifest, the pruned read is oracle-exact again, and — the q274
# contrast carried through a crash — the PRE-compaction snapshot pin
# is still reproducible (content byte-identical). File counts, row
# counts and every boolean are oracle-pinned.

def q280_compaction_crash_chain(spark: SparkSession, sf: str) -> DataFrame:
    from ..sources.formats import repair_compaction
    from ..sources.manifest import collect_file_stats, read_pruned
    from ..sources.retention import _fs, vacuum_maintenance
    from ..sources.snapshots import commit_snapshot, snapshot_drift_audit

    with _scratch("q280_cchain_") as base:
        sink, man, log = f"{base}/sink", f"{base}/man", f"{base}/log"
        orders = load_table(spark, sf, "orders").select("o_orderkey")
        for m in range(6):  # six single-file appends, one per residue
            (
                orders.filter(F.col("o_orderkey") % 6 == m)
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
        commit_snapshot(spark, man, log)
        fs, hpath = _fs(spark, sink)
        files_before = sum(
            1
            for st in fs.listStatus(hpath(f"{sink}/batch=0"))
            if st.getPath().getName().startswith("part-")
        )
        # mid-swap crash state: durable compacted staging, live
        # partition retired to the hidden trash, nothing landed
        spark.read.parquet(f"{sink}/batch=0").coalesce(1).write.parquet(
            f"{sink}/.compact_staging_batch=0"
        )
        fs.rename(
            hpath(f"{sink}/batch=0"),
            hpath(f"{sink}/.compact_trash_batch=0"),
        )
        try:
            vacuum_maintenance(spark, sink)
            refused = False
        except ValueError:
            refused = True
        rep = repair_compaction(spark, sink, man, 0).collect()[0]
        files_after = sum(
            1
            for st in fs.listStatus(hpath(f"{sink}/batch=0"))
            if st.getPath().getName().startswith("part-")
        )
        n_rows = spark.read.parquet(f"{sink}/batch=0").count()
        lo = orders.agg(F.min("o_orderkey").alias("lo")).collect()[0]["lo"]
        pruned_n = read_pruned(
            spark, spark.read.parquet(man), "o_orderkey", lo, lo + 99
        ).count()
        drift = snapshot_drift_audit(spark, sink, log, 1).collect()[0]
        return spark.createDataFrame(
            [
                (
                    files_before,
                    files_after,
                    n_rows,
                    pruned_n,
                    refused,
                    rep["action"] == "completed",
                    bool(rep["consistent_after"]),
                    bool(drift["reproducible"]),
                )
            ],
            "files_before BIGINT, files_after BIGINT, n_rows BIGINT, "
            "pruned_read_rows BIGINT, vacuum_refused BOOLEAN, "
            "swap_completed BOOLEAN, consistent_after BOOLEAN, "
            "pin_reproducible BOOLEAN",
        )


Q280_SQL = """
WITH lo AS (SELECT min(o_orderkey) AS lo FROM orders)
SELECT CAST(6 AS BIGINT) AS files_before,
       CAST(1 AS BIGINT) AS files_after,
       (SELECT CAST(count(*) AS BIGINT) FROM orders) AS n_rows,
       (SELECT CAST(count(*) AS BIGINT) FROM orders, lo
        WHERE o_orderkey BETWEEN lo AND lo + 99) AS pruned_read_rows,
       true AS vacuum_refused,
       true AS swap_completed,
       true AS consistent_after,
       true AS pin_reproducible
"""


# ------------------------------------------ manifest detect-and-repair
#
# q281: repair_manifest standalone under the gate — all three audit
# damage classes planted at once on a 3-batch orders sink (a STALE row:
# batch 0's file deleted behind the manifest's back; an UNENVELOPED
# file: an out-of-band append into batch 1; a COUNT MISMATCH: batch 2's
# file replaced by its even-key half with the old manifest row kept),
# detected (pre_consistent=false), repaired in one call, and proven:
# the post-repair audit is green and a pruned read over the
# out-of-band keys is oracle-exact. Counts are recomputed by DuckDB
# from the residue arithmetic; booleans follow the guarantee pattern.

def q281_manifest_repair(spark: SparkSession, sf: str) -> DataFrame:
    from ..sources.manifest import collect_file_stats, read_pruned
    from ..sources.retention import _fs, repair_manifest
    from ..streaming.audit import manifest_consistency_audit

    with _scratch("q281_manrep_") as base:
        sink, man = f"{base}/sink", f"{base}/man"
        orders = load_table(spark, sf, "orders").select("o_orderkey")
        hi = orders.agg(F.max("o_orderkey").alias("m")).collect()[0]["m"]
        for b in range(3):  # one file per batch, keys by residue mod 3
            (
                orders.filter(F.col("o_orderkey") % 3 == b)
                .coalesce(1)
                .write.parquet(f"{sink}/batch={b}")
            )
            stats = collect_file_stats(
                spark, f"{sink}/batch={b}", ["o_orderkey"]
            ).withColumn("batch", F.lit(b))
            (
                stats.write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("batch")
                .parquet(man)
            )
        fs, hpath = _fs(spark, sink)
        # stale: batch 0's file vanishes behind the manifest's back
        f0 = spark.read.parquet(f"{sink}/batch=0").inputFiles()[0]
        fs.delete(hpath(f0), False)
        # unenveloped: out-of-band keys [hi+1, hi+50] land in batch 1
        spark.range(hi + 1, hi + 51).select(
            F.col("id").alias("o_orderkey")
        ).coalesce(1).write.mode("append").parquet(f"{sink}/batch=1")
        # count mismatch: batch 2's file replaced by its even-key half,
        # manifest row left pointing at the old count
        keep2 = (
            spark.read.parquet(f"{sink}/batch=2")
            .filter(F.col("o_orderkey") % 2 == 0)
            .localCheckpoint(eager=True)  # sever lineage before delete
        )
        f2 = spark.read.parquet(f"{sink}/batch=2").inputFiles()[0]
        fs.delete(hpath(f2), False)
        keep2.coalesce(1).write.mode("append").parquet(f"{sink}/batch=2")
        old2 = spark.read.parquet(man).filter(F.col("batch") == 2)
        old2.localCheckpoint(eager=True).withColumn(
            "file",
            F.concat(
                F.lit("file:"),
                F.lit(spark.read.parquet(f"{sink}/batch=2").inputFiles()[0]
                      .removeprefix("file:")),
            ),
        ).write.mode("overwrite").option(
            "partitionOverwriteMode", "dynamic"
        ).partitionBy("batch").parquet(man)
        pre_ok = bool(
            manifest_consistency_audit(spark, sink, man).collect()[0][
                "consistent"
            ]
        )
        rep = repair_manifest(spark, sink, man).collect()[0]
        pruned = read_pruned(
            spark, spark.read.parquet(man), "o_orderkey", hi + 1, hi + 25
        ).count()
        n_rows = int(
            spark.read.parquet(man).agg(F.sum("n_rows")).collect()[0][0]
        )
        return spark.createDataFrame(
            [
                (
                    pre_ok,
                    int(rep["n_stale_rows_dropped"]),
                    int(rep["n_files_reenveloped"]),
                    int(rep["n_count_refreshed"]),
                    bool(rep["consistent_after"]),
                    pruned,
                    n_rows,
                )
            ],
            "pre_consistent BOOLEAN, n_stale_rows_dropped BIGINT, "
            "n_files_reenveloped BIGINT, n_count_refreshed BIGINT, "
            "consistent_after BOOLEAN, pruned_read_rows BIGINT, "
            "manifest_rows_total BIGINT",
        )


Q281_SQL = """
WITH c AS (
  SELECT count(*) FILTER (WHERE o_orderkey % 3 = 1) AS n1,
         count(*) FILTER (WHERE o_orderkey % 3 = 2
                          AND o_orderkey % 2 = 0) AS n2even
  FROM orders
)
SELECT false AS pre_consistent,
       CAST(1 AS BIGINT) AS n_stale_rows_dropped,
       CAST(1 AS BIGINT) AS n_files_reenveloped,
       CAST(1 AS BIGINT) AS n_count_refreshed,
       true AS consistent_after,
       CAST(25 AS BIGINT) AS pruned_read_rows,
       CAST(n1 + 50 + n2even AS BIGINT) AS manifest_rows_total
FROM c
"""


# ---------------------------------------------------------- registry
#
# Dormant: consumed only by tests/test_catalog_r12.py until the r12
# rotation merges this module into catalog_queries.py and splices
# these dicts at the main registry's window head.

R12_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "q276_bloom_store_audit": q276_bloom_store_audit,
    "q277_erasure_crash_repair": q277_erasure_crash_repair,
    "q278_bloom_autosize": q278_bloom_autosize,
    "q279_multicol_bloomed_erasure": q279_multicol_bloomed_erasure,
    "q280_compaction_crash_chain": q280_compaction_crash_chain,
    "q281_manifest_repair": q281_manifest_repair,
}
R12_ORACLES: dict[str, str] = {
    "q276_bloom_store_audit": Q276_SQL,
    "q277_erasure_crash_repair": Q277_SQL,
    "q278_bloom_autosize": Q278_SQL,
    "q279_multicol_bloomed_erasure": Q279_SQL,
    "q280_compaction_crash_chain": Q280_SQL,
    "q281_manifest_repair": Q281_SQL,
}

R12_QUERIES = {name: _canon_query(fn) for name, fn in R12_QUERIES.items()}
