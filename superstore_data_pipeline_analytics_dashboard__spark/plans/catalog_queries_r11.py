"""Round-11 staging catalog — eight gate-ready queries + DuckDB
oracles, NOT yet registered: the cross-batch (ledger) contract face of
operators/expectations.py (q268), the approx-top-k truncation honesty
query (q269), the Bloom manifest tier and its compositions (q270
point-prune, q272 bloom-confined erasure, q275 streamed
land→store→erase→read chain), the r10 erasure rewrite's evidence
queries (q271 multi-batch hit-set, q273 file-grain pruning), and
manifest-aware in-place compaction (q274).

Why staged DORMANT: the round-10 audit window is a pinned contract
(tests/test_registry_window.py — q266/q267 + the 48-query r5-verdict
canary block). These queries are fully written, canon-wrapped and
parity-tested at sf0.001 AND sf0.01 (tests/test_catalog_r11.py), and
registration is a round-11 rotation step: MERGE this module's body
into ``catalog_queries.py`` ahead of the registry (exactly as the
r9/r10 rotations merged their staging modules — a back-import from
catalog_queries would be circular, since this module imports
``_canon_query``/``_li``/``_scratch``/``_land_batch_with_stats`` from
it), splice the queries at the window head, update
tests/test_registry_window.py + COVERAGE.md, and delete this
docstring's dormancy paragraph plus the dormancy pin test.

Same conventions as :mod:`catalog_queries`: aliases identical on both
sides, exact BIGINT counts, integer arithmetic only (no doubles in any
output).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.expectations import (
    Expectation,
    check_batch_expectations,
)
from ..sources.catalog import load_table
from .catalog_queries import (
    _canon_query,
    _land_batch_with_stats,
    _li,
    _scratch,
)


# --------------------------------------------- cross-batch contracts
#
# q268: the LEDGER face of the data-contract layer (VERDICT r9 item 3)
# — a real promotion gate at 100 TB checks each commit AGAINST HISTORY,
# not just rows inside it. Three commits land with a planted volume
# drop (batch 0 = half the keys, batches 1-2 = a quarter each), then
# check_batch_expectations evaluates three history contracts over the
# snapshot ledger: row-count monotonicity and added-rows positivity
# pass (error lines), while the added-volume drift bound (±40% of the
# previous commit's add) FAILS at version 2 — visible in the report
# with first_bad_version=2, non-blocking at warn severity. The drift
# margin is scale-stable: the mod-4 key split makes v2's add ~50% below
# v1's at every SF. The oracle rebuilds the ledger rows from orders
# arithmetic, replays the lag window and every verdict in SQL.

def q268_ledger_contract(spark: SparkSession, sf: str) -> DataFrame:
    from ..sources.snapshots import snapshot_ledger

    with _scratch("q268_ledg_") as base:
        sink, man, log = f"{base}/sink", f"{base}/man", f"{base}/log"
        orders = load_table(spark, sf, "orders").select("o_orderkey")
        for bid, pred in (
            (0, F.col("o_orderkey") % 4 <= 1),
            (1, F.col("o_orderkey") % 4 == 2),
            (2, F.col("o_orderkey") % 4 == 3),
        ):
            _land_batch_with_stats(
                spark,
                orders.filter(pred),
                sink,
                man,
                bid,
                ["o_orderkey"],
                log=log,
            )
        ledger = snapshot_ledger(spark, log)
        contract = {
            "row_count_monotone": Expectation(
                F.col("n_rows") < F.col("prev_n_rows")
            ),
            "added_positive": Expectation(F.col("rows_added") <= 0),
            # |n1 - n0| * 100 > 40 * n0 at v2 (the planted ~50% drop);
            # v3's add is within a few percent of v2's — 1 violation
            "added_drift_bounded": Expectation(
                F.abs(F.col("rows_added") - F.col("prev_rows_added")) * 100
                > 40 * F.col("prev_rows_added"),
                severity="warn",
            ),
        }
        return check_batch_expectations(
            ledger, "version", contract
        ).localCheckpoint(eager=True)


Q268_SQL = """
WITH c AS (
  SELECT count(*) FILTER (WHERE o_orderkey % 4 <= 1) AS n0,
         count(*) FILTER (WHERE o_orderkey % 4 = 2) AS n1,
         count(*) FILTER (WHERE o_orderkey % 4 = 3) AS n2
  FROM orders
), l AS (
  SELECT 1 AS version, n0 AS n_rows, n0 AS rows_added FROM c
  UNION ALL SELECT 2, n0 + n1, n1 FROM c
  UNION ALL SELECT 3, n0 + n1 + n2, n2 FROM c
), a AS (
  SELECT version, n_rows, rows_added,
         lag(n_rows) OVER (ORDER BY version) AS p_rows,
         lag(rows_added) OVER (ORDER BY version) AS p_add
  FROM l
), v AS (
  SELECT 'row_count_monotone' AS expectation, 'error' AS severity,
         count(*) AS n_versions,
         count(*) FILTER (WHERE n_rows < p_rows) AS n_violations,
         min(version) FILTER (WHERE n_rows < p_rows)
           AS first_bad_version,
         CAST(0 AS BIGINT) AS max_ppm
  FROM a
  UNION ALL
  SELECT 'added_positive', 'error', count(*),
         count(*) FILTER (WHERE rows_added <= 0),
         min(version) FILTER (WHERE rows_added <= 0), 0
  FROM a
  UNION ALL
  SELECT 'added_drift_bounded', 'warn', count(*),
         count(*) FILTER (WHERE abs(rows_added - p_add) * 100
                            > 40 * p_add),
         min(version) FILTER (WHERE abs(rows_added - p_add) * 100
                                > 40 * p_add), 0
  FROM a
)
SELECT expectation, severity, CAST(n_versions AS BIGINT) AS n_versions,
       CAST(n_violations AS BIGINT) AS n_violations,
       CAST(first_bad_version AS BIGINT) AS first_bad_version,
       max_ppm,
       n_violations * 1000000 // n_versions <= max_ppm AS passed
FROM v
"""


# --------------------------------- approx top-k truncation honesty
#
# q269: the sketch tier's truncation-regime guarantee under the
# driver's gate (VERDICT r9 item 4) — the q35 HLL pattern: exact
# columns recomputed by the oracle, guarantee booleans compared against
# literal true, so a guarantee break is a hash mismatch, not a silent
# drift. Keys are l_partkey with every 10th key collapsed to -1 — a
# planted ~10% heavy hitter per returnflag group, far above the
# N/max_tracked ≈ 1.6% tracking threshold, while the remaining ~180
# (sf0.001) to ~18k (sf0.1) distinct keys keep the 64-item sketch
# firmly in the truncation regime at every SF. band_ok asserts every
# fetched estimate sits within the two-sided N/max_tracked band the
# property test measures (test_topk.py; integer comparison —
# |err| * max_tracked <= n_rows — no doubles); tracking_ok asserts no
# guaranteed-tracked heavy key was lost. Measured at all three SFs:
# estimates are EXACT (error 0) and all 3 planted heavies survive, so
# both booleans are deterministically true with the full band as
# margin. Capacity fetch (k = fetch_n = max_items_tracked) keeps the
# fetch-boundary guard disarmed by construction — nothing tracked is
# left behind.

def q269_topk_truncation_band(
    spark: SparkSession, sf: str
) -> DataFrame:
    from ..operators.topk import grouped_topk_approx

    mt = 64
    li = _li(spark, sf).select(
        "l_returnflag",
        F.when(F.col("l_partkey") % 10 == 0, F.lit(-1))
        .otherwise(F.col("l_partkey"))
        .alias("key"),
    )
    li = li.persist()  # feeds the sketch, the exact twin and the totals
    est = grouped_topk_approx(
        li, ["l_returnflag"], "key", k=mt, max_items_tracked=mt,
        fetch_factor=1,
    )
    exact = li.groupBy("l_returnflag", "key").agg(
        F.count("*").alias("true_cnt")
    )
    totals = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("key").alias("n_keys"),
    )
    j = est.join(exact, ["l_returnflag", "key"]).join(
        totals, "l_returnflag"
    )
    per_flag = j.groupBy("l_returnflag", "n_rows", "n_keys").agg(
        F.count("*").alias("n_est"),
        F.sum(
            F.when(
                F.abs(F.col("cnt") - F.col("true_cnt")) * mt
                <= F.col("n_rows"),
                1,
            ).otherwise(0)
        ).alias("n_in_band"),
    )
    heavy = exact.join(totals, "l_returnflag").filter(
        F.col("true_cnt") * mt > F.col("n_rows")
    )
    missing = (
        heavy.join(est, ["l_returnflag", "key"], "left_anti")
        .groupBy("l_returnflag")
        .agg(F.count("*").alias("n_missing"))
    )
    return per_flag.join(missing, ["l_returnflag"], "left").select(
        "l_returnflag",
        F.col("n_rows").cast("long").alias("n_rows"),
        F.col("n_keys").cast("long").alias("n_keys"),
        (F.col("n_in_band") == F.col("n_est")).alias("band_ok"),
        (F.coalesce(F.col("n_missing"), F.lit(0)) == 0).alias(
            "tracking_ok"
        ),
    )


Q269_SQL = """
WITH k AS (
  SELECT l_returnflag,
         CASE WHEN l_partkey % 10 = 0 THEN -1 ELSE l_partkey END AS key
  FROM lineitem
)
SELECT l_returnflag, count(*) AS n_rows,
       CAST(count(DISTINCT key) AS BIGINT) AS n_keys,
       true AS band_ok, true AS tracking_ok
FROM k GROUP BY l_returnflag
"""


# ------------------------------------------- bloom point-prune tier
#
# q270: the Bloom manifest tier (sources/bloom.py, r10) under the
# driver's gate. The envelope tier prunes range-clustered layouts and
# honestly degrades on random ones — this query builds the HOSTILE
# layout (orders hashed into 8 batches by the portable md5 bucket, so
# every batch's [min,max] spans ~the whole key space) and point-looks-up
# 3 keys. The oracle recomputes the batch assignment, the per-batch
# envelopes, the envelope-candidate count and the true-hit-batch count
# EXACTLY in SQL (md5-bucket is the cross-engine hash); the bloom
# columns follow the q269/q35 guarantee-boolean pattern — the oracle
# pins them at literal true, so a lost containment (false negative,
# impossible by construction) or a bloom that stopped pruning at all
# hash-mismatches the gate instead of drifting silently. Sizing: 2^18
# bits vs ≤19k distinct keys/batch at sf0.1 keeps the false-positive
# rate ≤ ~1%, and the booleans are deterministic for fixed data+seed.

def q270_bloom_point_prune(spark: SparkSession, sf: str) -> DataFrame:
    from ..functions.sampling import hash_bucket
    from ..sources.bloom import bloom_candidates, collect_batch_blooms

    nb, n_bits = 8, 1 << 18
    with _scratch("q270_bloom_") as base:
        sink = f"{base}/sink"
        orders = load_table(spark, sf, "orders").select("o_orderkey")
        df = orders.select(
            "o_orderkey", hash_bucket("o_orderkey", nb).alias("batch")
        )
        df.write.partitionBy("batch").parquet(sink)
        # feeds the envelope agg, both true-pair consumers and the
        # bloom collection — persist (PERF.md rule: 2+ consumers)
        src = (
            spark.read.option("basePath", sink).parquet(sink).persist()
        )
        keys = (
            orders.filter(F.col("o_orderkey") % 97 == 0)
            .orderBy("o_orderkey")
            .limit(3)
            .persist()  # 3 rows, feeds 4 consumers below
        )
        n_keys = keys.count()
        env = src.groupBy("batch").agg(
            F.min("o_orderkey").alias("lo"), F.max("o_orderkey").alias("hi")
        )
        n_env = (
            env.join(
                keys,
                (F.col("o_orderkey") >= F.col("lo"))
                & (F.col("o_orderkey") <= F.col("hi")),
                "left_semi",
            ).count()
        )
        true_pairs = src.join(keys, "o_orderkey").select(
            "batch", "o_orderkey"
        )
        n_hit = true_pairs.select("batch").distinct().count()
        blooms = collect_batch_blooms(
            spark, sink, "o_orderkey", n_bits=n_bits
        )
        cand = bloom_candidates(
            blooms, keys, "o_orderkey", n_bits=n_bits
        ).persist()  # feeds the miss check AND the candidate count
        n_missed = true_pairs.join(
            cand, ["batch", "o_orderkey"], "left_anti"
        ).count()
        n_bloom = cand.select("batch").distinct().count()
        cand.unpersist()
        keys.unpersist()
        src.unpersist()  # scratch sink — gone when the context exits
        return spark.createDataFrame(
            [
                (
                    nb,
                    n_keys,
                    n_env,
                    n_hit,
                    n_missed == 0,
                    n_bloom < nb,
                )
            ],
            "n_batches BIGINT, n_keys BIGINT, "
            "n_envelope_candidate_batches BIGINT, "
            "n_true_hit_batches BIGINT, no_false_negatives BOOLEAN, "
            "bloom_pruned BOOLEAN",
        )


Q270_SQL = """
WITH b AS (
  SELECT o_orderkey,
         CAST(CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 15))
              AS BIGINT) % 8 AS INT) AS batch
  FROM orders
), k AS (
  SELECT o_orderkey FROM orders
  WHERE o_orderkey % 97 = 0 ORDER BY o_orderkey LIMIT 3
), env AS (
  SELECT batch, min(o_orderkey) AS lo, max(o_orderkey) AS hi
  FROM b GROUP BY batch
), envc AS (
  SELECT count(*) AS n FROM env
  WHERE EXISTS (SELECT 1 FROM k
                WHERE k.o_orderkey BETWEEN env.lo AND env.hi)
), hits AS (
  SELECT count(DISTINCT b.batch) AS n FROM b JOIN k USING (o_orderkey)
)
SELECT CAST(8 AS BIGINT) AS n_batches,
       (SELECT CAST(count(*) AS BIGINT) FROM k) AS n_keys,
       CAST(envc.n AS BIGINT) AS n_envelope_candidate_batches,
       CAST(hits.n AS BIGINT) AS n_true_hit_batches,
       true AS no_false_negatives,
       true AS bloom_pruned
FROM envc, hits
"""


# ----------------------------------------- multi-batch erasure gate
#
# q271: the r10 BATCHED erasure path (one rewrite job per schema
# group, SCALE_AUDIT.md probe) under the driver's gate, at a hit-set
# shape the grid-of-4 (q262) never exercised: 12 range-clustered
# batches, an opt-out list enveloped by THREE of them — sparse hits in
# batches 2 and 7 plus EVERY key of batch 5, so the fully-emptied
# branch (zero-row schema-bearing file, manifest rows dropped) runs
# against real files under the gate. The oracle replays the range
# arithmetic, the conservative envelope decision (EXISTS doomed key
# within [lo,hi]) and all four exact-integer report columns in SQL.

def q271_multibatch_erasure(spark: SparkSession, sf: str) -> DataFrame:
    from ..sources.retention import erase_rows

    with _scratch("q271_erase_") as base:
        sink, man = f"{base}/sink", f"{base}/man"
        orders = load_table(spark, sf, "orders").select("o_orderkey")
        w = orders.agg(
            (F.expr("max(o_orderkey) div 12") + 1).alias("w")
        ).collect()[0]["w"]
        df = orders.select(
            "o_orderkey",
            F.expr(f"o_orderkey div {w}").cast("int").alias("batch"),
        )
        # ONE partitioned write + ONE stats scan lands all 12 batches
        # (the per-batch helper would cost 36 tiny jobs here)
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
            .select("file", "n_rows", "min_o_orderkey", "max_o_orderkey", "batch")
        )
        stats.write.partitionBy("batch").parquet(man)
        doomed = df.filter(
            (F.col("batch") == 5)
            | ((F.col("o_orderkey") % 7 == 0) & F.col("batch").isin(2, 7))
        ).select("o_orderkey")
        return erase_rows(spark, sink, man, "o_orderkey", doomed)


Q271_SQL = """
WITH w AS (SELECT max(o_orderkey) // 12 + 1 AS w FROM orders),
b AS (
  SELECT o_orderkey, CAST(o_orderkey // w AS INT) AS batch
  FROM orders, w
), d AS (
  SELECT o_orderkey FROM b
  WHERE batch = 5 OR (o_orderkey % 7 = 0 AND batch IN (2, 7))
), env AS (
  SELECT batch, count(*) AS n_rows,
         min(o_orderkey) AS lo, max(o_orderkey) AS hi
  FROM b GROUP BY batch
), er AS (
  SELECT b.batch, count(*) AS n
  FROM b JOIN d USING (o_orderkey) GROUP BY b.batch
)
SELECT CAST(env.batch AS BIGINT) AS batch,
       EXISTS (SELECT 1 FROM d
               WHERE d.o_orderkey BETWEEN env.lo AND env.hi) AS rewritten,
       CAST(env.n_rows AS BIGINT) AS rows_before,
       CAST(coalesce(er.n, 0) AS BIGINT) AS rows_erased,
       CAST(env.n_rows - coalesce(er.n, 0) AS BIGINT) AS rows_after
FROM env LEFT JOIN er ON env.batch = er.batch
"""


# ------------------------------------------- bloom-confined erasure
#
# q272: the q270 bloom tier COMPOSED with the q271 batched erasure —
# a compliance delete on the layout that defeats envelopes. The same
# portable-md5 8-batch random sink as q270: plain erasure would
# rewrite all 8 batches (every envelope admits every key); passing the
# land-time bloom store confines the rewrite to the true-hit batches.
# The exact-integer columns (true-hit batch count, total erased, total
# surviving) are oracle-recomputed from orders arithmetic — if the
# bloom pruning ever skipped a batch that really contains a doomed key
# (a false negative, impossible by construction), rows_erased_total
# would come up short and hash-mismatch. bloom_confined follows the
# guarantee-boolean pattern (bloom candidacy is xxhash64-internal; a
# false POSITIVE only adds a zero-erased rewrite and cannot push the
# rewritten count to all 8).

def q272_bloomed_erasure(spark: SparkSession, sf: str) -> DataFrame:
    from ..functions.sampling import hash_bucket
    from ..sources.bloom import collect_batch_blooms
    from ..sources.retention import erase_rows

    nb, n_bits = 8, 1 << 18
    with _scratch("q272_blerase_") as base:
        sink, man = f"{base}/sink", f"{base}/man"
        orders = load_table(spark, sf, "orders").select("o_orderkey")
        df = orders.select(
            "o_orderkey", hash_bucket("o_orderkey", nb).alias("batch")
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
        blooms = collect_batch_blooms(
            spark, sink, "o_orderkey", n_bits=n_bits
        )
        doomed = (
            orders.filter(F.col("o_orderkey") % 97 == 0)
            .orderBy("o_orderkey")
            .limit(3)
        )
        rep = erase_rows(
            spark,
            sink,
            man,
            "o_orderkey",
            doomed,
            blooms={"o_orderkey": blooms},
            bloom_n_bits=n_bits,
        ).persist()  # driver-scalar source for all four aggregates
        n_batches = rep.count()
        n_rewritten = rep.filter("rewritten").count()
        agg = rep.agg(
            F.sum("rows_erased").alias("er"),
            F.sum("rows_after").alias("af"),
        ).collect()[0]
        rep.unpersist()
        n_hit = (
            df.join(doomed, "o_orderkey")
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
                )
            ],
            "n_batches BIGINT, n_true_hit_batches BIGINT, "
            "rows_erased_total BIGINT, rows_after_total BIGINT, "
            "bloom_confined BOOLEAN",
        )


Q272_SQL = """
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
       true AS bloom_confined
"""


# ------------------------------------------- file-grain erasure gate
#
# q273: the r10 FILE-grain erasure refinement under the driver's gate.
# One batch partition holding FOUR deterministic quartile files of the
# orders keys (appended one at a time — each file's envelope is
# exactly its quartile); the opt-out list lives entirely inside
# quartile 2, so exactly ONE file is rewritten and the other three
# survive physically untouched (asserted via inputFiles identity and
# returned as exact file counts the oracle pins). Rows columns are
# oracle-recomputed from orders arithmetic; a regression to
# batch-grain rewriting would flip n_files_untouched from 3 to 0 and
# hash-mismatch.

def q273_filegrain_erasure(spark: SparkSession, sf: str) -> DataFrame:
    from ..sources.manifest import collect_file_stats
    from ..sources.retention import erase_rows

    with _scratch("q273_fgerase_") as base:
        sink, man = f"{base}/sink", f"{base}/man"
        orders = load_table(spark, sf, "orders").select("o_orderkey")
        w = orders.agg(
            (F.expr("max(o_orderkey) div 4") + 1).alias("w")
        ).collect()[0]["w"]
        for q in range(4):
            (
                orders.filter(
                    F.expr(f"o_orderkey div {w}") == q
                )
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
        files_before = set(
            spark.read.parquet(f"{sink}/batch=0").inputFiles()
        )
        doomed = orders.filter(
            (F.expr(f"o_orderkey div {w}") == 1)
            & (F.col("o_orderkey") % 11 == 0)
        )
        rep = erase_rows(spark, sink, man, "o_orderkey", doomed).collect()
        files_after = set(
            spark.read.parquet(f"{sink}/batch=0").inputFiles()
        )
        assert len(rep) == 1
        return spark.createDataFrame(
            [
                (
                    len(files_before),
                    len(files_after),
                    len(files_before & files_after),
                    int(rep[0]["rows_erased"]),
                    int(rep[0]["rows_after"]),
                )
            ],
            "n_files_before BIGINT, n_files_after BIGINT, "
            "n_files_untouched BIGINT, rows_erased BIGINT, "
            "rows_after BIGINT",
        )


Q273_SQL = """
WITH w AS (SELECT max(o_orderkey) // 4 + 1 AS w FROM orders),
d AS (
  SELECT count(*) AS n FROM orders, w
  WHERE o_orderkey // w = 1 AND o_orderkey % 11 = 0
)
SELECT CAST(4 AS BIGINT) AS n_files_before,
       CAST(4 AS BIGINT) AS n_files_after,
       CAST(3 AS BIGINT) AS n_files_untouched,
       CAST(d.n AS BIGINT) AS rows_erased,
       (SELECT CAST(count(*) AS BIGINT) FROM orders) - d.n AS rows_after
FROM d
"""


# ----------------------------------------- manifest-aware compaction
#
# q274: sources/formats.compact_batch (r10) under the driver's gate —
# the maintenance op whose CONTRAST with erasure is the point: six
# small files compact to one, content byte-identical, the manifest
# refreshed (post-compaction pruned-read row count is oracle-exact),
# and a PRE-compaction snapshot pin stays REPRODUCIBLE (snapshots pin
# content stats, not file lists) where q259 proves erasure audibly
# breaks one. File counts and the reproducibility boolean are pinned
# by the oracle; row columns recomputed from orders arithmetic.

def q274_compact_batch(spark: SparkSession, sf: str) -> DataFrame:
    from ..sources.formats import compact_batch
    from ..sources.manifest import collect_file_stats, read_pruned
    from ..sources.snapshots import commit_snapshot, snapshot_drift_audit

    with _scratch("q274_compact_") as base:
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
        files_before, files_after = compact_batch(spark, sink, man, 0)
        lo = orders.agg(F.min("o_orderkey").alias("lo")).collect()[0]["lo"]
        pruned_n = read_pruned(
            spark, spark.read.parquet(man), "o_orderkey", lo, lo + 99
        ).count()
        drift = snapshot_drift_audit(spark, sink, log, 1).collect()[0]
        n_rows = int(
            spark.read.parquet(man).agg(F.sum("n_rows")).collect()[0][0]
        )
        return spark.createDataFrame(
            [
                (
                    files_before,
                    files_after,
                    n_rows,
                    pruned_n,
                    bool(drift["reproducible"]),
                )
            ],
            "files_before BIGINT, files_after BIGINT, n_rows BIGINT, "
            "pruned_read_rows BIGINT, pin_reproducible BOOLEAN",
        )


Q274_SQL = """
WITH lo AS (SELECT min(o_orderkey) AS lo FROM orders)
SELECT CAST(6 AS BIGINT) AS files_before,
       CAST(1 AS BIGINT) AS files_after,
       (SELECT CAST(count(*) AS BIGINT) FROM orders) AS n_rows,
       (SELECT CAST(count(*) AS BIGINT) FROM orders, lo
        WHERE o_orderkey BETWEEN lo AND lo + 99) AS pruned_read_rows,
       true AS pin_reproducible
"""


# ------------------------------------- streamed bloom chain, end-to-end
#
# q275: the full production chain under one gate query — the sink is
# landed BY THE STREAMING MACHINERY (start_append_with_manifest with
# bloom_cols, availableNow over three interleaved residue slices), the
# bloom store is read back with load_bloom_store, erasure is
# bloom-confined through it, and a point read goes through
# read_bloom_pruned. Residue slices make every batch's envelope span
# the whole key space (the layout where only the bloom can confine);
# all doomed keys live in ONE residue slice, so `confined` (fewer
# batches rewritten than exist) fails only if BOTH other slices false-
# positive simultaneously. Sizing matters and was MEASURED: at 2^20
# bits the sf0.1 slice (~50k distinct keys) false-positived for ~0.3%
# of the 167 doomed keys per slice — enough that both slices lit up.
# At 2^24 bits the per-key rate is ~7e-7, so the failure odds are
# ~1e-8 across all SFs (deterministic for fixed data+seed — verified
# at all three). Every count column is
# slice-permutation-invariant (file listing order may assign batch ids
# differently across runs) and oracle-recomputed from orders
# arithmetic; the booleans follow the guarantee pattern.

def q275_streamed_bloom_chain(spark: SparkSession, sf: str) -> DataFrame:
    from ..sources.bloom import load_bloom_store, read_bloom_pruned
    from ..sources.retention import erase_rows
    from ..streaming.incremental import start_append_with_manifest

    n_bits = 1 << 24
    with _scratch("q275_chain_") as base:
        drop, sink, man, blm, ck = (
            f"{base}/{d}" for d in ("drop", "sink", "man", "bloom", "ck")
        )
        orders = load_table(spark, sf, "orders").select("o_orderkey")
        for m in range(3):  # one file per residue slice
            (
                orders.filter(F.col("o_orderkey") % 3 == m)
                .coalesce(1)
                .write.parquet(f"{drop}/s{m}")
            )
        stream = (
            spark.readStream.schema("o_orderkey BIGINT")
            .option("maxFilesPerTrigger", 1)
            .option("recursiveFileLookup", True)
            .parquet(drop)
        )
        q = start_append_with_manifest(
            stream,
            sink,
            man,
            ck,
            stat_cols=["o_orderkey"],
            bloom_cols=["o_orderkey"],
            bloom_path=blm,
            bloom_n_bits=n_bits,
        )
        q.awaitTermination(300)
        store = load_bloom_store(spark, blm, "o_orderkey")
        n_store = store.count()
        # doomed keys: all in the residue-0 slice
        doomed = orders.filter(
            (F.col("o_orderkey") % 3 == 0)
            & (F.col("o_orderkey") % 301 == 0)
        )
        rep = erase_rows(
            spark,
            sink,
            man,
            "o_orderkey",
            doomed,
            blooms={"o_orderkey": store},
            bloom_n_bits=n_bits,
        ).persist()
        n_batches = rep.count()
        n_rewritten = rep.filter("rewritten").count()
        agg = rep.agg(
            F.sum("rows_erased").alias("er"),
            F.sum("rows_after").alias("af"),
        ).collect()[0]
        rep.unpersist()
        # point read through the SAME store, for two surviving keys
        probe = [
            int(r["o_orderkey"])
            for r in orders.filter(
                (F.col("o_orderkey") % 3 == 1)
                & (F.col("o_orderkey") % 301 == 0)
            )
            .orderBy("o_orderkey")
            .limit(2)
            .collect()
        ]
        n_point = read_bloom_pruned(
            spark, sink, store, "o_orderkey", probe, n_bits=n_bits
        ).count()
        return spark.createDataFrame(
            [
                (
                    n_batches,
                    n_store,
                    int(agg["er"]),
                    int(agg["af"]),
                    n_point,
                    n_rewritten < n_batches,
                )
            ],
            "n_batches BIGINT, n_store_rows BIGINT, rows_erased BIGINT, "
            "rows_after BIGINT, point_read_rows BIGINT, "
            "confined BOOLEAN",
        )


Q275_SQL = """
WITH d AS (
  SELECT count(*) AS n FROM orders
  WHERE o_orderkey % 3 = 0 AND o_orderkey % 301 = 0
), p AS (
  SELECT count(*) AS n FROM (
    SELECT o_orderkey FROM orders
    WHERE o_orderkey % 3 = 1 AND o_orderkey % 301 = 0
    ORDER BY o_orderkey LIMIT 2
  )
)
SELECT CAST(3 AS BIGINT) AS n_batches,
       CAST(3 AS BIGINT) AS n_store_rows,
       (SELECT CAST(n AS BIGINT) FROM d) AS rows_erased,
       (SELECT CAST(count(*) AS BIGINT) FROM orders)
         - (SELECT CAST(n AS BIGINT) FROM d) AS rows_after,
       (SELECT CAST(n AS BIGINT) FROM p) AS point_read_rows,
       true AS confined
"""


# ---------------------------------------------------------- registry
#
# Dormant: consumed only by tests/test_catalog_r11.py until the r11
# rotation merges this module into catalog_queries.py and splices
# these dicts at the main registry's window head.

R11_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "q268_ledger_contract": q268_ledger_contract,
    "q269_topk_truncation_band": q269_topk_truncation_band,
    "q270_bloom_point_prune": q270_bloom_point_prune,
    "q271_multibatch_erasure": q271_multibatch_erasure,
    "q272_bloomed_erasure": q272_bloomed_erasure,
    "q273_filegrain_erasure": q273_filegrain_erasure,
    "q274_compact_batch": q274_compact_batch,
    "q275_streamed_bloom_chain": q275_streamed_bloom_chain,
}
R11_ORACLES: dict[str, str] = {
    "q268_ledger_contract": Q268_SQL,
    "q269_topk_truncation_band": Q269_SQL,
    "q270_bloom_point_prune": Q270_SQL,
    "q271_multibatch_erasure": Q271_SQL,
    "q272_bloomed_erasure": Q272_SQL,
    "q273_filegrain_erasure": Q273_SQL,
    "q274_compact_batch": Q274_SQL,
    "q275_streamed_bloom_chain": Q275_SQL,
}

R11_QUERIES = {name: _canon_query(fn) for name, fn in R11_QUERIES.items()}
