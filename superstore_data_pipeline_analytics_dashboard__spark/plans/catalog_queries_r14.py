"""Round-14 staging catalog — five gate-ready queries + DuckDB
oracles, NOT yet registered. Per VERDICT r12 item 3 the growth vector
rotates back to DATA-PLANE capability: each query COMPOSES existing
operators into a new end-to-end capability instead of adding another
crash-window fixture —

* q287 — erasure racing a concurrent append: the second ingestion of
  already-erased subject rows (the GDPR re-ingest race), its survival
  under the first delete's documented manifest-as-of-start semantics,
  and the envelope-pruned second delete that finishes the job;
* q288 — ANN index maintenance chained with snapshots: an IVF index
  grown incrementally under FROZEN centroids through a real
  sink/manifest/snapshot-log round-trip, pinned EQUAL to a full
  rebuild (frozen-centroid assignment is deterministic) with the
  snapshot diff as the increment feed;
* q289 — incremental exact dedup fed by ``snapshot_diff``: the
  daily-crawl shape (state from the v1 pin, increment over exactly the
  rows v2 added), with the sequential-equals-batch guarantee pinned;
* q290 — corpus release report: quality gate → exact dedup → token
  census → packing plan composed into one oracled release row, the
  packing sequence count cross-checked operator-vs-arithmetic;
* q291 — vector-store erasure: a compliance delete over an embedding
  sink PROPAGATED to the serving ANN index, with index completeness
  and doomed-free top-k probes pinned;
* q292 — capacity-aware temperature mixing: the water-filling
  redistribution ``plan_epochs`` stops short of (a capped source's
  unused budget flows to the uncapped ones), solved in CLOSED FORM by
  ``recipe.waterfill_budget``'s threshold scan and oracled band-exact
  over length-band token masses;
* q293 — integer sampling-schedule quotas: Hamilton largest-remainder
  apportionment (``recipe.integer_apportion``) turns the temperature
  weights into per-band sequence COUNTS that sum to exactly the
  schedule size — double weights refused by design (order-dependent
  parallel sums), so the allocation is engine-exact.

Why staged DORMANT: the round-13 audit window is a pinned contract
(tests/test_registry_window.py — q282–q286 + the 45-query
oldest-verdict canary block, then the six r13 partial-oracle upgrades
at queue head). These queries are fully written, canon-wrapped and
parity-tested at sf0.001 AND sf0.01 (tests/test_catalog_r14.py), and
registration is a round-14 rotation step: MERGE this module's body
into ``catalog_queries.py`` ahead of the registry (exactly as the
r9–r13 rotations merged their staging modules — a back-import from
catalog_queries would be circular, since this module imports
``_canon_query``/``_scratch``/``_orderkey_manifest`` from it), splice
the queries at the window head together with the six never-audited
r13 upgrades, update tests/test_registry_window.py + COVERAGE.md, and
delete this docstring's dormancy paragraph plus the dormancy pin test.

Same conventions as :mod:`catalog_queries`: aliases identical on both
sides, exact BIGINT counts, guarantee booleans oracle-pinned at
literal true/false (a broken guarantee is a hash mismatch, not silent
drift), integer arithmetic only.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import text as T
from ..sources.catalog import load_table
from .catalog_queries import _canon_query, _orderkey_manifest, _scratch


# ------------------------------------ erasure under a concurrent append
#
# q287: the race every compliance pipeline eventually hits — subject
# rows RE-INGESTED after the delete ran. erase_rows' documented
# semantics are manifest-as-of-start: the first delete covers exactly
# the batches enveloped when it planned, so a batch landing afterwards
# (with its own manifest rows, the appender's contract) keeps its
# subject rows and the audit stays green — erasure is not a standing
# subscription. The SECOND delete with the same opt-out list then
# removes them, and because the doomed keys are the corpus's lowest
# and round 1 refreshed batch 0's envelope past them, round 2 rewrites
# ONLY the re-ingested batch — the zone-map pruning survives the race.
# Every count is oracle-recomputed from orders arithmetic.

def q287_erasure_concurrent_append(
    spark: SparkSession, sf: str
) -> DataFrame:
    from ..sources.manifest import collect_file_stats
    from ..sources.retention import erase_rows
    from ..streaming.audit import manifest_consistency_audit

    with _scratch("q287_conc_") as base:
        sink, man = f"{base}/sink", f"{base}/man"
        orders = load_table(spark, sf, "orders").select("o_orderkey")
        hi = orders.agg(F.max("o_orderkey").alias("m")).collect()[0]["m"]
        w = hi // 3 + 1
        df = orders.select(
            "o_orderkey",
            F.expr(f"o_orderkey div {w}").cast("int").alias("batch"),
        )
        df.write.partitionBy("batch").parquet(sink)
        _orderkey_manifest(spark, sink, man)
        # the opt-out list: the 50 smallest order keys — interior to
        # batch 0's envelope before round 1, OUTSIDE it after
        doomed = (
            orders.orderBy("o_orderkey").limit(50).select("o_orderkey")
        )
        rep1 = erase_rows(spark, sink, man, "o_orderkey", doomed).persist()
        erased1 = int(rep1.agg(F.sum("rows_erased")).collect()[0][0])
        rep1.unpersist()
        # the concurrent append: the same subject rows land as batch 3
        # AFTER the delete completed, with the appender's manifest rows
        (
            doomed.withColumn("batch", F.lit(3))
            .write.mode("append")
            .partitionBy("batch")
            .parquet(sink)
        )
        (
            collect_file_stats(spark, f"{sink}/batch=3", ["o_orderkey"])
            .withColumn("batch", F.lit(3))
            .write.mode("append")
            .partitionBy("batch")
            .parquet(man)
        )
        consistent_mid = bool(
            manifest_consistency_audit(spark, sink, man)
            .collect()[0]["consistent"]
        )
        rep2 = erase_rows(spark, sink, man, "o_orderkey", doomed).persist()
        r2 = {int(r["batch"]): r for r in rep2.collect()}
        rep2.unpersist()
        erased2 = sum(int(r["rows_erased"]) for r in r2.values())
        n_rewritten2 = sum(1 for r in r2.values() if r["rewritten"])
        batch0_spared = (0 not in r2) or (not r2[0]["rewritten"])
        n_final = (
            spark.read.option("basePath", sink).parquet(sink).count()
        )
        consistent_final = bool(
            manifest_consistency_audit(spark, sink, man)
            .collect()[0]["consistent"]
        )
        return spark.createDataFrame(
            [
                (
                    50,
                    erased1,
                    consistent_mid,
                    erased2,
                    n_rewritten2,
                    batch0_spared,
                    n_final,
                    consistent_final,
                )
            ],
            "n_doomed BIGINT, erased_round1 BIGINT, consistent_mid "
            "BOOLEAN, erased_round2 BIGINT, n_batches_rewritten_round2 "
            "BIGINT, batch0_spared_round2 BOOLEAN, n_rows_final BIGINT, "
            "consistent_final BOOLEAN",
        )


Q287_SQL = """
SELECT CAST(50 AS BIGINT) AS n_doomed,
       CAST(50 AS BIGINT) AS erased_round1,
       true AS consistent_mid,
       CAST(50 AS BIGINT) AS erased_round2,
       CAST(1 AS BIGINT) AS n_batches_rewritten_round2,
       true AS batch0_spared_round2,
       (SELECT CAST(count(*) - 50 AS BIGINT) FROM orders) AS n_rows_final,
       true AS consistent_final
"""


# -------------------------------- IVF maintenance chained with snapshots
#
# q288: the serving-index maintenance loop — an IVF index over half the
# corpus is committed as snapshot v1, the other half arrives and is
# assigned against the FROZEN centroid table (ivf_increment's shape:
# cost ∝ batch, never corpus), landed as batch 1, committed as v2. The
# chain pins what makes frozen-centroid increments trustworthy: the
# incrementally-grown index is EXACTLY what a full ivf_assign rebuild
# over the whole corpus produces (same frozen centroids ⇒ same argmin,
# deterministic tie-break), the snapshot diff v1→v2 is exactly the
# arriving half, and the ledger's rows_added agrees. Counts
# oracle-recomputed from embeddings parity arithmetic.

def q288_ivf_snapshot_maintenance(
    spark: SparkSession, sf: str
) -> DataFrame:
    from ..operators.similarity import ivf_assign, ivf_increment, seed_centroids
    from ..sources.manifest import collect_file_stats
    from ..sources.snapshots import (
        commit_snapshot,
        read_as_of,
        snapshot_diff,
        snapshot_ledger,
    )

    with _scratch("q288_ivf_") as base:
        sink, man, log = f"{base}/sink", f"{base}/man", f"{base}/log"
        emb = (
            load_table(spark, sf, "embeddings")
            .select(
                "vec_id",
                F.col("embedding").cast("array<double>").alias("embedding"),
            )
            .persist()  # feeds v1/arriving, the full rebuild and the count
        )
        v1 = emb.filter(F.col("vec_id") % 2 == 0)
        arriving = emb.filter(F.col("vec_id") % 2 == 1)
        cents = seed_centroids(v1, 16).persist()
        a1 = ivf_assign(v1, cents).persist()  # feeds write + anti-join
        a1.withColumn("batch", F.lit(0)).write.partitionBy(
            "batch"
        ).parquet(sink)
        (
            collect_file_stats(spark, f"{sink}/batch=0", ["vec_id"])
            .withColumn("batch", F.lit(0))
            .write.partitionBy("batch")
            .parquet(man)
        )
        commit_snapshot(spark, man, log)
        inc = ivf_increment(arriving, cents, a1)
        add = inc["assigned"].join(
            a1.select("vec_id"), "vec_id", "left_anti"
        )
        add.withColumn("batch", F.lit(1)).write.mode(
            "append"
        ).partitionBy("batch").parquet(sink)
        (
            collect_file_stats(spark, f"{sink}/batch=1", ["vec_id"])
            .withColumn("batch", F.lit(1))
            .write.mode("append")
            .partitionBy("batch")
            .parquet(man)
        )
        v2 = commit_snapshot(spark, man, log)
        v1_rows = read_as_of(spark, sink, log, 1).count()
        diff_rows = snapshot_diff(spark, sink, log, 1, v2).count()
        stored = spark.read.option("basePath", sink).parquet(sink)
        v2_rows = stored.count()
        full = ivf_assign(emb, cents)
        n_mismatch = (
            stored.select("vec_id", "cell")
            .join(
                full.select("vec_id", F.col("cell").alias("c2")), "vec_id"
            )
            .filter(F.col("cell") != F.col("c2"))
            .count()
        )
        ledger = {
            int(r["version"]): int(r["rows_added"])
            for r in snapshot_ledger(spark, log).collect()
        }
        n_vectors = emb.count()
        a1.unpersist()
        cents.unpersist()
        emb.unpersist()
        return spark.createDataFrame(
            [
                (
                    n_vectors,
                    v1_rows,
                    diff_rows,
                    v2_rows,
                    n_mismatch == 0,
                    ledger.get(v2) == diff_rows,
                )
            ],
            "n_vectors BIGINT, v1_rows BIGINT, diff_rows BIGINT, "
            "v2_rows BIGINT, increment_equals_rebuild BOOLEAN, "
            "ledger_added_matches BOOLEAN",
        )


Q288_SQL = """
WITH e AS (SELECT count(*) AS n FROM embeddings),
     ev AS (SELECT count(*) AS n FROM embeddings WHERE vec_id % 2 = 0)
SELECT (SELECT CAST(n AS BIGINT) FROM e) AS n_vectors,
       (SELECT CAST(n AS BIGINT) FROM ev) AS v1_rows,
       (SELECT CAST(e.n - ev.n AS BIGINT) FROM e, ev) AS diff_rows,
       (SELECT CAST(n AS BIGINT) FROM e) AS v2_rows,
       true AS increment_equals_rebuild,
       true AS ledger_added_matches
"""


# ------------------------- incremental exact dedup fed by snapshot_diff
#
# q289: the daily-crawl composition — dedup state bootstrapped from the
# v1 pin, the increment running over EXACTLY the rows v2 added
# (snapshot_diff, batch-partition cost), never a corpus rescan. The
# v1/delta split is by doc_id range, so the exact tier's
# sequential-equals-batch guarantee holds at ID grain (earlier batches
# hold smaller ids — the online keep-lowest rule and the global
# keep-lowest rule pick the same survivors) and is pinned as a
# boolean. Every count is oracle-recomputed from md5-fingerprint
# arithmetic over the same range split.

def q289_incremental_dedup_snapshot_diff(
    spark: SparkSession, sf: str
) -> DataFrame:
    from ..operators.incremental_dedup import exact_increment, exact_state
    from ..sources.manifest import collect_file_stats
    from ..sources.snapshots import commit_snapshot, read_as_of, snapshot_diff

    with _scratch("q289_inc_") as base:
        sink, man, log = f"{base}/sink", f"{base}/man", f"{base}/log"
        docs = load_table(spark, sf, "documents").select(
            "doc_id", "text"
        )
        mx = docs.agg(F.max("doc_id").alias("m")).collect()[0]["m"]
        m = mx // 2
        for b, cond in ((0, F.col("doc_id") < m), (1, F.col("doc_id") >= m)):
            docs.filter(cond).withColumn("batch", F.lit(b)).write.mode(
                "append"
            ).partitionBy("batch").parquet(sink)
            (
                collect_file_stats(spark, f"{sink}/batch={b}", ["doc_id"])
                .withColumn("batch", F.lit(b))
                .write.mode("append")
                .partitionBy("batch")
                .parquet(man)
            )
            commit_snapshot(spark, man, log)
        v1_docs = read_as_of(spark, sink, log, 1)
        n_v1 = v1_docs.count()
        # the pin is deduplicated before it becomes state (exact_state's
        # precondition): keep the lowest id per fingerprint
        v1_fp = v1_docs.select(
            "doc_id", T.fingerprint("text").alias("f")
        ).persist()  # feeds the keep set AND the guarantee check
        v1_keep = v1_fp.groupBy("f").agg(F.min("doc_id").alias("doc_id"))
        v1_kept_docs = v1_docs.join(
            v1_keep.select("doc_id"), "doc_id", "left_semi"
        )
        n_v1_kept = v1_keep.count()
        state = exact_state(v1_kept_docs)
        delta = snapshot_diff(spark, sink, log, 1, 2)
        n_delta = delta.count()
        inc = exact_increment(delta, state)
        kept_new = inc["kept"].select("doc_id").persist()
        n_new_kept = kept_new.count()
        # dropped decomposition, engine-side: within-batch collapse vs
        # already-in-corpus
        d_fp = delta.select("doc_id", T.fingerprint("text").alias("f"))
        d_first = d_fp.groupBy("f").agg(F.min("doc_id").alias("doc_id"))
        n_within = n_delta - d_first.count()
        n_cross = (
            d_first.join(v1_fp.select("f").distinct(), "f", "left_semi")
            .count()
        )
        # sequential == batch at ID grain (range split ⇒ guaranteed)
        all_fp = docs.select("doc_id", T.fingerprint("text").alias("f"))
        batch_keep = all_fp.groupBy("f").agg(
            F.min("doc_id").alias("doc_id")
        ).select("doc_id")
        seq_keep = v1_keep.select("doc_id").unionByName(kept_new)
        seq_eq_batch = (
            seq_keep.join(batch_keep, "doc_id", "left_anti").count() == 0
            and batch_keep.join(seq_keep, "doc_id", "left_anti").count()
            == 0
        )
        v1_fp.unpersist()
        kept_new.unpersist()
        return spark.createDataFrame(
            [
                (
                    n_v1,
                    n_v1_kept,
                    n_delta,
                    n_new_kept,
                    n_cross,
                    n_within,
                    seq_eq_batch,
                )
            ],
            "n_v1 BIGINT, n_v1_kept BIGINT, n_delta BIGINT, n_new_kept "
            "BIGINT, n_dropped_cross BIGINT, n_dropped_within BIGINT, "
            "sequential_equals_batch BOOLEAN",
        )


Q289_SQL = r"""
WITH m AS (SELECT max(doc_id) // 2 AS m FROM documents),
fp AS (
  SELECT doc_id,
         md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS f
  FROM documents
),
v1 AS (SELECT doc_id, f FROM fp, m WHERE doc_id < m.m),
d  AS (SELECT doc_id, f FROM fp, m WHERE doc_id >= m.m),
v1f AS (SELECT DISTINCT f FROM v1),
df AS (SELECT f, count(*) AS c FROM d GROUP BY f)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM v1) AS n_v1,
       (SELECT CAST(count(*) AS BIGINT) FROM v1f) AS n_v1_kept,
       (SELECT CAST(count(*) AS BIGINT) FROM d) AS n_delta,
       (SELECT CAST(count(*) AS BIGINT) FROM df
        WHERE f NOT IN (SELECT f FROM v1f)) AS n_new_kept,
       (SELECT CAST(count(*) AS BIGINT) FROM df
        WHERE f IN (SELECT f FROM v1f)) AS n_dropped_cross,
       (SELECT CAST(coalesce(sum(c), 0) - count(*) AS BIGINT) FROM df)
         AS n_dropped_within,
       true AS sequential_equals_batch
"""


# ----------------------------------------------- corpus release report
#
# q290: the one-row release datacard a training run signs off on —
# quality gate (q22's score at a fixed 0.5 cut, the q134 convention) →
# exact dedup among survivors (q19's keep-lowest rule) → token census →
# packing plan (q75's concat-and-chunk at budget 512 over 16 md5
# shards). The packing operator's sequence count is cross-checked
# in-query against the closed-form Σ_shards ceil(tokens/512) — the
# arithmetic the oracle recomputes — so a packing regression is a hash
# mismatch. All integer arithmetic; one Exchange per stage.

def q290_corpus_release_report(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.packing import pack_concat_chunk

    docs = load_table(spark, sf, "documents")
    scored = docs.select(
        "doc_id",
        "text",
        T.token_count("text").cast("bigint").alias("n_tokens"),
        T.quality_score("text").cast("decimal(9,6)").alias("q"),
    ).persist()  # feeds the census AND the gate (regex-heavy: score once)
    passed = scored.filter(F.col("q") >= 0.5)
    fps = passed.select(
        "doc_id", "n_tokens", T.fingerprint("text").alias("f")
    )
    keep = fps.groupBy("f").agg(F.min("doc_id").alias("doc_id"))
    kept = fps.join(keep, ["f", "doc_id"], "left_semi").persist()
    pack = pack_concat_chunk(
        kept.select("doc_id", "n_tokens"), "n_tokens", budget=512
    )
    shard_stats = pack.groupBy("shard").agg(
        F.sum("n_tokens").alias("t"),
        F.max(
            F.when(F.col("n_tokens") > 0, F.col("last_seq") + 1)
        ).alias("op_seqs"),
    )
    pack_agg = shard_stats.agg(
        F.coalesce(
            F.sum(F.expr("CASE WHEN t > 0 THEN (t + 511) div 512 END")),
            F.lit(0),
        ).alias("__arith"),
        F.coalesce(
            F.sum(F.coalesce("op_seqs", F.lit(0))), F.lit(0)
        ).alias("__op"),
    )
    return (
        scored.agg(F.count("*").alias("__nd"))
        .crossJoin(passed.agg(F.count("*").alias("__np")))
        .crossJoin(
            kept.agg(
                F.count("*").alias("__nk"),
                F.coalesce(F.sum("n_tokens"), F.lit(0)).alias("__tt"),
            )
        )
        .crossJoin(pack_agg)
        .select(
            F.col("__nd").cast("bigint").alias("n_docs"),
            F.col("__np").cast("bigint").alias("n_quality_pass"),
            F.col("__nk").cast("bigint").alias("n_after_dedup"),
            F.col("__tt").cast("bigint").alias("total_tokens"),
            F.col("__op").cast("bigint").alias("n_sequences"),
            (F.col("__arith") == F.col("__op")).alias(
                "pack_matches_arithmetic"
            ),
        )
    )


_SQL_EN_R14 = ", ".join(f"'{w}'" for w in T.STOPWORDS_EN)

Q290_SQL = rf"""
WITH base AS (
  SELECT doc_id, text,
         list_filter(regexp_split_to_array(
             trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '),
             x -> x <> '') AS t,
         CAST(length(text) - length(
             regexp_replace(text, '[!-/:-@\[-`{{-~]', '', 'g')) AS DOUBLE)
           / greatest(length(text), 1) AS punct_r
  FROM documents
), scored AS (
  SELECT doc_id, text,
         CAST(len(t) AS BIGINT) AS n_tokens,
         CAST(least(len(t) / 100.0, 1.0) * 0.4
            + least(CAST(len(list_filter(t, x ->
                  list_contains([{_SQL_EN_R14}], x))) AS DOUBLE)
                / greatest(len(t), 1) * 5.0, 1.0) * 0.4
            + greatest(1.0 - punct_r * 4.0, 0.0) * 0.2
            AS DECIMAL(9,6)) AS q
  FROM base
), passed AS (
  SELECT doc_id, text, n_tokens FROM scored WHERE q >= 0.5
), kept AS (
  SELECT min(doc_id) AS doc_id
  FROM (
    SELECT doc_id,
           md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS f
    FROM passed
  ) GROUP BY f
), ktok AS (
  SELECT k.doc_id, p.n_tokens,
         CAST(CAST(('0x' || substr(md5(CAST(k.doc_id AS VARCHAR)), 1, 15))
                   AS BIGINT) % 16 AS INT) AS shard
  FROM kept k JOIN passed p USING (doc_id)
), sh AS (
  SELECT shard, sum(n_tokens) AS t FROM ktok GROUP BY shard
)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM scored) AS n_docs,
       (SELECT CAST(count(*) AS BIGINT) FROM passed) AS n_quality_pass,
       (SELECT CAST(count(*) AS BIGINT) FROM kept) AS n_after_dedup,
       (SELECT CAST(coalesce(sum(n_tokens), 0) AS BIGINT) FROM ktok)
         AS total_tokens,
       (SELECT CAST(coalesce(sum((t + 511) // 512), 0) AS BIGINT)
        FROM sh WHERE t > 0) AS n_sequences,
       true AS pack_matches_arithmetic
"""


# -------------------------------------------------- vector-store erasure
#
# q291: the right-to-be-forgotten loop for a VECTOR corpus — the
# compliance delete runs over the embedding sink (manifest-pruned
# rewrite; here the doomed ids are hash-spread so every batch honestly
# rewrites), and the chain pins what serving cares about: the rebuilt
# ANN index holds EXACTLY the survivors (completeness both ways), and
# no top-k probe can ever return an erased vector. Counts
# oracle-recomputed from embeddings arithmetic; the probe result size
# is exact (5 queries × k=10 over a corpus far larger than k).

def q291_vector_store_erasure(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.similarity import ivf_assign, knn_bruteforce, seed_centroids
    from ..sources.manifest import collect_file_stats
    from ..sources.retention import erase_rows
    from ..streaming.audit import manifest_consistency_audit

    with _scratch("q291_vec_") as base:
        sink, man = f"{base}/sink", f"{base}/man"
        emb = (
            load_table(spark, sf, "embeddings")
            .select(
                "vec_id",
                F.col("embedding").cast("array<double>").alias("embedding"),
            )
            .persist()  # feeds count/max, the sink write and the opt-outs
        )
        n = emb.count()
        hi = emb.agg(F.max("vec_id").alias("m")).collect()[0]["m"]
        w = hi // 4 + 1
        df = emb.select(
            "vec_id",
            "embedding",
            F.expr(f"vec_id div {w}").cast("int").alias("batch"),
        )
        df.write.partitionBy("batch").parquet(sink)
        batches = sorted(
            int(r["batch"]) for r in df.select("batch").distinct().collect()
        )
        for b in batches:
            (
                collect_file_stats(spark, f"{sink}/batch={b}", ["vec_id"])
                .withColumn("batch", F.lit(b))
                .write.mode("append")
                .partitionBy("batch")
                .parquet(man)
            )
        doomed = emb.filter(F.col("vec_id") % 17 == 0).select("vec_id")
        rep = erase_rows(spark, sink, man, "vec_id", doomed).persist()
        n_erased = int(rep.agg(F.sum("rows_erased")).collect()[0][0])
        rep.unpersist()
        emb.unpersist()
        consistent = bool(
            manifest_consistency_audit(spark, sink, man)
            .collect()[0]["consistent"]
        )
        survivors = (
            spark.read.option("basePath", sink)
            .parquet(sink)
            .select("vec_id", "embedding")
            .persist()  # feeds the index, the probes, and completeness
        )
        cents = seed_centroids(survivors, 8)
        index = ivf_assign(survivors, cents).persist()
        n_index = index.count()
        complete = (
            index.select("vec_id")
            .join(survivors.select("vec_id"), "vec_id", "left_anti")
            .count()
            == 0
            and survivors.select("vec_id")
            .join(index.select("vec_id"), "vec_id", "left_anti")
            .count()
            == 0
        )
        queries = survivors.orderBy("vec_id").limit(5)
        topk = knn_bruteforce(
            index.select("vec_id", "embedding"), queries, k=10
        ).persist()
        n_topk = topk.count()
        n_doomed_hits = topk.filter(
            F.col("neighbor_id") % 17 == 0
        ).count()
        topk.unpersist()
        index.unpersist()
        survivors.unpersist()
        return spark.createDataFrame(
            [
                (
                    n,
                    n_erased,
                    n_index,
                    complete,
                    n_topk,
                    n_doomed_hits == 0,
                    consistent,
                )
            ],
            "n_vectors BIGINT, n_erased BIGINT, n_index_rows BIGINT, "
            "index_complete BOOLEAN, n_topk_rows BIGINT, "
            "no_doomed_in_topk BOOLEAN, consistent_after BOOLEAN",
        )


Q291_SQL = """
WITH e AS (SELECT count(*) AS n FROM embeddings),
     d AS (SELECT count(*) AS n FROM embeddings WHERE vec_id % 17 = 0)
SELECT CAST(e.n AS BIGINT) AS n_vectors,
       CAST(d.n AS BIGINT) AS n_erased,
       CAST(e.n - d.n AS BIGINT) AS n_index_rows,
       true AS index_complete,
       CAST(50 AS BIGINT) AS n_topk_rows,
       true AS no_doomed_in_topk,
       true AS consistent_after
FROM e, d
"""


# ---------------------------------- capacity-aware temperature mixing
#
# q292: the redistribution step plan_epochs (q124/q139) stops short
# of. Capping a small source at `cap` epochs leaves part of the token
# budget unspent; real mixing recipes re-normalize so the excess flows
# to the uncapped sources — the water-filling fixpoint, which
# recipe.waterfill_budget solves in closed form (exclusive-cumsum
# threshold scan over the capacity/weight ratio order; equivalence to
# the iterative fixpoint pinned in tests/test_recipe.py). Here the mix
# axis is document LENGTH BANDS (tok div 16) — the curriculum/packing
# knob — whose token masses are naturally ~20x skewed, so with cap=2
# and budget = 1.5x the corpus the short bands cap and the scan does
# real cascade work at every scale. Every cumulative quantity is an
# exact integer/decimal sum (the q103 boundary pattern: sqrt + decimal
# casts, no libm); the oracle runs the identical scan, so allocations
# cross the hash gate bit-for-bit, not as banded booleans.

def q292_lengthband_waterfill(
    spark: SparkSession, sf: str
) -> DataFrame:
    from ..operators.recipe import waterfill_budget

    docs = load_table(spark, sf, "documents")
    per = (
        docs.select(T.token_count("text").cast("bigint").alias("tok"))
        .select(F.expr("tok div 16").cast("bigint").alias("band"), "tok")
        .groupBy("band")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("tok").cast("bigint").alias("avail_tokens"),
        )
        .persist()  # feeds the weight normalizer, the scan and the totals
    )
    # one bounded driver scalar (the date-spine-bounds precedent):
    # budget = 1.5x the corpus token mass, exact integer arithmetic
    tot = int(per.agg(F.sum("avail_tokens")).collect()[0][0])
    filled = waterfill_budget(
        per, "avail_tokens", budget=tot * 3 // 2, cap=2, key_cols=("band",)
    )
    return filled.select(
        "band",
        "n_docs",
        "avail_tokens",
        "capacity",
        "capped",
        "alloc_tokens",
        "water_level",
        (F.col("alloc_tokens") / F.col("avail_tokens").cast("double")).alias(
            "epochs_planned"
        ),
    )


Q292_SQL = r"""
WITH d AS (
  SELECT len(list_filter(regexp_split_to_array(
           trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '),
           x -> x <> '')) AS tok
  FROM documents
), per AS (
  SELECT CAST(tok // 16 AS BIGINT) AS band,
         count(*) AS n_docs,
         CAST(sum(tok) AS BIGINT) AS avail_tokens
  FROM d GROUP BY 1
), tot AS (
  SELECT CAST(sum(avail_tokens) AS BIGINT) AS tot_tokens FROM per
), shared AS (
  -- mirror waterfill_budget's avail > 0 drop: a zero-token band
  -- carries zero weight and zero capacity on the Spark side and is
  -- excluded from the fill (its tokens add nothing to tot_tokens, so
  -- the shares and budget are unchanged by the filter)
  SELECT band, n_docs, avail_tokens,
         CAST(avail_tokens AS DOUBLE) / CAST(tot_tokens AS DOUBLE) AS share,
         CAST(tot_tokens * 3 // 2 AS BIGINT) AS budget
  FROM per CROSS JOIN tot
  WHERE avail_tokens > 0
), weighted AS (
  SELECT *,
         CAST(sqrt(share) AS DECIMAL(18,9)) AS temp_w,
         CAST(avail_tokens * 2 AS BIGINT) AS capacity
  FROM shared
), norm AS (
  SELECT sum(CAST(temp_w AS DECIMAL(28,9))) AS z FROM weighted
), ranked AS (
  SELECT w.*, n.z,
         CAST(capacity AS DOUBLE) / CAST(temp_w AS DOUBLE) AS cap_ratio,
         COALESCE(CAST(sum(capacity) OVER scan AS BIGINT), 0) AS cum_c,
         COALESCE(sum(CAST(temp_w AS DECIMAL(28,9))) OVER scan,
                  CAST(0 AS DECIMAL(28,9))) AS cum_w
  FROM weighted w CROSS JOIN norm n
  WINDOW scan AS (
    ORDER BY CAST(capacity AS DOUBLE) / CAST(temp_w AS DOUBLE), band
    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
), flagged AS (
  SELECT *,
         (CAST(budget - cum_c AS DOUBLE) / CAST(z - cum_w AS DOUBLE))
           > cap_ratio AS capped
  FROM ranked
), tots AS (
  SELECT COALESCE(CAST(sum(CASE WHEN capped THEN capacity END) AS BIGINT),
                  0) AS c_cap,
         COALESCE(sum(CASE WHEN NOT capped
                           THEN CAST(temp_w AS DECIMAL(28,9)) END),
                  CAST(0 AS DECIMAL(28,9))) AS w_unc
  FROM flagged
), lam AS (
  SELECT f.*,
         CASE WHEN t.w_unc > 0
              THEN CAST(f.budget - t.c_cap AS DOUBLE)
                     / CAST(t.w_unc AS DOUBLE)
              ELSE 0.0 END AS water_level
  FROM flagged f CROSS JOIN tots t
)
SELECT band, n_docs, avail_tokens, capacity, capped,
       CASE WHEN capped THEN CAST(capacity AS DOUBLE)
            ELSE water_level * CAST(temp_w AS DOUBLE) END AS alloc_tokens,
       water_level,
       (CASE WHEN capped THEN CAST(capacity AS DOUBLE)
             ELSE water_level * CAST(temp_w AS DOUBLE) END)
         / CAST(avail_tokens AS DOUBLE) AS epochs_planned
FROM lam
"""


# ------------------------------------ integer sampling-schedule quotas
#
# q293: the step AFTER mixing — a sampling plan needs "how many
# sequences from each band", an INTEGER that sums to exactly the
# schedule size, not 8883.91 tokens. recipe.integer_apportion is
# Hamilton largest-remainder apportionment: floor everyone's
# real-valued entitlement, then hand the leftover units to the
# largest fractional parts (total-order tie-break on band). The
# operator REFUSES double weights — their normalizer would be an
# order-dependent parallel sum, nondeterministic on one engine and
# unreproducible across two — so the query feeds it the exact
# decimal(18,9) temperature weights; quota/floor/fraction are then
# correctly-rounded doubles of identical exact operands and the
# integer allocations cross the hash gate exactly.

def q293_apportion_schedule(
    spark: SparkSession, sf: str
) -> DataFrame:
    from ..operators.recipe import integer_apportion, with_temperature_weights

    docs = load_table(spark, sf, "documents")
    per = (
        docs.select(T.token_count("text").cast("bigint").alias("tok"))
        .select(F.expr("tok div 16").cast("bigint").alias("band"), "tok")
        .groupBy("band")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("tok").cast("bigint").alias("avail_tokens"),
        )
        .persist()  # feeds the weight normalizer and the apportionment
    )
    tot = int(per.agg(F.sum("avail_tokens")).collect()[0][0])
    # q292's token budget, cut into 512-token schedule slots
    total_seqs = (tot * 3 // 2) // 512
    weighted = with_temperature_weights(per, "avail_tokens")
    out = integer_apportion(
        weighted, "temp_w", total_seqs, key_cols=("band",)
    )
    return out.select(
        "band", "n_docs", "avail_tokens", "quota", "base", "extra", "alloc"
    )


Q293_SQL = r"""
WITH d AS (
  SELECT len(list_filter(regexp_split_to_array(
           trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '),
           x -> x <> '')) AS tok
  FROM documents
), per AS (
  SELECT CAST(tok // 16 AS BIGINT) AS band,
         count(*) AS n_docs,
         CAST(sum(tok) AS BIGINT) AS avail_tokens
  FROM d GROUP BY 1
), tot AS (
  SELECT CAST(sum(avail_tokens) AS BIGINT) AS tot_tokens FROM per
), shared AS (
  SELECT band, n_docs, avail_tokens,
         CAST(avail_tokens AS DOUBLE) / CAST(tot_tokens AS DOUBLE) AS share,
         CAST((tot_tokens * 3 // 2) // 512 AS BIGINT) AS total_seqs
  FROM per CROSS JOIN tot
), weighted AS (
  SELECT *, CAST(sqrt(share) AS DECIMAL(18,9)) AS temp_w
  FROM shared
), norm AS (
  SELECT sum(CAST(temp_w AS DECIMAL(38,9))) AS w_norm FROM weighted
), based AS (
  SELECT w.*,
         CAST(total_seqs AS DOUBLE) * CAST(temp_w AS DOUBLE)
           / CAST(n.w_norm AS DOUBLE) AS quota
  FROM weighted w CROSS JOIN norm n
), fl AS (
  SELECT *, CAST(floor(quota) AS BIGINT) AS base,
         quota - CAST(CAST(floor(quota) AS BIGINT) AS DOUBLE) AS frac
  FROM based
), rem AS (
  SELECT CAST((SELECT min(total_seqs) FROM fl) - sum(base) AS BIGINT)
           AS leftover
  FROM fl
), ranked AS (
  SELECT *, row_number() OVER (ORDER BY frac DESC, band) AS rk
  FROM fl
)
SELECT band, n_docs, avail_tokens, quota, base,
       CAST((rk <= leftover AND temp_w > 0) AS BIGINT) AS extra,
       base + CAST((rk <= leftover AND temp_w > 0) AS BIGINT) AS alloc
FROM ranked CROSS JOIN rem
"""


# ---------------------------------------------------------- registry
#
# Dormant: consumed only by tests/test_catalog_r14.py until the r14
# rotation merges this module into catalog_queries.py and splices
# these dicts at the main registry's window head.

R14_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "q287_erasure_concurrent_append": q287_erasure_concurrent_append,
    "q288_ivf_snapshot_maintenance": q288_ivf_snapshot_maintenance,
    "q289_incremental_dedup_snapshot_diff": (
        q289_incremental_dedup_snapshot_diff
    ),
    "q290_corpus_release_report": q290_corpus_release_report,
    "q291_vector_store_erasure": q291_vector_store_erasure,
    "q292_lengthband_waterfill": q292_lengthband_waterfill,
    "q293_apportion_schedule": q293_apportion_schedule,
}
R14_ORACLES: dict[str, str] = {
    "q287_erasure_concurrent_append": Q287_SQL,
    "q288_ivf_snapshot_maintenance": Q288_SQL,
    "q289_incremental_dedup_snapshot_diff": Q289_SQL,
    "q290_corpus_release_report": Q290_SQL,
    "q291_vector_store_erasure": Q291_SQL,
    "q292_lengthband_waterfill": Q292_SQL,
    "q293_apportion_schedule": Q293_SQL,
}

R14_QUERIES = {name: _canon_query(fn) for name, fn in R14_QUERIES.items()}
