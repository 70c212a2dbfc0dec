"""Benchmark runner: times every catalog query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "bench_total_sec", "value": N, "unit": "sec",
   "queries": {"q01_...": sec, ...}, "sf": 0.1}

Each query is fully materialized through the noop sink (measures compute +
shuffle, not driver collect).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from superstore_data_pipeline_analytics_dashboard__spark.plans.catalog_queries import QUERIES
from superstore_data_pipeline_analytics_dashboard__spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0

    spark = get_spark(app_name="superstore-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm up the JVM so the first timed query is not charged session
    # startup, first-touch parquet footer reads, page decode, or the C2
    # JIT of whole-stage-codegen classes. A bare count() is served from
    # row-group metadata, so hash every column to force real column
    # decode; then run one throwaway join+agg+window mini-pipeline so the
    # codegen paths the catalog leans on are compiled before timing.
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    for t in ("lineitem", "orders", "events", "documents", "embeddings"):
        df = spark.read.parquet(f"{sf_dir}/{t}.parquet")
        df.select(F.count(F.xxhash64(*df.columns)).alias("h")).collect()

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").limit(20000)
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").limit(20000)
    w = Window.partitionBy("l_returnflag").orderBy("l_orderkey").rowsBetween(-5, 0)
    (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .withColumn("r", F.sum("l_quantity").over(w))
        .groupBy("l_returnflag")
        .agg(F.sum("r").alias("s"), F.count(F.lit(1)).alias("n"))
        .write.format("noop").mode("overwrite").save()
    )

    # Run every catalog query once, untimed, at the smallest scale factor
    # available: whole-stage-codegen classes are plan-shaped, not
    # data-sized, so this compiles each query's generated code (and C2-JITs
    # the hot loops) for pennies. Without it the first ~10 timed queries
    # absorb the JVM's entire compile budget and read ~2x slower than the
    # same query placed late in the run — registry ORDER would otherwise
    # leak into per-query timings.
    warm_dir = f"{sf_dir.rsplit('sf', 1)[0]}sf0.001" if "sf" in sf_dir else sf_dir
    if not os.path.isdir(warm_dir):
        warm_dir = sf_dir
    for name, fn in QUERIES.items():
        try:
            fn(spark, warm_dir).write.format("noop").mode("overwrite").save()
        except Exception as e:
            print(f"# warmup {name} failed: {e}", file=sys.stderr)

    # Queries persist() their multi-consumer intermediates and nothing
    # unpersists them (one-shot driver semantics) — so cached plan
    # entries accumulate across the run, and CacheManager's
    # plan-substitution lookup scans EVERY cached entry per new plan.
    # Clearing before each timed query (which also flushes the warmup
    # pass's entries on the first iteration) keeps each timing
    # standalone — no cross-query InMemoryRelation substitution, no
    # growing lookup cost.
    timings: dict[str, float] = {}
    total = 0.0
    for name, fn in QUERIES.items():
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        try:
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            timings[name] = round(dt, 3)
            total += dt
        except Exception as e:  # keep the bench line parseable even on failure
            timings[name] = -1.0
            print(f"# {name} failed: {e}", file=sys.stderr)

    # Key order matters: the driver records only the LAST ~2000 chars of
    # this line (BENCH_r0N.json stores a "tail" field), and the per-query
    # timings dict alone exceeds that. The headline fields
    # (metric/value/unit/sf/n_queries) therefore go AFTER "queries" so a
    # tail-truncated capture still contains the totals (VERDICT r5 item
    # 5). Within "queries", the SLOWEST 20 are emitted last — ascending,
    # so the heaviest sit closest to the always-surviving headline —
    # making the queries that dominate the total comparable round over
    # round regardless of where the truncation point lands or how the
    # audit-window rotation scrambles execution order (VERDICT r7 item
    # 2: only 17/250 timings were comparable across r6/r7). Failures
    # (-1.0 sentinels) sort below every real timing, so they stay in the
    # front block unless ≥231 queries fail.
    # name tie-break: tied timings must not fall back to set/hash order,
    # or the pair would swap positions (and truncation survival) per run
    slowest = set(sorted(timings, key=lambda q: (timings[q], q))[-20:])
    ordered = {q: t for q, t in timings.items() if q not in slowest}
    ordered.update(
        sorted(((q, timings[q]) for q in slowest), key=lambda kv: (kv[1], kv[0]))
    )
    print(
        json.dumps(
            {
                "queries": ordered,
                "metric": "bench_total_sec",
                "value": round(total, 3),
                "unit": "sec",
                "sf": sf,
                "n_queries": len(timings),
                # failures record -1.0 sentinels in the (truncatable)
                # per-query dict — surface the count in the headline too
                "n_failed": sum(1 for v in timings.values() if v < 0),
            }
        )
    )


if __name__ == "__main__":
    main()
