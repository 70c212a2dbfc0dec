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

    # warm up the JVM + parquet footer caches so the first timed query is
    # not charged session startup or first-touch footer reads (events also
    # pays a one-time nanos-timestamp branch on first load)
    for t in ("lineitem", "orders", "events", "documents", "embeddings"):
        spark.read.parquet(f"{sf_dir}/{t}.parquet").count()

    timings: dict[str, float] = {}
    total = 0.0
    for name, fn in QUERIES.items():
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

    print(
        json.dumps(
            {
                "metric": "bench_total_sec",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
