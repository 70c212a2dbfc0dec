"""Standalone per-query bench-protocol probe (optimization rounds).

Times named catalog queries exactly like bench.py (sf0.001 codegen
warmup of the probed query, `spark.catalog.clearCache()` before each
timed rep, full materialization through the noop sink) without paying
the 286-query warmup pass, and optionally dumps `.explain("formatted")`
for each probed query.

Usage:
    python tools/probe.py q285_journaled_store_reconciliation q26_minhash_dedup \
        [--reps 3] [--sf /root/testdata/sf0.1] [--explain plans/r13] [--suffix _before]

Output: one line per (query, rep) plus a median summary — stdout only,
no JSON contract (this is a developer tool, not the driver bench).
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from pathlib import Path
from statistics import median

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from superstore_data_pipeline_analytics_dashboard__spark.plans.catalog_queries import (
    QUERIES,
)
from superstore_data_pipeline_analytics_dashboard__spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument(
        "--explain",
        default=None,
        help="directory to write <name><suffix>.txt formatted plans into",
    )
    ap.add_argument("--suffix", default="")
    ap.add_argument(
        "--no-warmup", action="store_true", help="skip the sf0.001 warmup rep"
    )
    args = ap.parse_args()

    unknown = [n for n in args.names if n not in QUERIES]
    if unknown:
        raise SystemExit(f"not in registry: {unknown}")

    spark = get_spark(app_name="superstore-probe")
    spark.sparkContext.setLogLevel("ERROR")

    warm_dir = "/root/testdata/sf0.001"
    if not os.path.isdir(warm_dir):
        # record the protocol deviation: bench.py warms at sf0.001
        print(f"# WARNING: {warm_dir} absent, warming at --sf scale")
        warm_dir = args.sf

    for name in args.names:
        fn = QUERIES[name]
        if not args.no_warmup:
            spark.catalog.clearCache()
            fn(spark, warm_dir).write.format("noop").mode("overwrite").save()
        if args.explain:
            os.makedirs(args.explain, exist_ok=True)
            spark.catalog.clearCache()
            df = fn(spark, args.sf)
            try:
                # private PySpark internals — fastest path on Spark 4.1
                plan = df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"
                )
            except Exception:
                # portable fallback: capture df.explain('formatted') stdout
                import contextlib
                import io

                buf = io.StringIO()
                with contextlib.redirect_stdout(buf):
                    df.explain("formatted")
                plan = buf.getvalue()
            out = Path(args.explain) / f"{name}{args.suffix}.txt"
            out.write_text(plan)
            print(f"# plan -> {out}")
        times = []
        if args.reps <= 0:  # plan-dump-only invocation
            continue
        for rep in range(args.reps):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            fn(spark, args.sf).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            times.append(dt)
            print(f"{name} rep{rep} {dt:.3f}s", flush=True)
        print(f"{name} median {median(times):.3f}s  all={[round(t,2) for t in times]}")


if __name__ == "__main__":
    main()
