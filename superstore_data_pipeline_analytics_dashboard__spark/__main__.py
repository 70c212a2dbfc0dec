"""CLI: run the full superstore ELT and print the layer census.

    python -m superstore_data_pipeline_analytics_dashboard__spark \
        [csv_path] [--out DIR] [--compat] [--regions R1,R2] [--segments S1,S2]

Defaults to the reference CSV. With --out, persists the star (partitioned
fact). With slicers, also prints the filtered dashboard pivots.
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="superstore-spark")
    p.add_argument("csv", nargs="?", default="/root/reference/Project1/superstore.csv")
    p.add_argument("--out", default=None, help="write the star schema here")
    p.add_argument("--compat", action="store_true",
                   help="also show the observed-Excel compat pivot")
    p.add_argument("--regions", default=None)
    p.add_argument("--segments", default=None)
    args = p.parse_args(argv)

    from .plans import superstore_pipeline as P
    from .session import get_spark

    spark = get_spark(app_name="superstore-cli")
    spark.sparkContext.setLogLevel("ERROR")

    layers = P.run(spark, args.csv)
    print("layer census:")
    for name in ("stg_all", "stg", "dim_date", "dim_shipmode", "dim_category",
                 "dim_subcategory", "dim_geography", "dim_customer",
                 "dim_product", "fact"):
        print(f"  {name:<18} {layers[name].count():>8,} rows")
    print("\nqa.LoadIssues:")
    layers["qa_issues"].show(truncate=False)

    print("pivot: by category (intended semantics)")
    layers["pivot_by_category"].orderBy("Category").show(truncate=False)

    if args.regions or args.segments:
        regions = args.regions.split(",") if args.regions else None
        segments = args.segments.split(",") if args.segments else None
        out = P.dashboard_superstore(layers, regions=regions, segments=segments)
        print(f"dashboard slice regions={regions} segments={segments}:")
        out["by_category"].orderBy("Category").show(truncate=False)

    if args.compat:
        compat = P.excel_compat_table(spark, args.csv)
        print("observed-Excel compat pivot (workbook goldens):")
        P.pivot_by_category(compat).orderBy("Category").show(truncate=False)

    if args.out:
        P.write_star(layers, args.out)
        print(f"star written to {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
