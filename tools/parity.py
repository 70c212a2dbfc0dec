"""Local replica of the driver's DuckDB-oracle correctness gate.

Runs every ``queries()[name]`` on Spark and the matching ``oracle_sql()``
on DuckDB over the same parquet tables, then compares row count, column
names, and an order-insensitive value comparison (sorted rows, stringified
with stable formatting).

Usage: python tools/parity.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb

from superstore_data_pipeline_analytics_dashboard__spark.session import get_spark
from superstore_data_pipeline_analytics_dashboard__spark.sources.catalog import TABLES


def _norm_cell(v):
    import datetime
    import decimal
    import math

    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, datetime.datetime):
        return v.date().isoformat() if v.time() == datetime.time() else v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    return str(v)


def _normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for row in rows:
        out.append(tuple(_norm_cell(row[i]) for i in order))
    out.sort()
    return out


def compare(name, spark_df, con, sql) -> list[str]:
    problems = []
    s_cols = [c.lower() for c in spark_df.columns]
    s_rows = [tuple(r) for r in spark_df.collect()]
    rel = con.execute(sql)
    d_cols = [d[0].lower() for d in rel.description]
    d_rows = rel.fetchall()

    if sorted(s_cols) != sorted(d_cols):
        problems.append(f"columns differ: spark={sorted(s_cols)} duck={sorted(d_cols)}")
        return problems
    if len(s_rows) != len(d_rows):
        problems.append(f"row count differs: spark={len(s_rows)} duck={len(d_rows)}")
    sn = _normalize(s_rows, s_cols)
    dn = _normalize(d_rows, d_cols)
    if sn != dn:
        diff_s = [r for r in sn if r not in set(dn)][:3]
        diff_d = [r for r in dn if r not in set(sn)][:3]
        problems.append(f"values differ; spark-only={diff_s} duck-only={diff_d}")
    return problems


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    spark = get_spark(master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            if name not in oracles:
                n = df.count()
                print(f"{name:<36} rows-only: {n} rows")
                continue
            problems = compare(name, df, con, oracles[name])
            if problems:
                failed.append(name)
                print(f"{name:<36} FAIL")
                for p in problems:
                    print(f"    {p}")
            else:
                print(f"{name:<36} OK")
        except Exception as e:
            failed.append(name)
            print(f"{name:<36} ERROR: {str(e)[:500]}")

    print()
    if failed:
        print(f"FAILED: {failed}")
        sys.exit(1)
    print("all queries match the oracle")


if __name__ == "__main__":
    main()
