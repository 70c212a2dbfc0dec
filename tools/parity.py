"""Local replica of the driver's DuckDB-oracle correctness gate.

Round-1 lesson (VERDICT.md "What's wrong" #2, ADVICE #3): the driver's
value-hash is sensitive to the CLIENT TYPE REPRESENTATION — a Spark
DECIMAL(18,2) and a DuckDB DECIMAL(38,2) hash differently even when every
value is equal, and a DuckDB HUGEINT sum differs from a Spark BIGINT sum.
A string-normalized compare (round 1's ``_norm_cell``) was green while the
driver was red 27 times.  This replica is therefore STRICTER than any
plausible driver hash:

* the SparkSession is **vanilla** — no engine configs — so any
  session-dependence (e.g. the events nanos read) surfaces locally;
* both results are pulled through **Arrow** and the canonical Arrow type
  of every column must match exactly (decimal precision included);
* float cells must be **bit-identical** (struct-packed), not repr-equal;
* TIMESTAMP columns are BANNED at the boundary outright (like DECIMAL):
  Spark exports tz-aware instants rendered in the SESSION timezone,
  DuckDB naive UTC wall-clock — both driver-representation-unstable.
  The canonical boundary converts them to epoch-microsecond BIGINT
  (`unix_micros` / `epoch_us`) on both sides.

Usage: python tools/parity.py [sf_dir] [query ...]
"""

from __future__ import annotations

import datetime
import math
import struct
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb
import pyarrow as pa

from superstore_data_pipeline_analytics_dashboard__spark.sources.catalog import TABLES

# ---------------------------------------------------------------- types


def canon_type(t: pa.DataType) -> str:
    """Canonical cross-client name for an Arrow type.

    Collapses large_* storage variants (a client-side detail) but keeps
    every semantic property: integer width, decimal precision AND scale,
    float width.  DuckDB HUGEINT surfaces as decimal128(38,0) and
    therefore (correctly) fails to match Spark's int64.
    """
    if pa.types.is_decimal(t):
        return f"decimal({t.precision},{t.scale})"
    if pa.types.is_large_string(t) or pa.types.is_string(t):
        return "string"
    if pa.types.is_large_binary(t) or pa.types.is_binary(t):
        return "binary"
    if pa.types.is_timestamp(t):
        return "timestamp"  # banned at the boundary — see compare()
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_large_list(t) or pa.types.is_list(t):
        return f"list<{canon_type(t.value_type)}>"
    if pa.types.is_map(t):
        return f"map<{canon_type(t.key_type)},{canon_type(t.item_type)}>"
    if pa.types.is_struct(t):
        inner = ",".join(f"{f.name}:{canon_type(f.type)}" for f in t)
        return f"struct<{inner}>"
    return str(t)


def _norm_cell(v):
    """Canonical, type-tagged form of one cell for exact comparison."""
    if v is None:
        return "∅"
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "nan")
        return ("f", struct.pack("<d", v))
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, datetime.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(datetime.timezone.utc).replace(tzinfo=None)
        return ("ts", v.isoformat())
    if isinstance(v, datetime.date):
        return ("d", v.isoformat())
    if isinstance(v, (list, tuple)):
        return ("l",) + tuple(_norm_cell(x) for x in v)
    if isinstance(v, dict):
        return ("m",) + tuple(
            (k, _norm_cell(x)) for k, x in sorted(v.items(), key=lambda kv: str(kv[0]))
        )
    if isinstance(v, (bytes, bytearray)):
        return ("y", bytes(v))
    # Decimal and str both stringify scale-faithfully
    return (type(v).__name__, str(v))


def _rows(table: pa.Table) -> list[tuple]:
    cols = sorted(table.column_names)
    data = [table.column(c).to_pylist() for c in cols]
    out = [tuple(_norm_cell(col[i]) for col in data) for i in range(table.num_rows)]
    out.sort(key=repr)
    return out


def compare(name: str, spark_df, con, sql: str) -> list[str]:
    problems: list[str] = []
    s_tab = spark_df.toArrow()
    d_tab = con.execute(sql).arrow()

    s_cols = {c.lower() for c in s_tab.column_names}
    d_cols = {c.lower() for c in d_tab.column_names}
    if s_cols != d_cols:
        problems.append(f"columns differ: spark={sorted(s_cols)} duck={sorted(d_cols)}")
        return problems

    s_types = {f.name.lower(): canon_type(f.type) for f in s_tab.schema}
    d_types = {f.name.lower(): canon_type(f.type) for f in d_tab.schema}
    for c in sorted(s_cols):
        if s_types[c] != d_types[c]:
            problems.append(f"type of {c!r} differs: spark={s_types[c]} duck={d_types[c]}")
        for side, t in (("spark", s_types[c]), ("duck", d_types[c])):
            # decimals reach pandas as Decimal objects on one client and
            # float64 on the other; timestamps render session-tz-aware on
            # Spark and naive-UTC on DuckDB — both banned at the
            # canonical boundary (epoch-us BIGINT instead for timestamps)
            if "decimal" in t or "timestamp" in t:
                problems.append(f"banned boundary type on {side}: {c!r} is {t}")
    if problems:
        return problems

    if s_tab.num_rows != d_tab.num_rows:
        problems.append(f"row count differs: spark={s_tab.num_rows} duck={d_tab.num_rows}")
        return problems

    sn, dn = _rows(s_tab), _rows(d_tab)
    if sn != dn:
        dset, sset = set(map(repr, dn)), set(map(repr, sn))
        diff_s = [r for r in sn if repr(r) not in dset][:3]
        diff_d = [r for r in dn if repr(r) not in sset][:3]
        problems.append(f"values differ; spark-only={diff_s} duck-only={diff_d}")
    return problems


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    # vanilla session on purpose — the driver gate builds its own; any
    # engine-config dependence must fail HERE, not in CORRECTNESS_r{N}.
    # The one deliberate config is a HOSTILE session timezone: the
    # driver's tz is unknown, so any query whose result depends on it
    # (e.g. deriving a calendar date from a TIMESTAMP instant — round-2's
    # q30 bug) must mismatch the UTC-wall-clock DuckDB oracle locally.
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "America/New_York")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    # a typo'd or still-staged name must be a loud error, not a silent
    # skip that prints "all queries match the oracle" while executing
    # nothing (ADVICE r12)
    unknown = only - set(qs)
    if unknown:
        print(f"ERROR: not in the registry: {sorted(unknown)}")
        sys.exit(2)

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
