"""Catalog over the driver's synthetic star schema (TESTDATA.md).

Tables: region nation customer supplier part orders lineitem events
documents embeddings — one parquet each under ``{sf_dir}/``.

Scale notes: ``lineitem``/``orders``/``events`` are the fact-sized tables;
everything else is dimension-sized and safe to broadcast. Readers never
``collect``; filters/projections stay declarative so parquet pushdown and
column pruning apply (verify with ``df.explain``: ``PushedFilters``,
``ReadSchema``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: tables small enough to broadcast at any scale factor we target
DIM_TABLES = frozenset({"region", "nation", "customer", "supplier", "part"})


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        # some testdata generations store ts as INT64 TIMESTAMP(NANOS),
        # which Spark rejects at schema inference unless nanosAsLong is on.
        # The conf is a runtime SQLConf, and callers (the driver gate
        # included) hand us vanilla sessions — set it here, not at session
        # build time.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        # Contract: events.ts is always TIMESTAMP_NTZ (UTC wall clock) no
        # matter how the parquet encoded it. NTZ is the only timestamp
        # type whose value survives an UNKNOWN session timezone (the
        # driver gate builds its own session): every conversion below is
        # pure integer arithmetic against an NTZ epoch literal — never a
        # cast through TimestampType, which resolves in the session tz.
        t = dict(df.dtypes).get("ts")
        if t == "bigint":
            # nanos-as-long: integer-truncate to micros (ns overflow
            # double precision), then shift the NTZ epoch.
            df = df.withColumn(
                "ts",
                F.expr(
                    "timestampadd(MICROSECOND, ts div 1000,"
                    " TIMESTAMP_NTZ'1970-01-01 00:00:00')"
                ),
            )
        elif t == "timestamp":
            # instant micros: unix_micros of an instant is absolute
            # (session-independent); re-anchor it as UTC wall clock.
            df = df.withColumn(
                "ts",
                F.expr(
                    "timestampadd(MICROSECOND, unix_micros(ts),"
                    " TIMESTAMP_NTZ'1970-01-01 00:00:00')"
                ),
            )
    return df


def load_star(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every synthetic-star table as a DataFrame keyed by name."""
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load and register each table as a temp view (for ``spark.sql``)."""
    dfs = load_star(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
