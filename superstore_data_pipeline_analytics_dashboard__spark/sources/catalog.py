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
        # events.parquet stores ts as INT64 TIMESTAMP(NANOS), which Spark
        # rejects at schema inference unless nanosAsLong is on. The conf is
        # a runtime SQLConf, and callers (the driver gate included) hand us
        # vanilla sessions — so set it here, not at session build time.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # nanos read as bigint; integer-truncate to micros (ns values
        # overflow double precision) — the same conversion DuckDB applies.
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
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
