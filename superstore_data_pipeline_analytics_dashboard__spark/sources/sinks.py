"""Table sinks + namespace DDL (SURVEY.md §2.1 S4-S7).

The reference materializes each layer into schemas ``raw/stg/dim/fact/qa``
(SQLproject1.sql:34-44) with drop-in-dependency-order DDL (:51-74) and
idempotent NOT-EXISTS appends (:612-615). Spark equivalents:

* namespaces  → ``CREATE DATABASE IF NOT EXISTS`` (S7)
* table sinks → parquet ``saveAsTable`` (Delta ``MERGE INTO`` slots in when
  the runtime has delta-spark; import-gated, never required) (S4/S6)
* idempotent append → left-anti against the live sink before append (S5)
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession

NAMESPACES = ("raw", "stg", "dim", "fact", "qa")


def ensure_namespaces(spark: SparkSession, namespaces: Sequence[str] = NAMESPACES) -> None:
    """S7 — CREATE SCHEMA raw/stg/dim/fact/qa (SQLproject1.sql:34-44)."""
    for ns in namespaces:
        spark.sql(f"CREATE DATABASE IF NOT EXISTS {ns}")


def drop_star(spark: SparkSession) -> None:
    """S7 — drop-in-dependency-order (children first, SQLproject1.sql:51-74).
    With IF EXISTS the order is cosmetic, but kept for parity."""
    for tbl in (
        "fact.sales", "qa.load_issues",
        "dim.product", "dim.customer", "dim.geography", "dim.subcategory",
        "dim.category", "dim.shipmode", "dim.date",
        "stg.superstore_typed", "raw.superstore",
    ):
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")


def save_table(df: DataFrame, name: str, partition_by: Sequence[str] | None = None) -> None:
    """S4/S6 — materialize a layer as a managed table."""
    writer = df.write.mode("overwrite").format("parquet")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.saveAsTable(name)


def append_idempotent(
    df: DataFrame, name: str, keys: Sequence[str]
) -> None:
    """S5 — append only rows whose key is absent (the reference's
    ``WHERE NOT EXISTS`` guard, SQLproject1.sql:612-615)."""
    spark = df.sparkSession
    if not spark.catalog.tableExists(name):
        df.write.mode("overwrite").format("parquet").saveAsTable(name)
        return
    existing = spark.table(name).select(*keys).distinct()
    fresh = df.join(existing, list(keys), "left_anti")
    fresh.write.mode("append").format("parquet").saveAsTable(name)


def save_bucketed(
    df: DataFrame,
    name: str,
    bucket_cols: Sequence[str],
    n_buckets: int = 16,
    sort_cols: Sequence[str] | None = None,
) -> None:
    """S4 at scale — bucketed managed table: co-locates join/agg keys at
    write time so later joins on `bucket_cols` between tables bucketed the
    same way run WITHOUT a shuffle (the Spark analog of the reference's
    clustered index on the natural key, SQLproject1.sql:723-736)."""
    writer = df.write.mode("overwrite").format("parquet").bucketBy(
        n_buckets, *bucket_cols
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(name)


def analyze_table(
    spark: SparkSession, name: str, columns: Sequence[str] | None = None
) -> None:
    """Collect catalog statistics for the cost-based optimizer — the
    at-scale step the reference's ``UPDATE STATISTICS`` habit maps to.
    Table-level stats (row count, size) always; with ``columns``, also
    per-column NDV/min/max/null-count histogram inputs, which is what
    lets Catalyst's CBO pick join orders and broadcast decisions on a
    1000-executor plan instead of falling back to size heuristics.
    Statistics are metadata-only: one scan, no data rewrite."""
    spark.sql(f"ANALYZE TABLE {name} COMPUTE STATISTICS")
    if columns:
        cols = ", ".join(columns)
        spark.sql(f"ANALYZE TABLE {name} COMPUTE STATISTICS FOR COLUMNS {cols}")


def save_star_catalog(
    spark: SparkSession, layers: dict[str, DataFrame], analyze: bool = False
) -> None:
    """Materialize the whole superstore star into the namespaced catalog
    (the reference's end state): dims overwrite, fact appends idempotently
    on (OrderID, OrderLineNo). With ``analyze``, collect CBO stats on the
    fact and its join keys after the load (the production default; off in
    quick tests)."""
    ensure_namespaces(spark)
    save_table(layers["stg"], "stg.superstore_typed")
    for dim in ("date", "shipmode", "category", "subcategory", "geography",
                "customer", "product"):
        save_table(layers[f"dim_{dim}"], f"dim.{dim}")
    append_idempotent(layers["fact"], "fact.sales", ["OrderID", "OrderLineNo"])
    save_table(layers["qa_issues"], "qa.load_issues")
    if analyze:
        analyze_table(spark, "fact.sales", ["OrderID", "ProductKey", "CustomerKey"])
