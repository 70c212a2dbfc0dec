"""PySpark-native analytics engine with the capabilities of the reference
``Superstore-Data-Pipeline-Analytics-Dashboard`` repo (messy-CSV → star
schema → analytical views/dashboard), re-expressed Spark-first.

Layout:
    sources/    messy-CSV recovery reader, synthetic-star catalog, sinks
    functions/  scalar expression helpers (cleaning, dates, hashing, text, vectors)
    operators/  composite relational operators (dedup, SCD2, windows, similarity, ...)
    plans/      end-to-end pipelines (superstore ELT, dashboard serving layer)
    streaming/  Structured Streaming extensions (incremental fact append, QA counters)

Design rules (see SURVEY.md §7):
  * DataFrame/Spark SQL only — no RDDs, no row-at-a-time Python UDFs in hot paths.
  * Every expression uses built-in ``pyspark.sql.functions`` (JVM, codegen-able).
  * Dims are broadcast; facts are partitioned by date key; AQE is always on.
  * Deterministic tie-breaks everywhere the reference is nondeterministic.
"""

__version__ = "0.1.0"
