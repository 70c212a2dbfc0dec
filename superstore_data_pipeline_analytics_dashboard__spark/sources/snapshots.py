"""Reproducible snapshot reads ("as of") over the batch-partitioned
manifest sink — pin the exact table state a training run consumed.

The reproducibility contract a 100 TB training pipeline actually needs:
"re-running the data loader next month must read EXACTLY what the
January run read", while the table keeps ingesting. Lakehouse formats
answer with snapshot isolation (Delta's version log, Iceberg's
snapshot manifests). This module is that idea reduced to what the
existing sink (`streaming/incremental.start_append_with_manifest`:
one ``batch=<id>`` partition per micro-batch + a per-file zone-map
manifest) can honestly support:

* a snapshot is a **batch SET plus recorded content stats** (per-batch
  file and row counts), NOT a frozen file list. The sink overwrites a
  replayed batch in place with identical content under new writer-UUID
  file names, so file lists are the one thing that is NOT stable here
  — but batch content is, and as-of reads filter on the ``batch``
  partition key (static partition pruning; no data scanned outside the
  snapshot).
* the snapshot LOG reuses :mod:`operators.checkpoint`'s store
  (versioned ``v{N}`` dirs, ``_SUCCESS`` commit markers, stamped
  provenance): a torn commit is invisible, a foreign directory is
  rejected, and versions are monotone.
* as-of reads are SCHEMA-reproducible under column addition: member
  batches are read by path with ``mergeSchema``, so a pin's schema is
  the union of ITS member batches' schemas — columns added by later
  batches don't leak into old pins, and a pin spanning the evolution
  boundary reads merged with NULLs for pre-evolution batches.
* what a snapshot CANNOT survive — retention deleting a member batch,
  or a replay that landed different content — is detected, not hidden:
  :func:`snapshot_drift_audit` recounts the member batches against the
  recorded stats and reports missing batches and row drift as exact
  integers (the `streaming/audit.py` posture: the guarantee is a
  bounded query, not a promise).

Scale shape: a commit reads only the MANIFEST (#files rows) and writes
#batches rows; an as-of read collects the member-batch list (bounded:
operational batch grain, thousands at most) and scans only those
partitions; the ledger touches log rows only; the drift audit recounts
only the snapshot's own partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..operators import checkpoint as _ckpt

__all__ = [
    "commit_snapshot",
    "read_as_of",
    "snapshot_diff",
    "snapshot_ledger",
    "snapshot_drift_audit",
]

_META = {"op": "snapshot_log", "grain": "batch"}


def commit_snapshot(
    spark: SparkSession, manifest_path: str, log_path: str
) -> int:
    """Record the sink's CURRENT batch set as the next snapshot version;
    return that version (1-based).

    One row per member batch: ``(batch, n_files, n_rows)``, summarized
    from the manifest (never from the data — commit cost ∝ manifest
    rows). The write inherits the checkpoint store's crash semantics:
    a commit that dies mid-write leaves no ``_SUCCESS`` and the version
    is invisible to readers and to the next committer, which reuses the
    number."""
    man = spark.read.parquet(manifest_path)
    summary = (
        man.groupBy(F.col("batch").cast("long").alias("batch"))
        .agg(
            F.count(F.lit(1)).alias("n_files"),
            F.sum("n_rows").alias("n_rows"),
        )
        .coalesce(1)
    )
    version = (_ckpt.latest_iteration(spark, log_path) or 0) + 1
    _ckpt.save_state(summary, log_path, version, _META)
    return version


def _load_version(spark: SparkSession, log_path: str, version: int) -> DataFrame:
    have = _ckpt.complete_iterations(spark, log_path)
    if version not in have:
        raise ValueError(
            f"snapshot v{version} does not exist under {log_path} "
            f"(complete versions: {have or 'none'}) — never committed, "
            "torn commit, or removed by log retention"
        )
    return _ckpt.load_state(spark, log_path, version, _META)


def _read_batches(
    spark: SparkSession, sink_path: str, batches: list
) -> DataFrame:
    """Read exactly the given member-batch directories (path-level
    pruning — directories outside the set are never even listed), with
    ``mergeSchema`` so the result's schema is the union of the MEMBER
    batches' schemas and nothing else. This is the schema-evolution
    contract: a pin taken before a column was added must not grow that
    column later (a root-path read infers its schema from an arbitrary
    file of the WHOLE sink, so an old pin would nondeterministically
    sprout columns added by newer batches), and a snapshot spanning the
    evolution boundary reads merged, with NULLs for pre-evolution
    batches. ``basePath`` keeps the ``batch`` partition column."""
    paths = [f"{sink_path}/batch={b}" for b in batches]
    return (
        spark.read.option("mergeSchema", "true")
        .option("basePath", sink_path)
        .parquet(*paths)
    )


def read_as_of(
    spark: SparkSession, sink_path: str, log_path: str, version: int
) -> DataFrame:
    """The sink's rows as of snapshot ``version`` — exactly the batches
    that version recorded, read by PATH (only member directories are
    listed/scanned) with the snapshot's own merged schema
    (:func:`_read_batches` — columns added by post-pin batches do not
    exist here, which is what makes the pin reproducible under schema
    evolution). The member list is collected to the driver: bounded
    state, one id per batch. Content-stable across batch replays; NOT
    proof against retention or content damage — run
    :func:`snapshot_drift_audit` before trusting a months-old pin."""
    snap = _load_version(spark, log_path, version)
    batches = [r["batch"] for r in snap.select("batch").collect()]
    if not batches:
        raise ValueError(
            f"snapshot v{version} recorded no member batches — there is "
            "no schema to read it with"
        )
    return _read_batches(spark, sink_path, batches)


def snapshot_diff(
    spark: SparkSession,
    sink_path: str,
    log_path: str,
    from_version: int,
    to_version: int,
) -> DataFrame:
    """Rows added between two snapshots — the incremental-training read
    ("everything since the pin I last trained on") at batch-partition
    cost, never a row-level anti-join: the sink is append-only at batch
    grain, so the delta is exactly the batches in ``to_version`` that
    ``from_version`` lacks, read via the same static partition filter
    as :func:`read_as_of`. Batch membership is set difference on the
    two recorded member lists (bounded driver state). Raises if
    ``from_version`` is not older than ``to_version``; batch REWRITES
    (erasure, replay damage) are not diffable this way — that is what
    :func:`snapshot_drift_audit` detects on the older pin."""
    if from_version >= to_version:
        raise ValueError(
            f"from_version must be older: got {from_version} >= {to_version}"
        )
    # ONE tagged action fetches both versions' member lists (was two
    # driver-sequenced collects over bounded metadata — r14 job-count
    # fold; values identical, membership still validated per version
    # by _load_version before the plan is built)
    members = (
        _load_version(spark, log_path, from_version)
        .select(F.lit(0).alias("__t"), "batch")
        .unionByName(
            _load_version(spark, log_path, to_version).select(
                F.lit(1).alias("__t"), "batch"
            )
        )
        .collect()
    )
    old = {r["batch"] for r in members if r["__t"] == 0}
    to_members = [r["batch"] for r in members if r["__t"] == 1]
    if not to_members:
        # mirror read_as_of: a memberless pin has no schema to shape
        # even an empty delta with — fail the same way, not with a
        # zero-paths analysis error from the reader
        raise ValueError(
            f"snapshot v{to_version} recorded no member batches — there "
            "is no schema to read it with"
        )
    new = [b for b in to_members if b not in old]
    if not new:
        # empty delta, shaped like the newer pin (its merged schema)
        return _read_batches(spark, sink_path, to_members).filter(
            F.lit(False)
        )
    return _read_batches(spark, sink_path, new)


def snapshot_ledger(spark: SparkSession, log_path: str) -> DataFrame:
    """One row per committed version: ``(version, n_batches, n_files,
    n_rows, rows_added)`` — the commit history as a queryable table
    (``rows_added`` = delta vs the previous SURVIVING version; the
    oldest surviving version counts all its rows as added — log
    retention may have removed earlier ones). Cost ∝ log rows."""
    versions = _ckpt.complete_iterations(spark, log_path)
    if not versions:
        raise ValueError(f"no complete snapshot under {log_path}")
    per_version = None
    for v in versions:
        # membership just verified against the single listing above —
        # load directly rather than via _load_version, whose existence
        # re-check would re-list the log directory once per version
        one = (
            _ckpt.load_state(spark, log_path, v, _META)
            .agg(
                F.count(F.lit(1)).alias("n_batches"),
                F.sum("n_files").alias("n_files"),
                F.sum("n_rows").alias("n_rows"),
            )
            .select(F.lit(v).cast("long").alias("version"), "*")
        )
        per_version = one if per_version is None else per_version.unionByName(one)
    w = Window.orderBy("version")
    return per_version.withColumn(
        "rows_added",
        F.col("n_rows") - F.coalesce(F.lag("n_rows").over(w), F.lit(0)),
    )


def snapshot_drift_audit(
    spark: SparkSession, sink_path: str, log_path: str, version: int
) -> DataFrame:
    """Is snapshot ``version`` still reproducible? One-row exact-integer
    report: ``n_batches`` (recorded members), ``n_missing_batches``
    (recorded but no longer on disk — retention ate a member),
    ``n_row_drift_batches`` (present but the row count changed — a
    replay landed different content, or a partial rewrite),
    ``n_rows_recorded``/``n_rows_current``, and ``reproducible`` =
    both violation counts are zero. Recount cost is a count over the
    snapshot's own partitions only."""
    snap = _load_version(spark, log_path, version)
    batches = [r["batch"] for r in snap.select("batch").collect()]
    current = (
        spark.read.parquet(sink_path)
        .filter(F.col("batch").isin(batches))
        .groupBy(F.col("batch").cast("long").alias("batch"))
        .agg(F.count(F.lit(1)).alias("cur_rows"))
    )
    j = snap.join(current, "batch", "left")
    rep = j.agg(
        F.count(F.lit(1)).alias("n_batches"),
        F.coalesce(
            F.sum(F.col("cur_rows").isNull().cast("long")), F.lit(0)
        ).alias("n_missing_batches"),
        F.coalesce(
            F.sum(
                (
                    F.col("cur_rows").isNotNull()
                    & (F.col("cur_rows") != F.col("n_rows"))
                ).cast("long")
            ),
            F.lit(0),
        ).alias("n_row_drift_batches"),
        F.coalesce(F.sum("n_rows"), F.lit(0)).alias("n_rows_recorded"),
        F.coalesce(F.sum("cur_rows"), F.lit(0)).alias("n_rows_current"),
    )
    return rep.withColumn(
        "reproducible",
        (F.col("n_missing_batches") == 0) & (F.col("n_row_drift_batches") == 0),
    )
