"""Targeted erasure over the batch-partitioned manifest sink — the
compliance delete ("right to be forgotten" / opt-out list) a training
corpus must support, without rewriting the table.

At 100 TB the naive delete — read everything, anti-join, write
everything — costs a full table rewrite for an opt-out list of a few
thousand keys. The manifest (``sources/manifest.py``) already knows
each batch's key envelope, so erasure prunes first: only partitions
whose [min, max] can contain a doomed key are rewritten; everything
else is untouched (zero read, zero write). With a range-clustered
layout (z-order or range ingest) the affected set is tiny; with a
random layout every envelope spans the key space and erasure honestly
degrades to the full rewrite — the same clustered-vs-random contrast
the zone-map tests demonstrate for reads.

Mechanics per affected partition: anti-join against the (broadcast)
key list, write to a staging directory, then swap via rename and
refresh that batch's manifest rows. The swap is rename-based:
crash-windows are (a) after old-dir removal and before staging rename
— the partition is missing, which ``manifest_consistency_audit``
reports as stale manifest rows; (b) after swap and before the manifest
refresh — stats drift, which the same audit reports as row mismatches.
On object stores without cheap rename, land the staging dir as the new
partition location and flip a pointer instead (the manifest IS that
pointer in this layout). The residual ``.trash`` directory left by a
crash inside the swap is overwrite-safe on the next erasure.

Erasure deliberately BREAKS old snapshots (``sources/snapshots.py``):
a version that recorded the pre-erasure row counts now fails its drift
audit — correct, auditable behavior: compliance deletion must win over
reproducibility, and the audit is how a reader finds out rather than
silently training on a smaller pin.
"""

from __future__ import annotations

import functools
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .manifest import collect_file_stats

__all__ = ["erase_rows"]


def erase_rows(
    spark: SparkSession,
    sink_path: str,
    manifest_path: str,
    key_col: str | Sequence[str],
    keys: DataFrame,
) -> DataFrame:
    """Delete every row whose ``key_col`` value (or composite tuple,
    when a list of columns is given) appears in ``keys`` from the sink,
    rewriting only the batch partitions whose manifest envelope
    intersects the key list. Returns the erasure report — one row per
    batch: ``(batch, rewritten, rows_before, rows_erased, rows_after)``
    with ``rewritten`` false for envelope-pruned (untouched) batches —
    exact integers, the compliance evidence.

    Composite keys make pruning MULTIPLICATIVE on clustered layouts: a
    batch can contain a doomed ``(a, b)`` tuple only if ``a`` fits its
    ``a``-envelope AND ``b`` fits its ``b``-envelope, so a z-order /
    grid-clustered sink confines the rewrite to the intersecting cells
    — a single-column envelope would rewrite the whole stripe along
    the other dimension. Every key column must have recorded
    ``min_/max_`` stats in the manifest (raises otherwise); the
    manifest refresh re-collects stats for ALL columns the manifest
    tracks, not just the erasure keys, so later pruned reads on other
    columns stay correct.

    Scale shape: candidate selection is one pass of the key list over
    the broadcast per-batch envelope table (#batches rows); each
    affected partition costs one anti-join rewrite of ITS OWN data;
    the key list is broadcast into those rewrites (opt-out lists are
    key-sized, not data-sized). The per-partition loop runs on the
    driver but holds only batch ids and counts — never rows.

    NULL keys in the opt-out list RAISE (same NULL-policy documentation
    pattern as operators/topk.py): both the envelope range semi-join
    and the per-partition ``==`` anti-join are null-rejecting, so a
    NULL entry would be a silent no-op — for a compliance delete,
    "silently did not erase" is the one unacceptable behavior. A NULL
    cannot identify a data subject; callers holding NULL-keyed sink
    rows they want gone should delete them by predicate, not by key
    list."""
    cols = [key_col] if isinstance(key_col, str) else list(key_col)
    man = spark.read.parquet(manifest_path)
    stat_cols = [c[len("min_") :] for c in man.columns if c.startswith("min_")]
    unenveloped = [c for c in cols if c not in stat_cols]
    if unenveloped:
        raise ValueError(
            f"erase_rows: manifest records no min_/max_ stats for "
            f"{unenveloped} (has: {stat_cols}) — rebuild the manifest "
            "with these columns before keyed erasure"
        )
    env = man.groupBy(F.col("batch").cast("long").alias("batch")).agg(
        F.sum("n_rows").alias("rows_before"),
        *(
            a
            for c in cols
            for a in (
                F.min(f"min_{c}").alias(f"lo_{c}"),
                F.max(f"max_{c}").alias(f"hi_{c}"),
            )
        ),
    )
    # envelopes are #batches rows — collected NOW, because the report
    # must describe the PRE-erasure manifest and everything below
    # mutates it (the one-shot-lazy trap: a frame read lazily after the
    # rewrite would silently describe the post-erasure state)
    env_rows = env.collect()
    before_counts = {int(r["batch"]): int(r["rows_before"]) for r in env_rows}
    k = (
        keys.select(*(F.col(c).alias(f"k_{c}") for c in cols))
        .distinct()
        .persist()
    )
    k.count()  # materialize once; reused per affected partition
    # docstring NULL policy: a NULL opt-out key would no-op silently
    # through every null-rejecting join below — refuse it loudly
    any_null = functools.reduce(
        lambda a, b: a | b, (F.col(f"k_{c}").isNull() for c in cols)
    )
    if k.filter(any_null).count():
        k.unpersist()
        raise ValueError(
            "erase_rows: opt-out key list contains NULL — a NULL cannot "
            "identify a data subject and would silently erase nothing "
            "(null-rejecting envelope/anti joins); drop it or delete "
            "NULL-keyed rows by predicate instead"
        )
    in_env = functools.reduce(
        lambda a, b: a & b,
        (
            (F.col(f"k_{c}") >= F.col(f"lo_{c}"))
            & (F.col(f"k_{c}") <= F.col(f"hi_{c}"))
            for c in cols
        ),
    )
    hit = env.join(k, in_env, "left_semi").select("batch").collect()
    affected = sorted(int(r["batch"]) for r in hit)

    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    report = []
    for b in affected:
        part = f"{sink_path}/batch={b}"
        before = spark.read.parquet(part)
        same_key = functools.reduce(
            lambda a, b: a & b,
            (before[c] == F.col(f"k_{c}") for c in cols),
        )
        kept = before.join(F.broadcast(k), same_key, "left_anti")
        staging = f"{sink_path}/.erase_staging_batch={b}"
        kept.write.mode("overwrite").parquet(staging)
        # swap: old → trash, staging → live, drop trash. See module
        # docstring for the crash windows and which audit catches each.
        fs = jvm.org.apache.hadoop.fs.Path(part).getFileSystem(hconf)
        trash = jvm.org.apache.hadoop.fs.Path(f"{part}.trash")
        fs.delete(trash, True)
        if not fs.rename(jvm.org.apache.hadoop.fs.Path(part), trash):
            raise IOError(f"erase swap failed: could not retire {part}")
        if not fs.rename(
            jvm.org.apache.hadoop.fs.Path(staging),
            jvm.org.apache.hadoop.fs.Path(part),
        ):
            raise IOError(f"erase swap failed: could not land {staging}")
        fs.delete(trash, True)
        # one scan serves both the report count and the manifest refresh
        # (stats must be collected POST-swap: the manifest's `file`
        # column holds live URIs that pruned reads open directly)
        # refresh stats for EVERY column the manifest tracks (not just
        # the erasure keys) so other columns' pruned reads stay correct.
        # On a schema-evolved sink a pre-evolution batch may LACK a
        # tracked column — collect stats only for the columns this
        # batch actually has (asking for a missing one raises, and at
        # this point the file swap already happened: aborting here
        # would strand stale manifest rows with dead URIs), and pad the
        # missing ones as typed NULLs so the manifest schema is stable
        present = [c for c in stat_cols if c in before.columns]
        stats = collect_file_stats(spark, part, present).withColumn(
            "batch", F.lit(b)
        )
        man_types = {f.name: f.dataType for f in man.schema.fields}
        for c in stat_cols:
            if c not in present:
                stats = stats.withColumn(
                    f"min_{c}", F.lit(None).cast(man_types[f"min_{c}"])
                ).withColumn(
                    f"max_{c}", F.lit(None).cast(man_types[f"max_{c}"])
                )
        stats = stats.select(
            *[c for c in man.columns if c != "batch"], "batch"
        )
        stats.persist()
        n_after = stats.agg(F.sum("n_rows")).collect()[0][0] or 0
        if n_after > 0:
            (
                stats.write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("batch")
                .parquet(manifest_path)
            )
            stats.unpersist()
        else:
            stats.unpersist()
            # dynamic overwrite cannot replace a partition with ZERO
            # rows — drop the emptied batch's manifest rows directly,
            # or pruned reads would chase files that no longer exist
            fs.delete(
                jvm.org.apache.hadoop.fs.Path(f"{manifest_path}/batch={b}"),
                True,
            )
        report.append((b, n_after))

    kept_counts = dict(report)
    k.unpersist()
    rows = [
        (
            b,
            b in kept_counts,
            before_counts[b],
            before_counts[b] - kept_counts.get(b, before_counts[b]),
            kept_counts.get(b, before_counts[b]),
        )
        for b in sorted(before_counts)
    ]
    return spark.createDataFrame(
        rows,
        "batch BIGINT, rewritten BOOLEAN, rows_before BIGINT, "
        "rows_erased BIGINT, rows_after BIGINT",
    )
