"""Snapshot pinning over the batch-partitioned manifest sink
(sources/snapshots.py): commit versions, read as-of, ledger, and the
drift audit that makes a months-old pin trustable (or provably not).
"""

import shutil

import pytest
from pyspark.sql import functions as F

from superstore_data_pipeline_analytics_dashboard__spark.sources import (
    snapshots as SN,
)
from superstore_data_pipeline_analytics_dashboard__spark.sources.manifest import (
    collect_file_stats,
)
from superstore_data_pipeline_analytics_dashboard__spark.streaming import (
    incremental as S,
)


def _land_batch(spark, sink, man, batch_id, ids):
    """The sink's on-disk contract, written directly (one batch
    partition + its manifest rows) — what start_append_with_manifest
    does per micro-batch, without the streaming machinery."""
    df = spark.createDataFrame([(i,) for i in ids], "id BIGINT")
    df.coalesce(1).write.mode("overwrite").parquet(f"{sink}/batch={batch_id}")
    stats = collect_file_stats(
        spark, f"{sink}/batch={batch_id}", ["id"]
    ).withColumn("batch", F.lit(batch_id))
    (
        stats.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch")
        .parquet(man)
    )


def _ids(df):
    return sorted(r["id"] for r in df.select("id").collect())


def test_commit_and_read_as_of(spark, tmp_path):
    sink, man, log = (str(tmp_path / d) for d in ("sink", "man", "log"))
    _land_batch(spark, sink, man, 0, range(0, 100))
    assert SN.commit_snapshot(spark, man, log) == 1
    _land_batch(spark, sink, man, 1, range(100, 250))
    assert SN.commit_snapshot(spark, man, log) == 2
    # the pin holds while the table keeps growing
    assert _ids(SN.read_as_of(spark, sink, log, 1)) == list(range(0, 100))
    assert _ids(SN.read_as_of(spark, sink, log, 2)) == list(range(0, 250))
    with pytest.raises(ValueError, match="does not exist"):
        SN.read_as_of(spark, sink, log, 3)
    # as-of reads prune at PATH level: only member directories are
    # listed/read (stronger than a PartitionFilters compile — non-member
    # dirs are never even enumerated), and no data-level filter exists
    pinned = SN.read_as_of(spark, sink, log, 1)
    files = pinned.inputFiles()
    assert files and all("/batch=0/" in f for f in files), files
    plan = pinned._jdf.queryExecution().executedPlan().toString()
    scan = next(ln for ln in plan.split("\n") if "FileScan" in ln)
    assert "DataFilters: []" in scan, scan


def test_ledger(spark, tmp_path):
    sink, man, log = (str(tmp_path / d) for d in ("sink", "man", "log"))
    _land_batch(spark, sink, man, 0, range(0, 100))
    SN.commit_snapshot(spark, man, log)
    _land_batch(spark, sink, man, 1, range(100, 250))
    SN.commit_snapshot(spark, man, log)
    rows = {
        r["version"]: r for r in SN.snapshot_ledger(spark, log).collect()
    }
    assert rows[1]["n_batches"] == 1 and rows[1]["n_rows"] == 100
    assert rows[2]["n_batches"] == 2 and rows[2]["n_rows"] == 250
    assert rows[1]["rows_added"] == 100 and rows[2]["rows_added"] == 150
    with pytest.raises(ValueError, match="no complete snapshot"):
        SN.snapshot_ledger(spark, str(tmp_path / "empty"))


def test_drift_audit_detects_retention_and_content_damage(spark, tmp_path):
    sink, man, log = (str(tmp_path / d) for d in ("sink", "man", "log"))
    _land_batch(spark, sink, man, 0, range(0, 100))
    SN.commit_snapshot(spark, man, log)
    _land_batch(spark, sink, man, 1, range(100, 250))
    SN.commit_snapshot(spark, man, log)
    ok = SN.snapshot_drift_audit(spark, sink, log, 2).collect()[0]
    assert ok["reproducible"] and ok["n_rows_recorded"] == 250

    # content damage: batch 1 partially rewritten
    _land_batch(spark, sink, man, 1, range(100, 200))
    drift = SN.snapshot_drift_audit(spark, sink, log, 2).collect()[0]
    assert not drift["reproducible"]
    assert drift["n_row_drift_batches"] == 1
    assert drift["n_rows_current"] == 200

    # retention ate a member batch: the audit reports it as exact
    # integers, and the PATH-level as-of read now fails LOUDLY (the
    # member directory is gone) instead of silently returning fewer
    # rows — partial damage (row drift inside a surviving batch) is
    # still silent at read time, which is why the audit exists
    shutil.rmtree(f"{sink}/batch=0")
    gone = SN.snapshot_drift_audit(spark, sink, log, 1).collect()[0]
    assert not gone["reproducible"] and gone["n_missing_batches"] == 1
    with pytest.raises(Exception, match="PATH_NOT_FOUND|does not exist"):
        SN.read_as_of(spark, sink, log, 1).collect()


def test_schema_evolution_under_pins(spark, tmp_path):
    """Column addition mid-table: the v1 pin (pre-evolution) must NOT
    grow the new column; a pin spanning the boundary reads merged with
    NULLs for pre-evolution batches; the diff between them carries the
    evolved schema."""
    from superstore_data_pipeline_analytics_dashboard__spark.sources.manifest import (
        collect_file_stats,
    )

    sink, man, log = (str(tmp_path / d) for d in ("sink", "man", "log"))
    _land_batch(spark, sink, man, 0, range(0, 100))
    assert SN.commit_snapshot(spark, man, log) == 1
    # batch 1 lands with an EVOLVED schema (adds `score`)
    evolved = spark.range(100, 250).select(
        F.col("id"), (F.col("id") * 2).alias("score")
    )
    evolved.coalesce(1).write.mode("overwrite").parquet(f"{sink}/batch=1")
    stats = collect_file_stats(spark, f"{sink}/batch=1", ["id"]).withColumn(
        "batch", F.lit(1)
    )
    (
        stats.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch")
        .parquet(man)
    )
    assert SN.commit_snapshot(spark, man, log) == 2

    v1 = SN.read_as_of(spark, sink, log, 1)
    assert sorted(v1.columns) == ["batch", "id"]  # no phantom column
    assert _ids(v1) == list(range(0, 100))
    v2 = SN.read_as_of(spark, sink, log, 2)
    assert sorted(v2.columns) == ["batch", "id", "score"]
    assert _ids(v2) == list(range(0, 250))
    # merged read: pre-evolution rows carry NULL score
    nulls = v2.filter(F.col("score").isNull())
    assert _ids(nulls) == list(range(0, 100))
    # the incremental read between the pins is evolved-shaped
    delta = SN.snapshot_diff(spark, sink, log, 1, 2)
    assert sorted(delta.columns) == ["batch", "id", "score"]
    assert _ids(delta) == list(range(100, 250))


def test_snapshot_diff(spark, tmp_path):
    sink, man, log = (str(tmp_path / d) for d in ("sink", "man", "log"))
    _land_batch(spark, sink, man, 0, range(0, 100))
    SN.commit_snapshot(spark, man, log)
    _land_batch(spark, sink, man, 1, range(100, 250))
    _land_batch(spark, sink, man, 2, range(250, 300))
    SN.commit_snapshot(spark, man, log)
    assert _ids(SN.snapshot_diff(spark, sink, log, 1, 2)) == list(
        range(100, 300)
    )
    SN.commit_snapshot(spark, man, log)  # v3 == v2: empty delta
    assert SN.snapshot_diff(spark, sink, log, 2, 3).count() == 0
    with pytest.raises(ValueError, match="must be older"):
        SN.snapshot_diff(spark, sink, log, 2, 2)


def test_ledger_property_vs_bruteforce(spark):
    """Property: over arbitrary commit cadences (including consecutive
    commits with no new batch) the ledger equals the Python recompute,
    and every as-of read returns exactly the rows landed before that
    commit."""
    import tempfile

    from hypothesis import given, settings
    from hypothesis import strategies as st

    # each step lands `size` new rows as one batch (0 = commit without
    # a new batch); commits happen after every step
    steps = st.lists(st.integers(min_value=0, max_value=5), min_size=1, max_size=4)

    @settings(max_examples=5, deadline=None)
    @given(sizes=steps)
    def run(sizes):
        base = tempfile.mkdtemp(prefix="ledger_prop_")
        sink, man, log = f"{base}/sink", f"{base}/man", f"{base}/log"
        landed, next_id, cum = [], 0, 0
        expected = []
        for s in sizes:
            if s > 0:
                _land_batch(spark, sink, man, len(landed), range(cum, cum + s))
                landed.append(s)
                cum += s
            # a commit with zero batches so far has nothing to record —
            # the manifest doesn't exist yet; skip like a real caller
            if not landed:
                continue
            SN.commit_snapshot(spark, man, log)
            expected.append((len(landed), cum))
        if not expected:
            return
        got = sorted(
            (r["version"], r["n_batches"], r["n_rows"], r["rows_added"])
            for r in SN.snapshot_ledger(spark, log).collect()
        )
        want = [
            (v + 1, nb, nr, nr - (expected[v - 1][1] if v else 0))
            for v, (nb, nr) in enumerate(expected)
        ]
        assert got == want
        for v, (_, nr) in enumerate(expected, start=1):
            assert _ids(SN.read_as_of(spark, sink, log, v)) == list(range(nr))

    run()


def test_log_retention_interplay(spark, tmp_path):
    """Running the checkpoint store's vacuum on a snapshot LOG is valid
    retention but destroys time travel to the removed versions — the
    error must say so, and the ledger must keep working over whatever
    survives."""
    from superstore_data_pipeline_analytics_dashboard__spark.operators.checkpoint import (
        vacuum,
    )

    sink, man, log = (str(tmp_path / d) for d in ("sink", "man", "log"))
    _land_batch(spark, sink, man, 0, range(0, 100))
    SN.commit_snapshot(spark, man, log)
    _land_batch(spark, sink, man, 1, range(100, 250))
    SN.commit_snapshot(spark, man, log)
    vacuum(spark, log, keep_last=1)
    with pytest.raises(ValueError, match="log retention"):
        SN.read_as_of(spark, sink, log, 1)
    assert _ids(SN.read_as_of(spark, sink, log, 2)) == list(range(0, 250))
    rows = SN.snapshot_ledger(spark, log).collect()
    assert [r["version"] for r in rows] == [2]
    # with v1 gone, v2's whole content counts as added
    assert rows[0]["rows_added"] == 250
    # the next commit continues the version sequence, not the hole
    _land_batch(spark, sink, man, 2, range(250, 300))
    assert SN.commit_snapshot(spark, man, log) == 3


def test_streaming_sink_end_to_end(spark, tmp_path):
    """Against the REAL sink: versions pin what each availableNow pass
    landed, and a full pre-checkpoint replay (fresh checkpoint, same
    drops) rewrites every batch with identical content — both pinned
    versions must still audit reproducible (content-stable, file-name
    unstable: the module docstring's central claim)."""
    drop = tmp_path / "in"
    spark.createDataFrame(
        [(i, i % 7) for i in range(0, 100)], "id BIGINT, v BIGINT"
    ).coalesce(1).write.parquet(str(drop / "b0"))
    sink, man, log = (str(tmp_path / d) for d in ("sink", "man", "log"))

    def _stream():
        return (
            spark.readStream.schema("id BIGINT, v BIGINT")
            .option("maxFilesPerTrigger", 1)
            .option("recursiveFileLookup", True)
            .parquet(str(drop))
        )

    S.start_append_with_manifest(
        _stream(), sink, man, str(tmp_path / "ck"), stat_cols=["id"]
    ).awaitTermination(120)
    assert SN.commit_snapshot(spark, man, log) == 1

    # table grows: second drop, SAME checkpoint — only the new file runs
    spark.createDataFrame(
        [(i, i % 7) for i in range(100, 200)], "id BIGINT, v BIGINT"
    ).coalesce(1).write.parquet(str(drop / "b1"))
    S.start_append_with_manifest(
        _stream(), sink, man, str(tmp_path / "ck"), stat_cols=["id"]
    ).awaitTermination(120)
    assert SN.commit_snapshot(spark, man, log) == 2

    assert _ids(SN.read_as_of(spark, sink, log, 1)) == list(range(0, 100))
    assert _ids(SN.read_as_of(spark, sink, log, 2)) == list(range(0, 200))

    # full replay: fresh checkpoint reprocesses both drops, overwriting
    # both batch partitions (new file names, same per-batch content)
    S.start_append_with_manifest(
        _stream(), sink, man, str(tmp_path / "ck2"), stat_cols=["id"]
    ).awaitTermination(120)
    for v in (1, 2):
        audit = SN.snapshot_drift_audit(spark, sink, log, v).collect()[0]
        assert audit["reproducible"], (v, audit)
    assert _ids(SN.read_as_of(spark, sink, log, 1)) == list(range(0, 100))
