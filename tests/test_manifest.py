"""Zone-map manifest (sources/manifest.py): stats correctness, pruning
correctness (never drops a matching row), and the clustered-vs-random
selectivity contrast that motivates pairing it with the z-order writer."""

from __future__ import annotations

from pyspark.sql import functions as F

from superstore_data_pipeline_analytics_dashboard__spark.sources.manifest import (
    collect_file_stats,
    prune_files,
    read_pruned,
)


def _write(spark, path, ordered: bool, n=10_000, files=20):
    df = spark.range(n).select(
        F.col("id"),
        (F.col("id") % 97).alias("v"),
    )
    if ordered:
        # range-partitioned by id: each file owns a contiguous id band
        df.repartitionByRange(files, "id").write.parquet(path)
    else:
        # round-robin: every file spans near-global id bounds
        df.repartition(files).write.parquet(path)


def test_stats_cover_every_row_and_file(spark, tmp_path):
    path = str(tmp_path / "t1")
    _write(spark, path, ordered=True)
    stats = collect_file_stats(spark, path, ["id", "v"])
    rows = stats.collect()
    assert sum(r["n_rows"] for r in rows) == 10_000
    assert all(r["min_id"] <= r["max_id"] for r in rows)
    # global envelope matches the data
    assert min(r["min_id"] for r in rows) == 0
    assert max(r["max_id"] for r in rows) == 9_999


def test_pruned_read_is_exact(spark, tmp_path):
    """Manifest-driven read must return exactly the rows of the range
    predicate — pruning is an optimization, never a filter."""
    path = str(tmp_path / "t2")
    _write(spark, path, ordered=True)
    stats = collect_file_stats(spark, path, ["id"])
    got = sorted(
        r["id"] for r in read_pruned(spark, stats, "id", 1234, 2345).collect()
    )
    assert got == list(range(1234, 2346))


def test_clustered_layout_prunes_random_does_not(spark, tmp_path):
    """The motivating contrast: a range query over a clustered write
    touches few files; the same query over a round-robin write touches
    all of them (zone maps are only as good as the layout)."""
    p_ord = str(tmp_path / "ordered")
    p_rnd = str(tmp_path / "random")
    _write(spark, p_ord, ordered=True)
    _write(spark, p_rnd, ordered=False)
    s_ord = collect_file_stats(spark, p_ord, ["id"])
    s_rnd = collect_file_stats(spark, p_rnd, ["id"])
    n_ord = len(prune_files(s_ord, "id", 100, 600))
    n_rnd = len(prune_files(s_rnd, "id", 100, 600))
    assert n_ord <= 3
    assert n_rnd == s_rnd.count()  # no pruning on the random layout


def test_empty_prune_returns_empty_with_schema(spark, tmp_path):
    path = str(tmp_path / "t3")
    _write(spark, path, ordered=True)
    stats = collect_file_stats(spark, path, ["id"])
    out = read_pruned(spark, stats, "id", 50_000, 60_000)
    assert out.count() == 0
    assert set(out.columns) == {"id", "v"}


def test_zero_row_manifest_raises_clear_error(spark):
    """A manifest with no files cannot lend a schema; the guard fails
    with the actual cause instead of spark.read.parquet()'s opaque
    no-path analysis error (ADVICE r4)."""
    import pytest

    empty = spark.createDataFrame(
        [], "file string, n_rows long, min_id long, max_id long"
    )
    with pytest.raises(ValueError, match="manifest has no files"):
        read_pruned(spark, empty, "id", 0, 10)
