"""Format round-trips (sources.formats): parquet/ORC must round-trip every
type exactly; JSON-lines and CSV must round-trip given the explicit schema
(including timestamps through the ISO format both directions)."""

import shutil
import tempfile
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from superstore_data_pipeline_analytics_dashboard__spark.sources import formats as FM
from superstore_data_pipeline_analytics_dashboard__spark.sources.catalog import (
    load_table,
)
from tests.conftest import SF_SMOKE


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp()
    yield Path(d)
    shutil.rmtree(d, ignore_errors=True)


@pytest.fixture()
def typed_frame(spark):
    """A frame exercising the types that break naive round-trips:
    decimal, date, timestamp, boolean, double, nullable string."""
    ev = load_table(spark, SF_SMOKE, "events").limit(500)
    return ev.select(
        "event_id",
        "ts",
        F.col("ts").cast("date").alias("day"),
        "event_type",
        F.col("value").cast("decimal(18,4)").alias("value_dec"),
        "value",
        (F.col("event_id") % 2 == 0).alias("flag"),
        F.when(F.col("event_id") % 7 == 0, None)
        .otherwise(F.col("props"))
        .alias("maybe_props"),
    )


def _sorted_rows(df):
    return [tuple(r) for r in df.orderBy("event_id").collect()]


@pytest.mark.parametrize("fmt", ["parquet", "orc"])
def test_columnar_roundtrip_exact(spark, tmpdir, typed_frame, fmt):
    path = str(tmpdir / fmt)
    FM.write_any(typed_frame, path, fmt)
    back = FM.read_any(spark, path, fmt)
    assert back.schema == typed_frame.schema
    assert _sorted_rows(back) == _sorted_rows(typed_frame)


@pytest.mark.parametrize("fmt", ["json", "csv"])
def test_textual_roundtrip_with_schema(spark, tmpdir, typed_frame, fmt):
    path = str(tmpdir / fmt)
    FM.write_any(typed_frame, path, fmt)
    back = FM.read_any(spark, path, fmt, schema=typed_frame.schema)
    assert back.schema == typed_frame.schema
    assert _sorted_rows(back) == _sorted_rows(typed_frame)


def test_textual_read_requires_schema(spark, tmpdir, typed_frame):
    path = str(tmpdir / "j")
    FM.write_any(typed_frame, path, "json")
    with pytest.raises(ValueError, match="explicit schema"):
        FM.read_any(spark, path, "json")


def test_max_records_per_file_bounds_output(spark, tmpdir, typed_frame):
    path = tmpdir / "bounded"
    FM.write_any(typed_frame.coalesce(1), str(path), "parquet",
                 max_records_per_file=100)
    files = list(path.glob("*.parquet"))
    assert len(files) >= 5  # 500 rows / 100 per file
    total = FM.read_any(spark, str(path), "parquet").count()
    assert total == typed_frame.count()


def test_partitioned_write_prunes_directories(spark, tmpdir, typed_frame):
    path = tmpdir / "parts"
    FM.write_any(typed_frame, str(path), "parquet", partition_by=["event_type"])
    assert (path / "event_type=click").exists()
    one = FM.read_any(spark, str(path), "parquet").filter(
        F.col("event_type") == "click"
    )
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(event_type" in plan


def test_schema_evolution_merge_read(spark, tmpdir, typed_frame):
    """Old files written before a column existed must surface it as NULL
    under the merged-schema read, with new-file values intact."""
    old = tmpdir / "evolved" / "load=1"
    new = tmpdir / "evolved" / "load=2"
    typed_frame.select("event_id", "event_type").write.parquet(str(old))
    typed_frame.select("event_id", "event_type", "value").write.parquet(str(new))

    merged = FM.read_parquet_evolved(spark, str(tmpdir / "evolved"))
    assert "value" in merged.columns
    n = typed_frame.count()
    assert merged.count() == 2 * n
    assert merged.filter(F.col("value").isNull()).count() == n


def test_compact_parquet_reduces_file_count(spark, tmpdir, typed_frame):
    """A many-tiny-files directory compacts to the byte-sized file count
    with identical content."""
    src = tmpdir / "tiny"
    dst = tmpdir / "compacted"
    typed_frame.repartition(50).write.parquet(str(src))
    assert len(list(src.glob("*.parquet"))) == 50

    n_files = FM.compact_parquet(spark, str(src), str(dst), target_file_mb=256)
    assert n_files == 1  # 500 rows is far under one 256 MB target file
    assert len(list(dst.glob("*.parquet"))) == 1
    assert _sorted_rows(spark.read.parquet(str(dst))) == _sorted_rows(typed_frame)


def test_compact_parquet_preserves_hive_partitions(spark, tmpdir, typed_frame):
    """Compacting a Hive-partitioned source must keep the `k=v` layout —
    a flat rewrite would turn partition columns into data columns and
    disable partition pruning for every downstream reader (ADVICE r3)."""
    src = tmpdir / "tiny_parts"
    dst = tmpdir / "compacted_parts"
    typed_frame.repartition(10).write.partitionBy("event_type").parquet(str(src))

    FM.compact_parquet(spark, str(src), str(dst), target_file_mb=256)
    assert (dst / "event_type=click").exists()
    back = spark.read.parquet(str(dst))
    assert set(back.columns) == set(typed_frame.columns)
    assert _sorted_rows(back.select(*typed_frame.columns)) == _sorted_rows(
        typed_frame
    )
    # pruning still works on the compacted copy
    plan = (
        back.filter(F.col("event_type") == "click")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters: [isnotnull(event_type" in plan


def test_json_quarantine_splits_bad_lines(spark, tmpdir):
    """Malformed JSON lines land in the quarantine channel verbatim;
    well-formed lines parse typed. One scan, no dropped records."""
    path = tmpdir / "events.jsonl"
    lines = [
        '{"event_id": 1, "event_type": "click", "value": 1.5}',
        '{"event_id": 2, "event_type": "view", "value": 2.0}',
        '{"event_id": 3, "event_type": "view", "value": }',   # malformed
        'not json at all',
    ]
    path.write_text("\n".join(lines))

    out = FM.read_json_with_quarantine(
        spark, str(path), "event_id BIGINT, event_type STRING, value DOUBLE"
    )
    good = {r["event_id"] for r in out["good"].collect()}
    bad = [r["raw_line"] for r in out["quarantine"].collect()]
    assert good == {1, 2}
    assert len(bad) == 2 and "not json at all" in bad
    assert "__corrupt" not in out["good"].columns
    # caller releases the cached parse through the returned handle
    out["parsed"].unpersist()


def test_json_quarantine_does_not_mutate_caller_schema(spark, tmpdir):
    """StructType.add mutates in place and returns self — the quarantine
    reader must copy, so a caller-supplied StructType is reusable for a
    second quarantine read or a plain read_any (ADVICE r3)."""
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    path = tmpdir / "events.jsonl"
    path.write_text('{"event_id": 1, "event_type": "click", "value": 1.5}\n')
    schema = StructType(
        [
            StructField("event_id", LongType()),
            StructField("event_type", StringType()),
            StructField("value", DoubleType()),
        ]
    )
    before = [f.name for f in schema.fields]
    out1 = FM.read_json_with_quarantine(spark, str(path), schema)
    assert [f.name for f in schema.fields] == before  # not mutated
    out2 = FM.read_json_with_quarantine(spark, str(path), schema)  # reusable
    assert out1["good"].columns == out2["good"].columns == before
    assert out2["good"].count() == 1
    out1["parsed"].unpersist()
    out2["parsed"].unpersist()


def test_compact_batch_preserves_content_manifest_and_snapshots(
    spark, tmp_path
):
    """Manifest-aware in-place batch compaction: 6 small files -> 1,
    byte-identical content, manifest refreshed (pruned reads stay
    exact, audit consistent) — and, the contrast with erasure, a
    PRE-compaction snapshot pin stays REPRODUCIBLE because snapshots
    pin content stats, not file lists."""
    from superstore_data_pipeline_analytics_dashboard__spark.sources import (
        snapshots as SN,
    )
    from superstore_data_pipeline_analytics_dashboard__spark.sources.manifest import (
        collect_file_stats,
        read_pruned,
    )
    from superstore_data_pipeline_analytics_dashboard__spark.streaming.audit import (
        manifest_consistency_audit,
    )

    sink, man, log = (str(tmp_path / d) for d in ("sink", "man", "log"))
    for lo in range(0, 300, 50):  # six single-file appends
        spark.createDataFrame(
            [(i,) for i in range(lo, lo + 50)], "id BIGINT"
        ).coalesce(1).write.mode("append").parquet(f"{sink}/batch=0")
    stats = collect_file_stats(spark, f"{sink}/batch=0", ["id"])
    assert stats.count() == 6
    (
        stats.withColumn("batch", F.lit(0))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch")
        .parquet(man)
    )
    assert SN.commit_snapshot(spark, man, log) == 1

    before, after = FM.compact_batch(spark, sink, man, 0)
    assert (before, after) == (6, 1)
    got = sorted(r["id"] for r in spark.read.parquet(sink).collect())
    assert got == list(range(300))
    post = spark.read.parquet(man)
    assert post.count() == 1
    row = post.collect()[0]
    assert row["n_rows"] == 300 and row["min_id"] == 0
    assert sorted(
        r["id"] for r in read_pruned(spark, post, "id", 140, 160).collect()
    ) == list(range(140, 161))
    audit = manifest_consistency_audit(spark, sink, man).collect()[0]
    assert audit["consistent"]
    # the pin survives compaction (content stats unchanged) — the
    # deliberate contrast with erasure, which audibly breaks it
    drift = SN.snapshot_drift_audit(spark, sink, log, 1).collect()[0]
    assert drift["reproducible"]


def test_compact_batch_crash_residue_is_hidden(spark, tmp_path):
    """The retire-rename target is a DOT-prefixed dir: residue left by
    a crash between the retire and the final delete must be invisible
    to Spark partition discovery — a non-hidden `batch=0.trash` dir
    would surface as a bogus partition value and double-count the
    pre-compaction copy in full-sink reads."""
    sink = str(tmp_path / "sink")
    spark.createDataFrame([(i,) for i in range(100)], "id BIGINT").coalesce(
        1
    ).write.parquet(f"{sink}/batch=0")
    # simulate the crash window: the retired copy still present under
    # the hidden trash path compact_batch uses
    import shutil

    shutil.copytree(
        f"{sink}/batch=0", f"{sink}/.compact_trash_batch=0"
    )
    df = spark.read.parquet(sink)
    assert df.count() == 100  # no double count
    assert [r["batch"] for r in df.select("batch").distinct().collect()] == [0]
