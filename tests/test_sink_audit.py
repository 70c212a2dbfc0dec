"""Exactly-once sink audits (round 8): the audit must certify a sink
whose idempotency machinery worked AND indict one whose machinery was
missing — both exercised with REAL replays (same input, fresh
checkpoint), plus unit-grain pins on the ledger arithmetic."""

import shutil
import tempfile
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from superstore_data_pipeline_analytics_dashboard__spark.streaming import (
    audit as A,
)
from superstore_data_pipeline_analytics_dashboard__spark.streaming import (
    incremental as S,
)

SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp()
    yield Path(d)
    shutil.rmtree(d, ignore_errors=True)


@pytest.fixture()
def event_drop_zone(spark, tmpdir):
    from superstore_data_pipeline_analytics_dashboard__spark.sources.catalog import (
        load_table,
    )

    src = load_table(spark, SF_SMOKE, "events")
    drop = tmpdir / "in"
    src.coalesce(1).write.parquet(str(drop))
    return drop


# ------------------------------------------------------------ ledger math


def test_ledger_all_rows_clean_and_violations(spark):
    src = spark.createDataFrame(
        [("a",), ("a",), ("b",), ("c",)], "k STRING"
    )
    # clean: identical multiset
    clean = A.exactly_once_audit(src, src, ["k"]).first()
    assert clean["exactly_once"]
    assert clean["n_source_rows"] == 4 and clean["n_sink_rows"] == 4
    # a duplicated, c dropped, d never in the source
    snk = spark.createDataFrame(
        [("a",), ("a",), ("a",), ("b",), ("d",)], "k STRING"
    )
    r = A.exactly_once_audit(src, snk, ["k"]).first()
    assert not r["exactly_once"]
    assert r["n_over_keys"] == 1 and r["n_over_rows"] == 1  # a: 3 vs 2
    assert r["n_under_keys"] == 1 and r["n_under_rows"] == 1  # c: 0 vs 1
    assert r["n_unexpected_keys"] == 1  # d


def test_ledger_null_keys_are_real_keys(spark):
    """A NULL key delivered exactly once must certify — groupBy keeps
    NULL as a group on both sides, so the join matches it null-safely
    (a name-list join would split it into under + unexpected)."""
    src = spark.createDataFrame([("a",), (None,), (None,)], "k STRING")
    snk = spark.createDataFrame([("a",), (None,), (None,)], "k STRING")
    r = A.exactly_once_audit(src, snk, ["k"]).first()
    assert r["exactly_once"]
    assert r["n_source_keys"] == 2 and r["n_sink_keys"] == 2
    # and a NULL-key double-delivery is charged as over, not unexpected
    snk2 = spark.createDataFrame([("a",), (None,), (None,), (None,)], "k STRING")
    r2 = A.exactly_once_audit(src, snk2, ["k"]).first()
    assert not r2["exactly_once"]
    assert r2["n_over_keys"] == 1 and r2["n_over_rows"] == 1
    assert r2["n_unexpected_keys"] == 0


def test_ledger_once_per_key_contract(spark):
    src = spark.createDataFrame([("a",), ("a",), ("b",)], "k STRING")
    dedup_sink = spark.createDataFrame([("a",), ("b",)], "k STRING")
    r = A.exactly_once_audit(src, dedup_sink, ["k"], expect="once_per_key").first()
    assert r["exactly_once"]  # repeats collapsed: that IS the contract
    # the same sink FAILS the all_rows contract (a under-delivered)
    r2 = A.exactly_once_audit(src, dedup_sink, ["k"], expect="all_rows").first()
    assert not r2["exactly_once"] and r2["n_under_rows"] == 1
    with pytest.raises(ValueError, match="all_rows|once_per_key"):
        A.exactly_once_audit(src, dedup_sink, ["k"], expect="nonsense")


def test_ledger_property_vs_bruteforce(spark):
    """Property: on arbitrary source/sink multisets the ledger equals a
    brute-force Python computation, under both contracts."""
    from collections import Counter

    from hypothesis import given, settings
    from hypothesis import strategies as st

    # None included: NULL is a real key under the null-safe join
    keys = st.sampled_from(list("abcdefgh") + [None])
    multiset = st.lists(keys, min_size=0, max_size=12)

    @settings(max_examples=12, deadline=None)
    @given(src_rows=multiset, snk_rows=multiset, expect=st.sampled_from(
        ["all_rows", "once_per_key"]))
    def run(src_rows, snk_rows, expect):
        schema = "k STRING"
        src = spark.createDataFrame([(x,) for x in src_rows] or [("_",)], schema)
        if not src_rows:
            src = src.filter(F.lit(False))
        snk = spark.createDataFrame([(x,) for x in snk_rows] or [("_",)], schema)
        if not snk_rows:
            snk = snk.filter(F.lit(False))
        r = A.exactly_once_audit(src, snk, ["k"], expect=expect).first()
        cs, ck = Counter(src_rows), Counter(snk_rows)
        want = {
            k: (cs[k] if expect == "all_rows" else (1 if cs[k] else 0))
            for k in set(cs) | set(ck)
        }
        over = {k: max(ck[k] - want[k], 0) for k in want if cs[k]}
        under = {k: max(want[k] - ck[k], 0) for k in want}
        assert r["n_source_rows"] == sum(cs.values())
        assert r["n_sink_rows"] == sum(ck.values())
        assert r["n_over_rows"] == sum(over.values())
        assert r["n_over_keys"] == sum(1 for v in over.values() if v)
        assert r["n_under_rows"] == sum(under.values())
        assert r["n_under_keys"] == sum(1 for v in under.values() if v)
        assert r["n_unexpected_keys"] == sum(
            1 for k in ck if ck[k] and not cs[k]
        )
        assert r["exactly_once"] == (
            not sum(over.values())
            and not sum(under.values())
            and not any(ck[k] and not cs[k] for k in ck)
        )

    run()


# --------------------------------------------------- streaming end-to-end


def test_audit_certifies_idempotent_sink_replay(spark, event_drop_zone, tmpdir):
    """Replay the same input with a fresh checkpoint into the left-anti
    sink: the audit must certify exactly-once."""
    sink = str(tmpdir / "sink")
    stream = S.dedup_stream(S.read_event_stream(spark, str(event_drop_zone)))
    S.start_idempotent_append(stream, sink, str(tmpdir / "c1")).awaitTermination(120)
    stream2 = S.dedup_stream(S.read_event_stream(spark, str(event_drop_zone)))
    S.start_idempotent_append(stream2, sink, str(tmpdir / "c2")).awaitTermination(120)

    src = spark.read.parquet(str(event_drop_zone))
    r = A.exactly_once_audit(
        src, spark.read.parquet(sink), ["event_id"]
    ).first()
    assert r["exactly_once"], r.asDict()
    assert r["n_sink_rows"] == r["n_source_rows"]


def test_audit_indicts_naive_append_sink_replay(spark, event_drop_zone, tmpdir):
    """The control: a sink with NO idempotency doubles every row under
    the same replay — the audit must say so, with the over-delivery
    volume equal to one full copy. (A foreachBatch plain append: the
    built-in parquet streaming sink would NOT reproduce this — its
    _spark_metadata batch log deduplicates replayed batch ids — which
    is exactly why foreachBatch writers must bring their own
    idempotency, and why this audit exists.)"""
    sink = str(tmpdir / "sink")
    for ckpt in ("c1", "c2"):
        q = (
            S.read_event_stream(spark, str(event_drop_zone))
            .writeStream.foreachBatch(
                lambda b, _id: b.write.mode("append").parquet(sink)
            )
            .option("checkpointLocation", str(tmpdir / ckpt))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
    src = spark.read.parquet(str(event_drop_zone))
    r = A.exactly_once_audit(src, spark.read.parquet(sink), ["event_id"]).first()
    assert not r["exactly_once"]
    assert r["n_over_rows"] == r["n_source_rows"]  # exactly one extra copy
    assert r["n_under_rows"] == 0 and r["n_unexpected_keys"] == 0


# ------------------------------------------------------- manifest audit


def test_manifest_audit_consistent_then_corrupted(spark, event_drop_zone, tmpdir):
    sink = str(tmpdir / "sink")
    manifest = str(tmpdir / "manifest")
    q = S.start_append_with_manifest(
        S.read_event_stream(spark, str(event_drop_zone)),
        sink,
        manifest,
        str(tmpdir / "ckpt"),
        stat_cols=["ts"],
    )
    q.awaitTermination(120)
    ok = A.manifest_consistency_audit(spark, sink, manifest).first()
    assert ok["consistent"], ok.asDict()
    assert ok["n_data_files"] == ok["n_manifest_files"] > 0

    # corruption 1: a data file vanishes but its manifest row survives
    # (the append-instead-of-overwrite replay bug's signature)
    victim = next(Path(sink).rglob("part-*.parquet"))
    extra = victim.parent / f"zz-copy-{victim.name}"
    shutil.copy(victim, extra)  # corruption 2: landed but unenveloped
    victim.unlink()
    bad = A.manifest_consistency_audit(spark, sink, manifest).first()
    assert not bad["consistent"]
    assert bad["n_stale_manifest_rows"] == 1
    assert bad["n_unenveloped_files"] == 1


def test_audit_keys_on_batch_plus_basename(spark, tmp_path):
    """A single multi-partition write reuses one task's file name
    across every batch dir it touches (part-00000-<job-uuid> lands in
    each), so basenames are only unique WITHIN a batch — the audit
    must key on (batch, basename) or it cross-matches those twins and
    false-alarms row mismatches on a perfectly consistent sink."""
    from pyspark.sql import functions as F

    from superstore_data_pipeline_analytics_dashboard__spark.streaming.audit import (
        manifest_consistency_audit,
    )

    sink, man = str(tmp_path / "sink"), str(tmp_path / "man")
    df = spark.range(300).select(
        F.col("id"), (F.col("id") % 3).alias("batch")
    )
    # ONE partitioned write → same basenames across the 3 batch dirs
    df.coalesce(1).write.partitionBy("batch").parquet(sink)
    src = spark.read.option("basePath", sink).parquet(sink)
    (
        src.select(F.input_file_name().alias("file"), "batch", "id")
        .groupBy("file", "batch")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("id").alias("min_id"),
            F.max("id").alias("max_id"),
        )
        .select("file", "n_rows", "min_id", "max_id", "batch")
        .write.partitionBy("batch")
        .parquet(man)
    )
    names = {
        f.rsplit("/", 1)[1] for f in spark.read.parquet(sink).inputFiles()
    }
    assert len(names) == 1  # the collision this test exists for
    rep = manifest_consistency_audit(spark, sink, man).collect()[0]
    assert rep["consistent"], rep.asDict()
    assert rep["n_row_mismatches"] == 0 and rep["n_data_files"] == 3
