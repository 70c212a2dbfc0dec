"""Incremental dedup (operators.incremental_dedup): per-batch cost must
buy the same decisions the batch path makes — exact tier sequential ==
batch re-run, MinHash tier drops planted cross-batch and within-batch
near-dups while the state grows by kept docs only."""

from pyspark.sql import functions as F

from superstore_data_pipeline_analytics_dashboard__spark.operators import (
    incremental_dedup as ID,
)
from superstore_data_pipeline_analytics_dashboard__spark.operators.dedup import (
    minhash_dedup,
)

_BATCH1 = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "spark shuffles data between stages during wide transformations"),
    (3, "completely different words appear here with nothing shared"),
]
_BATCH2 = [
    (11, "the quick brown fox jumps over the lazy dog"),          # exact dup of 1
    (12, "the quick brown fox jumps over the lazy cat today"),    # near dup of 1
    (13, "a genuinely novel document about distributed minhash state"),
    (14, "partition pruning skips files whose min max bounds exclude it"),
    (15, "partition pruning skips files whose min max bounds exclude it"),  # dup of 14
]


def _df(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_exact_increment_matches_batch_rerun(spark):
    """Sequential exact increments must keep exactly the docs a single
    batch dedup over the union keeps (fingerprint identity is
    transitive, so online == batch for this tier)."""
    b1, b2 = _df(spark, _BATCH1), _df(spark, _BATCH2)

    state = ID.exact_state(b1)
    out = ID.exact_increment(b2, state)
    kept_ids = {r["doc_id"] for r in out["kept"].collect()}
    # 11 dups 1 (cross-batch); 15 dups 14 (within-batch, lowest id wins)
    assert kept_ids == {12, 13, 14}

    # batch reference: keep-lowest-id over the union's fingerprints
    union = b1.unionByName(b2)
    from superstore_data_pipeline_analytics_dashboard__spark.functions.text import (
        fingerprint,
    )

    batch_kept = {
        r["keep"]
        for r in union.select("doc_id", fingerprint("text").alias("fp"))
        .groupBy("fp")
        .agg(F.min("doc_id").alias("keep"))
        .collect()
    }
    assert kept_ids == batch_kept - {1, 2, 3}

    # state grew by exactly the kept docs' fingerprints (15's fp
    # collapsed into 14's within the batch, so 3 kept docs → 3 new fps)
    assert out["state"].count() == state.count() + 3


def test_exact_increment_is_idempotent(spark):
    """Replaying the same batch against the updated state keeps nothing."""
    b1, b2 = _df(spark, _BATCH1), _df(spark, _BATCH2)
    out = ID.exact_increment(b2, ID.exact_state(b1))
    replay = ID.exact_increment(b2, out["state"])
    assert replay["kept"].count() == 0
    assert replay["state"].count() == out["state"].count()


def test_minhash_increment_drops_cross_and_within_dups(spark):
    b1, b2 = _df(spark, _BATCH1), _df(spark, _BATCH2)
    state = ID.minhash_state(b1, n=3, num_hashes=32, bands=8)
    out = ID.minhash_increment(
        b2, state, n=3, num_hashes=32, bands=8, threshold=0.3
    )
    kept_ids = {r["doc_id"] for r in out["kept"].collect()}
    # 11 exact-dups 1, 12 near-dups 1 (cross); 15 dups 14 (within,
    # lowest id canonical); 13 is novel
    assert kept_ids == {13, 14}

    # state grew by the kept docs only
    old_ids = {r["doc_id"] for r in state["shingles"].select("doc_id").distinct().collect()}
    new_ids = {
        r["doc_id"]
        for r in out["state"]["shingles"].select("doc_id").distinct().collect()
    }
    assert new_ids == old_ids | kept_ids
    band_ids = {
        r["doc_id"]
        for r in out["state"]["bands"].select("doc_id").distinct().collect()
    }
    assert band_ids == old_ids | kept_ids


def test_minhash_increment_agrees_with_batch_on_planted_dups(spark):
    """The online rule and the batch path must agree on WHICH planted
    near-dup relations exist; kept sets agree here because no
    cross/within chain straddles the batches."""
    b1, b2 = _df(spark, _BATCH1), _df(spark, _BATCH2)
    union = b1.unionByName(b2)
    batch_pairs = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_dedup(
            union, "doc_id", "text", n=3, num_hashes=32, bands=8, threshold=0.3
        ).collect()
    }
    assert (1, 11) in batch_pairs and (1, 12) in batch_pairs
    assert (14, 15) in batch_pairs

    state = ID.minhash_state(b1, n=3, num_hashes=32, bands=8)
    out = ID.minhash_increment(
        b2, state, n=3, num_hashes=32, bands=8, threshold=0.3
    )
    kept_ids = {r["doc_id"] for r in out["kept"].collect()}
    # batch canonical set restricted to batch-2 ids
    batch_dropped = {b for (_, b) in batch_pairs} | {
        b for (b, _) in batch_pairs if False
    }
    assert kept_ids == {r[0] for r in _BATCH2} - batch_dropped


def test_minhash_increment_empty_batch_noop(spark):
    b1 = _df(spark, _BATCH1)
    empty = _df(spark, []) if False else b1.filter(F.lit(False))
    state = ID.minhash_state(b1, n=3, num_hashes=32, bands=8)
    out = ID.minhash_increment(empty, state, n=3, num_hashes=32, bands=8)
    assert out["kept"].count() == 0
    assert out["state"]["shingles"].count() == state["shingles"].count()
