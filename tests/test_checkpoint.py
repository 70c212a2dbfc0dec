"""Checkpoint/restart for the iterative operators (round 8).

The invariant that makes restartability TESTABLE is determinism: all
three iterative operators keep exact integer state with total-order
tie-breaks, so `interrupted-then-resumed == uninterrupted` must hold
BIT-IDENTICALLY, not approximately. Each test runs the operator to a
midpoint with a checkpoint_dir, re-invokes the same call targeting the
full iteration count (simulating a driver restart), and compares
against a straight run with no checkpointing at all.

Store-level crash semantics (versioned dirs + _SUCCESS markers + the
stamped config guard) are pinned directly against
operators/checkpoint.py.
"""

import os

import pytest
from pyspark.sql import functions as F

from superstore_data_pipeline_analytics_dashboard__spark.operators import (
    checkpoint as CK,
)
from superstore_data_pipeline_analytics_dashboard__spark.operators import (
    bpe as BPE,
)
from superstore_data_pipeline_analytics_dashboard__spark.operators import (
    clustering as CL,
)
from superstore_data_pipeline_analytics_dashboard__spark.operators import (
    graph as G,
)


def _rows(df):
    return sorted(map(tuple, df.collect()))


# ---------------------------------------------------------------- store


def test_store_roundtrip_and_latest(spark, tmp_path):
    root = str(tmp_path / "state")
    meta = {"op": "x", "p": 1}
    assert CK.latest_iteration(spark, root) is None
    st = spark.range(4).select(
        F.col("id").alias("node"), (F.col("id") * 10).alias("rank_u")
    )
    CK.save_state(st, root, 2, meta)
    CK.save_state(st, root, 5, meta)
    assert CK.latest_iteration(spark, root) == 5
    # a rerun targeting fewer iterations must not resume from the future
    assert CK.latest_iteration(spark, root, at_most=4) == 2
    assert CK.latest_iteration(spark, root, at_most=1) is None
    back = CK.load_state(spark, root, 2, meta)
    assert _rows(back) == _rows(st)
    # the provenance stamp is storage-only: stripped on load
    assert dict(back.schema["node"].metadata or {}) == {}


def test_store_ignores_incomplete_checkpoint(spark, tmp_path):
    """A writer that dies mid-checkpoint leaves no _SUCCESS marker; the
    version must be invisible to resume."""
    root = str(tmp_path / "state")
    meta = {"op": "x"}
    st = spark.range(3).select(F.col("id").alias("v"))
    CK.save_state(st, root, 1, meta)
    CK.save_state(st, root, 2, meta)
    os.remove(f"{root}/v000002/_SUCCESS")  # simulate the crash
    assert CK.latest_iteration(spark, root) == 1
    # recovery path: re-running the crashed round overwrites cleanly
    CK.save_state(st, root, 2, meta)
    assert CK.latest_iteration(spark, root) == 2


def test_store_rejects_mismatched_config(spark, tmp_path):
    """Resuming under a different operator config would converge to a
    silently wrong fixed point — the stamp guard must raise instead
    (the shingle_n stamp-and-check pattern)."""
    root = str(tmp_path / "state")
    st = spark.range(3).select(F.col("id").alias("v"))
    CK.save_state(st, root, 1, {"op": "pagerank", "damping_num": 85})
    with pytest.raises(ValueError, match="different operator/configuration"):
        CK.load_state(spark, root, 1, {"op": "pagerank", "damping_num": 50})
    # a foreign parquet directory (no stamp) is rejected the same way
    st.write.mode("overwrite").parquet(f"{root}/v000003")
    with pytest.raises(ValueError, match="different operator/configuration"):
        CK.load_state(spark, root, 3, {"op": "pagerank", "damping_num": 85})


def test_vacuum_keeps_newest_and_stays_resumable(spark, tmp_path):
    root = str(tmp_path / "state")
    meta = {"op": "x"}
    st = spark.range(3).select(F.col("id").alias("v"))
    for it in (1, 2, 3, 4):
        CK.save_state(st, root, it, meta)
    removed = CK.vacuum(spark, root, keep_last=2)
    assert [p.rsplit("/", 1)[1] for p in removed] == ["v000001", "v000002"]
    names = sorted(p for p in os.listdir(root) if p.startswith("v"))
    assert names == ["v000003", "v000004"]
    # the store is still resumable from what was kept
    assert CK.latest_iteration(spark, root) == 4
    assert _rows(CK.load_state(spark, root, 4, meta)) == _rows(st)
    # idempotent: nothing left to supersede
    assert CK.vacuum(spark, root, keep_last=2) == []


def test_vacuum_incomplete_policy(spark, tmp_path):
    """A crashed write OLDER than the newest complete version is garbage;
    one NEWER may be a writer in flight and must survive."""
    root = str(tmp_path / "state")
    meta = {"op": "x"}
    st = spark.range(3).select(F.col("id").alias("v"))
    for it in (1, 3, 4):
        CK.save_state(st, root, it, meta)
    os.remove(f"{root}/v000001/_SUCCESS")  # superseded crash: doomed
    os.remove(f"{root}/v000004/_SUCCESS")  # possibly in flight: kept
    removed = CK.vacuum(spark, root, keep_last=1)
    assert [p.rsplit("/", 1)[1] for p in removed] == ["v000001"]
    names = sorted(p for p in os.listdir(root) if p.startswith("v"))
    assert names == ["v000003", "v000004"]
    assert CK.latest_iteration(spark, root) == 3


def test_vacuum_guards(spark, tmp_path):
    root = str(tmp_path / "state")
    with pytest.raises(ValueError, match="keep_last"):
        CK.vacuum(spark, root, keep_last=0)
    # missing root and no-complete-version stores are both no-ops
    assert CK.vacuum(spark, root) == []
    st = spark.range(2).select(F.col("id").alias("v"))
    CK.save_state(st, root, 1, {"op": "x"})
    os.remove(f"{root}/v000001/_SUCCESS")
    assert CK.vacuum(spark, root) == []  # nothing supersedes the crash


# ------------------------------------------------------------- pagerank


def _chain_edges(spark):
    # directed chain with a hub: enough structure that ranks move each
    # iteration (a fixed point would make resume equality vacuous)
    edges = [(i, i + 1) for i in range(1, 8)] + [(i, 5) for i in (1, 2, 3, 8)]
    return spark.createDataFrame(edges, "src BIGINT, dst BIGINT")


def test_pagerank_resume_equals_straight(spark, tmp_path):
    e = _chain_edges(spark)
    straight = _rows(G.pagerank(e, iters=4))
    root = str(tmp_path / "pr")
    # phase 1: "crash" after 2 of 4 iterations
    G.pagerank(e, iters=2, checkpoint_dir=root)
    assert CK.latest_iteration(spark, root) == 2
    # phase 2: same call shape, full target — must resume, not restart
    resumed = _rows(G.pagerank(e, iters=4, checkpoint_dir=root))
    assert resumed == straight
    assert CK.latest_iteration(spark, root) == 4


def test_pagerank_resume_is_noop_when_complete(spark, tmp_path):
    e = _chain_edges(spark)
    root = str(tmp_path / "pr")
    first = _rows(G.pagerank(e, iters=3, checkpoint_dir=root))
    again = _rows(G.pagerank(e, iters=3, checkpoint_dir=root))
    assert again == first


def test_pagerank_checkpoint_every_skips_rounds(spark, tmp_path):
    e = _chain_edges(spark)
    root = str(tmp_path / "pr")
    out = _rows(G.pagerank(e, iters=5, checkpoint_dir=root, checkpoint_every=2))
    # rounds 2 and 4 by cadence, 5 because it is the last
    names = sorted(p for p in os.listdir(root) if p.startswith("v"))
    assert names == ["v000002", "v000004", "v000005"]
    assert out == _rows(G.pagerank(e, iters=5))


def test_pagerank_rejects_foreign_damping_state(spark, tmp_path):
    e = _chain_edges(spark)
    root = str(tmp_path / "pr")
    G.pagerank(e, iters=2, checkpoint_dir=root, damping=0.85)
    with pytest.raises(ValueError, match="different operator/configuration"):
        G.pagerank(e, iters=4, checkpoint_dir=root, damping=0.5)


def test_star_components_budget_exhaustion_is_recoverable(spark, tmp_path):
    """The star algorithm RAISES when max_iter rounds pass without
    convergence; with a checkpoint_dir that failure is recoverable — a
    rerun resumes from the last rewired edge list and converges to the
    same components an uninterrupted run finds."""
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 64)], "src BIGINT, dst BIGINT"
    )  # 64-node chain: adversarial diameter, several star rounds
    truth = _rows(G.connected_components(edges))
    root = str(tmp_path / "star")
    with pytest.raises(RuntimeError, match="did not converge"):
        G.connected_components_star(edges, max_iter=2, checkpoint_dir=root)
    assert CK.latest_iteration(spark, root) == 2
    resumed = _rows(
        G.connected_components_star(edges, max_iter=50, checkpoint_dir=root)
    )
    assert resumed == truth
    assert resumed == _rows(G.connected_components_star(edges, max_iter=50))


# -------------------------------------------------------------- k-means


@pytest.fixture(scope="module")
def embeddings(spark):
    return (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .limit(200)
        .persist()
    )


def test_kmeans_resume_equals_straight(spark, tmp_path, embeddings):
    straight = _rows(CL.kmeans_quantized(embeddings, k=4, iters=3))
    root = str(tmp_path / "km")
    CL.kmeans_quantized(embeddings, k=4, iters=1, checkpoint_dir=root)
    assert CK.latest_iteration(spark, root) == 1
    resumed = _rows(
        CL.kmeans_quantized(embeddings, k=4, iters=3, checkpoint_dir=root)
    )
    assert resumed == straight


def test_kmeans_rejects_mismatched_k(spark, tmp_path, embeddings):
    root = str(tmp_path / "km")
    CL.kmeans_quantized(embeddings, k=4, iters=1, checkpoint_dir=root)
    with pytest.raises(ValueError, match="different operator/configuration"):
        CL.kmeans_quantized(embeddings, k=8, iters=2, checkpoint_dir=root)


# ------------------------------------------------------------------ bpe


@pytest.fixture(scope="module")
def docs(spark):
    return (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .limit(120)
        .persist()
    )


def test_bpe_resume_equals_straight(spark, tmp_path, docs):
    straight = _rows(BPE.bpe_train(docs, n_merges=6))
    root = str(tmp_path / "bpe")
    BPE.bpe_train(docs, n_merges=3, checkpoint_dir=root)
    assert CK.latest_iteration(spark, root) == 3
    resumed = _rows(BPE.bpe_train(docs, n_merges=6, checkpoint_dir=root))
    assert resumed == straight
    assert CK.latest_iteration(spark, root) == 6


def test_bpe_resume_rebuilds_symbols_not_corpus_merges(spark, tmp_path, docs):
    """The checkpoint stores ONLY the merge table (the artifact); resume
    must reconstruct the symbol state by folding those merges and learn
    the SAME next merge the uninterrupted run learns — cadence > 1
    exercises the multi-merge fold."""
    root = str(tmp_path / "bpe")
    BPE.bpe_train(docs, n_merges=5, checkpoint_dir=root, checkpoint_every=2)
    names = sorted(p for p in os.listdir(root) if p.startswith("v"))
    assert names == ["v000002", "v000004", "v000005"]
    resumed = _rows(BPE.bpe_train(docs, n_merges=8, checkpoint_dir=root))
    assert resumed == _rows(BPE.bpe_train(docs, n_merges=8))
