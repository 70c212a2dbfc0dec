"""Product quantization (operators/pq.py): determinism, a pure-Python
replay of the encoding against the returned codebooks, and planted-twin
recovery through the catalog query."""

from __future__ import annotations

from pyspark.sql import functions as F

from superstore_data_pipeline_analytics_dashboard__spark.operators.pq import (
    pq_adc_recall,
    pq_train_encode,
)
from superstore_data_pipeline_analytics_dashboard__spark.plans import (
    catalog_queries as Q,
)
from tests.conftest import SF_SMOKE


def _quantize(vec):
    s = max(max(abs(float(x)) for x in vec), 1e-12)
    return [round(float(x) * 127.0 / s) for x in vec]


def test_pq_codes_replay_and_determinism(spark):
    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    codes1, books1, quant1 = pq_train_encode(emb, m=8, k=16, iters=2)
    got1 = {r["vec_id"]: (list(r["codes"]), r["pq_code"]) for r in codes1.collect()}
    quant1.unpersist()

    # pure-Python replay: quantize each vector, assign each subvector
    # to its nearest codebook entry (ties -> lowest cid), pack base-16
    raw = {
        r["vec_id"]: list(r["embedding"])
        for r in emb.collect()
    }
    for vid, vec in raw.items():
        q = _quantize(vec)
        want_codes = []
        for j in range(8):
            sq = q[j * 8 : (j + 1) * 8]
            nsq = sum(x * x for x in sq)
            best = min(
                (nsq + nc - 2 * sum(a * b for a, b in zip(sq, c)), cid)
                for cid, c, nc in books1[j]
            )
            want_codes.append(best[1])
        packed = 0
        for c in want_codes:
            packed = packed * 16 + c
        assert got1[vid] == (want_codes, packed), vid

    # determinism: a second train run reproduces codes exactly
    codes2, books2, quant2 = pq_train_encode(emb, m=8, k=16, iters=2)
    got2 = {r["vec_id"]: (list(r["codes"]), r["pq_code"]) for r in codes2.collect()}
    quant2.unpersist()
    assert got1 == got2
    assert [[c for c in b] for b in books1] == [[c for c in b] for b in books2]


def test_pq_dropped_cluster_cids_stay_dense(spark):
    """Two identical seed vectors force a cluster to die on the first
    Lloyd rebuild (arg-min ties go to the lower cid, so the higher seed
    gets zero assignments). Regression: cids must be renumbered densely
    (cid == list position) after every rebuild — the ADC lookup tables
    index by position, so a sparse cid read the wrong entry or threw
    out-of-range under ANSI mode."""
    dim, m, k = 16, 4, 4
    rows = []
    for i in range(20):
        # vec 1 duplicates vec 0 → in EVERY subspace, seed 1 == seed 0
        src = 0 if i == 1 else i
        vec = [float((src * 7 + d * 3) % 11 - 5) + 0.5 for d in range(dim)]
        rows.append((i, vec))
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")

    codes, books, quant = pq_train_encode(emb, m=m, k=k, iters=2)
    n_codes = codes.count()
    quant.unpersist()
    assert n_codes == 20
    for book in books:
        assert [cid for cid, _, _ in book] == list(range(len(book)))
    assert any(len(book) < k for book in books)  # a cluster really died

    # end-to-end ADC scoring over the shrunken codebooks must not throw
    out = pq_adc_recall(emb, F.col("vec_id") < 2, m=m, k=k, iters=2, k_top=3)
    got = {r["query_id"] for r in out.collect()}
    assert got == {0, 1}


def test_pq_planted_twin_recovery(spark):
    out = {r["query_id"]: r for r in Q.QUERIES["q220_pq_ann"](spark, SF_SMOKE).collect()}
    assert len(out) == 25
    n_found = sum(1 for r in out.values() if r["found_planted"])
    # ADC rank-1 must recover the near-identical twin for the large
    # majority of queries (the compressed codes keep cos≈0.997 pairs
    # adjacent even when 10 random dims quantize differently)
    assert n_found >= 20, n_found
    for r in out.values():
        assert 0.0 <= r["recall"] <= 1.0
        assert r["n_overlap"] == round(r["recall"] * 10)
        # the exact integer tier MUST rank the twin first: distances on
        # the int8 grid between twin vectors are near-zero
        assert r["exact_best"] == r["query_id"] + 500


def test_ivf_pq_prunes_and_recovers_planted(spark):
    """q235: every query scores a PRUNED candidate set (well under the
    corpus), and the twin sits in the query's own cell so IVF-PQ still
    recovers it for most queries; exact tier always ranks the twin
    first."""
    out = {
        r["query_id"]: r
        for r in Q.QUERIES["q235_ivf_pq_ann"](spark, SF_SMOKE).collect()
    }
    assert len(out) == 10
    corpus = 1000  # 500 + 500 planted twins
    for r in out.values():
        assert 0 < r["n_scored"] < corpus * 0.6  # pruning visible
        assert r["exact_best"] == r["query_id"] + 500
        assert 0.0 <= r["recall"] <= 1.0
    n_found = sum(1 for r in out.values() if r["found_planted"])
    assert n_found >= 7, n_found
