"""Similarity-search operator tests: brute-force exactness + IVF recall."""

from pyspark.sql import functions as F

from superstore_data_pipeline_analytics_dashboard__spark.operators.similarity import (
    knn_bruteforce, knn_ivf, seed_centroids, ivf_assign,
)
from tests.conftest import SF_SMOKE


def _emb(spark):
    return spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")


def test_bruteforce_self_excluded_and_k(spark):
    emb = _emb(spark)
    q = emb.filter(F.col("vec_id") == 0)
    out = knn_bruteforce(emb, q, k=5)
    rows = out.collect()
    assert len(rows) == 5
    assert all(r["neighbor_id"] != 0 for r in rows)
    sims = [float(r["cos_sim"]) for r in sorted(rows, key=lambda r: r["rnk"])]
    assert sims == sorted(sims, reverse=True)


def test_bruteforce_matches_numpy(spark):
    import numpy as np

    emb = _emb(spark)
    data = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
            for r in emb.collect()}
    qv = data[0]
    sims = {
        vid: float(v @ qv / (np.linalg.norm(v) * np.linalg.norm(qv)))
        for vid, v in data.items() if vid != 0
    }
    expected_top = sorted(sims, key=lambda k: (-sims[k], k))[:5]
    out = knn_bruteforce(emb, emb.filter(F.col("vec_id") == 0), k=5)
    got_top = [r["neighbor_id"] for r in sorted(out.collect(), key=lambda r: r["rnk"])]
    assert got_top == expected_top


def test_ivf_assign_total(spark):
    emb = _emb(spark)
    cents = seed_centroids(emb, 8)
    assigned = ivf_assign(emb, cents)
    assert assigned.count() == emb.count()
    assert assigned.filter(F.col("cell").isNull()).count() == 0


def test_ivf_recall_vs_bruteforce(spark):
    emb = _emb(spark)
    q = emb.filter(F.col("vec_id") < 3)
    exact = knn_bruteforce(emb, q, k=10)
    approx = knn_ivf(emb, q, k=10, n_cells=8, nprobe=4)
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.5, f"IVF recall too low: {recall}"


def test_kmeans_centroids_shape_and_determinism(spark):
    from superstore_data_pipeline_analytics_dashboard__spark.operators.similarity import (
        kmeans_centroids,
    )

    emb = _emb(spark)
    c1 = kmeans_centroids(emb, 8)
    assert c1.count() == 8
    row = c1.first()
    assert len(row["embedding"]) == 64
    c2 = kmeans_centroids(emb, 8)
    assert sorted(map(tuple, (r["embedding"] for r in c1.collect()))) == sorted(
        map(tuple, (r["embedding"] for r in c2.collect()))
    )


def test_ivf_kmeans_recall_not_worse_than_seed(spark):
    emb = _emb(spark)
    q = emb.filter(F.col("vec_id") < 3)
    exact = {(r["query_id"], r["neighbor_id"])
             for r in knn_bruteforce(emb, q, k=10).collect()}
    seed = {(r["query_id"], r["neighbor_id"])
            for r in knn_ivf(emb, q, k=10, n_cells=8, nprobe=4).collect()}
    km = {(r["query_id"], r["neighbor_id"])
          for r in knn_ivf(emb, q, k=10, n_cells=8, nprobe=4, centroids="kmeans").collect()}
    recall_seed = len(exact & seed) / len(exact)
    recall_km = len(exact & km) / len(exact)
    assert recall_km >= 0.5
    # kmeans cells should not be dramatically worse than naive seeds
    assert recall_km >= recall_seed - 0.2, (recall_km, recall_seed)
