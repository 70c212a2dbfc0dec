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


def test_all_pairs_cosine_matches_numpy_and_stays_distributed(spark, monkeypatch):
    """The blocked all-pairs GEMM must (a) produce exactly the numpy
    reference pairs and (b) never materialize the vector table on the
    driver (VERDICT r1 flagged the old collect()+broadcast as a 100 TB
    driver-OOM). Any DataFrame.collect/toPandas/toArrow during build or
    execution trips the patch; the single .count() action runs JVM-side."""
    import numpy as np
    from pyspark.sql import DataFrame as SparkDF

    from superstore_data_pipeline_analytics_dashboard__spark.operators.similarity import (
        all_pairs_cosine,
    )

    emb = _emb(spark)
    data = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
            for r in emb.collect()}
    ids = sorted(data)
    expected = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            s = float(data[a] @ data[b]
                      / (np.linalg.norm(data[a]) * np.linalg.norm(data[b])))
            if round(s, 6) >= 0.40:
                expected.add((a, b))

    def _banned(self, *a, **k):
        raise AssertionError("driver materialization inside all_pairs_cosine")

    for meth in ("collect", "toPandas", "toArrow", "toLocalIterator"):
        monkeypatch.setattr(SparkDF, meth, _banned)
    pairs = all_pairs_cosine(emb, 0.40 - 1e-4, n_blocks=4)
    kept = pairs.filter(F.round("cos_d", 6) >= 0.40)
    n = kept.count()
    monkeypatch.undo()
    got = {(r["id_a"], r["id_b"]) for r in kept.collect()}
    assert n == len(expected)
    assert got == expected


def test_all_pairs_cosine_block_count_invariant(spark):
    """Pair set must not depend on the blocking factor."""
    from superstore_data_pipeline_analytics_dashboard__spark.operators.similarity import (
        all_pairs_cosine,
    )

    emb = _emb(spark)
    one = {(r["id_a"], r["id_b"]) for r in all_pairs_cosine(emb, 0.4, n_blocks=1).collect()}
    many = {(r["id_a"], r["id_b"]) for r in all_pairs_cosine(emb, 0.4, n_blocks=7).collect()}
    assert one == many and len(one) > 0


def test_sign_lsh_neardup_finds_planted_pairs(spark):
    """Plant near-identical vectors; sign-LSH must recover them (recall at
    cos≈0.99 with 4 bands of 4 bits is ~1-(1-0.96)^4), every reported
    pair must verify exactly (precision 1), and the pair set must be a
    subset of the exact all-pairs result at the same threshold."""
    import numpy as np

    from superstore_data_pipeline_analytics_dashboard__spark.operators.similarity import (
        all_pairs_cosine, sign_lsh_neardup,
    )

    rng = np.random.default_rng(5)
    base = rng.standard_normal((40, 32))
    rows = []
    for i, v in enumerate(base):
        rows.append((i, [float(x) for x in v]))
        if i < 10:  # 10 planted near-dups: tiny perturbation of base[i]
            w = v + 0.01 * rng.standard_normal(32)
            rows.append((100 + i, [float(x) for x in w]))
    df = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<DOUBLE>")

    got = {(r["id_a"], r["id_b"]) for r in sign_lsh_neardup(df, 0.95).collect()}
    exact = {(r["id_a"], r["id_b"])
             for r in all_pairs_cosine(df, 0.95, n_blocks=4).collect()}
    planted = {(i, 100 + i) for i in range(10)}
    assert planted <= exact
    assert got <= exact                      # exact verification: no false pairs
    assert len(got & planted) >= 9           # ≥90% recall on planted pairs


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


def test_semantic_dedup_prunes_within_cell_only(spark):
    """Planted near-dup (unit vector + tiny perturbation, cos ~ 0.9997)
    must be dropped with its smaller-id source recorded; orthogonal
    vectors survive. Vectors engineered to land in the same cell via
    seed centroids (cells seeded from the 4 lowest ids)."""
    import numpy as np

    from superstore_data_pipeline_analytics_dashboard__spark.operators.similarity import (
        semantic_dedup,
    )

    d = 8
    rows = []
    for i in range(4):  # four orthogonal seed vectors -> 4 cells
        v = np.zeros(d); v[i] = 1.0
        rows.append((i, [float(x) for x in v]))
    dup = np.zeros(d); dup[1] = 1.0; dup[5] = 0.02   # near-dup of vec 1
    rows.append((10, [float(x) for x in dup / np.linalg.norm(dup)]))
    far = np.zeros(d); far[6] = 1.0; far[1] = 0.3    # same cell, not a dup
    rows.append((11, [float(x) for x in far / np.linalg.norm(far)]))

    df = spark.createDataFrame(rows, "vec_id BIGint, embedding ARRAY<DOUBLE>")
    got = {r["vec_id"]: (r["keep"], r["near_id"])
           for r in semantic_dedup(df, threshold=0.95, n_cells=4).collect()}
    assert got[10] == (False, 1)
    assert got[1][0] and got[11][0]
    assert all(got[i][0] for i in range(4))


def test_ivf_increment_matches_full_assign_and_flags_skew(spark):
    """Incremental IVF adds must equal a full re-assign under the SAME
    frozen centroids (assignment is a pure function of vector +
    centroids), and the skew signal must fire exactly when one cell
    swallows more than the threshold share."""
    from superstore_data_pipeline_analytics_dashboard__spark.operators.similarity import (
        ivf_assign,
        ivf_increment,
        seed_centroids,
    )

    emb = _emb(spark)
    old = emb.filter(F.col("vec_id") % 2 == 0)
    new = emb.filter(F.col("vec_id") % 2 == 1)
    cents = seed_centroids(old, 8)

    base = ivf_assign(old, cents)
    out = ivf_increment(new, cents, base)
    got = {
        (r["vec_id"], r["cell"]) for r in out["assigned"].collect()
    }
    want = {(r["vec_id"], r["cell"]) for r in ivf_assign(emb, cents).collect()}
    assert got == want

    flag = out["needs_rebuild"].first()
    # real embeddings over 8 seeded cells: no cell should hold >50%
    assert flag["needs_rebuild"] is False
    assert 0.0 < flag["max_cell_share"] <= 1.0

    # force total skew: every new vector identical -> lands in ONE cell
    one = new.limit(1).select("embedding").first()["embedding"]
    skewed = spark.range(10_000, 10_200).select(
        F.col("id").alias("vec_id"),
        F.lit(one).alias("embedding"),
    )
    out2 = ivf_increment(skewed, cents, base.limit(10), rebuild_share=0.5)
    assert out2["needs_rebuild"].first()["needs_rebuild"] is True


def test_ann_recall_harness(spark):
    """Recall@k evaluation: exact-vs-exact recall is identically 1;
    the IVF configuration q28 ships must clear a 0.5 mean-recall floor
    on the real embeddings (deterministic — seeded centroids)."""
    from superstore_data_pipeline_analytics_dashboard__spark.operators.similarity import (
        ann_recall,
        knn_bruteforce,
    )

    emb = _emb(spark)
    queries = emb.filter(F.col("vec_id") < 20)

    rows = ann_recall(emb, queries, k=10, n_cells=16, nprobe=4).collect()
    assert len(rows) == 20
    assert all(0.0 <= r["recall"] <= 1.0 for r in rows)
    mean = sum(r["recall"] for r in rows) / len(rows)
    assert mean >= 0.5, mean

    # identity check: intersecting the exact tier with itself -> 1.0
    exact = knn_bruteforce(emb, queries, k=10).select(
        "query_id", "neighbor_id"
    )
    hits = exact.join(exact, ["query_id", "neighbor_id"], "left_semi")
    assert hits.count() == exact.count()
