"""Similarity search over embedding columns (array<float>).

* brute-force top-k cosine — the exact baseline: one narrow scan, dot
  products JVM-side via zip_with/aggregate, then a global top-k. Global
  top-k is a TopK sort (Spark keeps k per partition then merges), not a
  full sort — safe at scale for small k.
* IVF (inverted-file) — the scale path: partition vectors into C cells by
  nearest centroid (precomputed, broadcast), search only `nprobe` cells.
  Centroid selection here is deterministic k-means-free seeding (lowest
  ids) — good enough to exercise the pruning plan shape; swap in k-means||
  from MLlib when recall matters.
* pairwise LSH buckets via random-hyperplane signs (SimHash for vectors).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import vectors as V


def knn_bruteforce(
    vectors: DataFrame,
    query: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors of each query row (cross-join shape:
    |Q| × |N| dot products; |Q| is expected tiny — it is broadcast)."""
    q = query.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qvec")
    )
    scored = vectors.crossJoin(F.broadcast(q)).filter(
        F.col(id_col) != F.col("query_id")
    )
    scored = scored.select(
        "query_id",
        F.col(id_col).alias("neighbor_id"),
        V.cosine(
            F.col(vec_col).cast("array<double>"), F.col("__qvec").cast("array<double>")
        ).alias("cos_sim"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round("cos_sim", 6).cast("decimal(18,6)").alias("cos_sim"),
            "rnk",
        )
    )


def all_pairs_cosine(
    vectors: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All-pairs cosine similarity ≥ threshold (the vector tier of dedup).

    Expression-tree attempts are pathological here: a zip_with/aggregate
    lambda runs interpreted per pair (84 s at sf0.1), an unrolled
    element_at chain still pays per-element null/bounds checks (34 s), and
    64 flattened scalar columns blow up Catalyst's optimizer. This is the
    one shape where the right tool is Arrow + BLAS: broadcast the (n×d)
    matrix, stream row-blocks through mapInPandas, and emit each block's
    similarity row against the whole matrix (~3 s at sf0.1, and scales by
    blocking: each task does a (block×d)·(d×n) matmul).

    BLAS reduction order differs from a sequential sum by ~1 ulp; output
    is rounded to 6 decimals so the DuckDB oracle still hash-matches.
    At true scale, partition the matrix into column blocks and join block
    pairs (or pre-bucket with sign-LSH — see q28's IVF analog)."""
    import numpy as np
    import pandas as pd

    spark = vectors.sparkSession
    rows = vectors.select(id_col, vec_col).collect()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    mat = np.array([r[1] for r in rows], dtype=np.float64)
    norms = np.sqrt((mat * mat).sum(axis=1))
    b_ids = spark.sparkContext.broadcast(ids)
    b_mat = spark.sparkContext.broadcast(mat)
    b_norms = spark.sparkContext.broadcast(norms)

    def gen(batches):
        all_ids, all_mat, all_norms = b_ids.value, b_mat.value, b_norms.value
        for pdf in batches:
            block = np.array(list(pdf[vec_col]), dtype=np.float64)
            block_ids = pdf[id_col].to_numpy(dtype=np.int64)
            block_norms = np.sqrt((block * block).sum(axis=1))
            sims = (block @ all_mat.T) / np.outer(block_norms, all_norms)
            out_a, out_b, out_s = [], [], []
            for i in range(len(block_ids)):
                mask = (sims[i] >= threshold) & (all_ids > block_ids[i])
                js = np.nonzero(mask)[0]
                out_a.extend([block_ids[i]] * len(js))
                out_b.extend(all_ids[js])
                out_s.extend(sims[i][js])
            yield pd.DataFrame({"id_a": out_a, "id_b": out_b, "cos_d": out_s})

    return vectors.select(id_col, vec_col).mapInPandas(
        gen, schema="id_a BIGINT, id_b BIGINT, cos_d DOUBLE"
    )


def ivf_assign(
    vectors: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign each vector to its nearest centroid (broadcast centroids,
    argmin over squared L2). Output adds `cell` — at scale, write the table
    partitioned by `cell` so probes prune partitions."""
    c = centroids.select(
        F.col("centroid_id"), F.col(vec_col).alias("__cvec")
    )
    d = V.squared_l2(
        F.col(vec_col).cast("array<double>"), F.col("__cvec").cast("array<double>")
    )
    scored = vectors.crossJoin(F.broadcast(c)).select(
        F.col(id_col), F.col(vec_col), F.col("centroid_id"), d.alias("__dist")
    )
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy(F.asc("__dist"), F.asc("centroid_id"))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(F.col(id_col), F.col(vec_col), F.col("centroid_id").alias("cell"))
    )


def seed_centroids(
    vectors: DataFrame, n_cells: int, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Deterministic centroid seeds: the n_cells lowest-id vectors."""
    seeds = vectors.orderBy(id_col).limit(n_cells)
    from pyspark.sql import Window

    w = Window.orderBy(id_col)
    return seeds.select(
        F.row_number().over(w).alias("centroid_id"), F.col(vec_col)
    )


def kmeans_centroids(
    vectors: DataFrame,
    n_cells: int,
    max_iter: int = 10,
    seed: int = 42,
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF centroids via MLlib k-means (the idiomatic Spark answer to an
    iterative algorithm — Lloyd's iterations run as distributed aggregates
    under the hood, no driver-side loop over rows). Returns
    (centroid_id, `vec_col`) shaped like seed_centroids."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    ml_df = vectors.select(
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features")
    )
    model = KMeans(k=n_cells, maxIter=max_iter, seed=seed).fit(ml_df)
    spark = vectors.sparkSession
    rows = [
        (i + 1, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())
    ]
    return spark.createDataFrame(rows, f"centroid_id INT, {vec_col} ARRAY<DOUBLE>")


def knn_ivf(
    vectors: DataFrame,
    query: DataFrame,
    k: int = 10,
    n_cells: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: str = "seed",
) -> DataFrame:
    """Approximate top-k: route each query to its `nprobe` nearest cells,
    brute-force only inside those cells. Search cost ≈ nprobe/n_cells of
    exact. `centroids`: 'seed' (deterministic lowest-id seeds) or
    'kmeans' (MLlib Lloyd's — better cell balance → better recall)."""
    if centroids == "kmeans":
        cents = kmeans_centroids(vectors, n_cells, vec_col=vec_col)
    else:
        cents = seed_centroids(vectors, n_cells, id_col, vec_col)
    assigned = ivf_assign(vectors, cents, id_col, vec_col)

    q = query.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qvec"))
    qd = V.squared_l2(
        F.col("__qvec").cast("array<double>"), F.col(vec_col).cast("array<double>")
    )
    from pyspark.sql import Window

    wq = Window.partitionBy("query_id").orderBy(F.asc("__qdist"), F.asc("centroid_id"))
    probes = (
        q.crossJoin(F.broadcast(cents))
        .select("query_id", "__qvec", "centroid_id", qd.alias("__qdist"))
        .withColumn("__rn", F.row_number().over(wq))
        .filter(F.col("__rn") <= nprobe)
        .select("query_id", "__qvec", F.col("centroid_id").alias("cell"))
    )

    scored = assigned.join(probes, "cell").filter(F.col(id_col) != F.col("query_id"))
    scored = scored.select(
        "query_id",
        F.col(id_col).alias("neighbor_id"),
        V.cosine(
            F.col(vec_col).cast("array<double>"), F.col("__qvec").cast("array<double>")
        ).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round("cos_sim", 6).cast("decimal(18,6)").alias("cos_sim"),
            "rnk",
        )
    )
