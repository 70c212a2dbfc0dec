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


def knn_ivf(
    vectors: DataFrame,
    query: DataFrame,
    k: int = 10,
    n_cells: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: route each query to its `nprobe` nearest cells,
    brute-force only inside those cells. Search cost ≈ nprobe/n_cells of
    exact."""
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
