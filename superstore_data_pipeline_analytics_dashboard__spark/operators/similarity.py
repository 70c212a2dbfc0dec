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
    |Q| × |N| dot products; |Q| is expected tiny — it is broadcast).

    r13 measured rewrite: each side's norm is hoisted to a per-ROW
    column, so the per-pair expression evaluates ONE d-element fold
    (the dot) instead of three — the fold V.cosine inlines re-derives
    both norms once per PAIR, |Q|× redundant work on the vector side.
    Bit-identical (same expressions, same IEEE order, evaluated per row
    instead of per pair). Unrolled `a[0]*b[0]+…` trees were ALSO
    measured here and are 2-2.5× SLOWER than the fold on Spark 4.1's
    evaluator (200k-pair probe: fold 2.3 s, all-unrolled 5.9 s, hoisted
    norms + fold dot 1.85 s) — the r4-era "unroll beats interpreted"
    finding does not transfer to this join shape; keep folds."""
    q = query.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("__qvec"),
    ).withColumn("__qn", V.norm(F.col("__qvec")))
    v = vectors.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("__vvec")
    ).withColumn("__vn", V.norm(F.col("__vvec")))
    cos = V.dot(F.col("__vvec"), F.col("__qvec")) / F.nullif(
        F.col("__vn") * F.col("__qn"), F.lit(0.0)
    )
    scored = v.crossJoin(F.broadcast(q)).filter(
        F.col(id_col) != F.col("query_id")
    )
    scored = scored.select(
        "query_id",
        F.col(id_col).alias("neighbor_id"),
        cos.alias("cos_sim"),
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
    n_blocks: int = 8,
) -> DataFrame:
    """All-pairs cosine similarity ≥ threshold (the vector tier of dedup),
    block-partitioned so NOTHING is materialized on the driver.

    Expression-tree attempts are pathological here: a zip_with/aggregate
    lambda runs interpreted per pair (84 s at sf0.1), an unrolled
    element_at chain still pays per-element null/bounds checks (34 s), and
    64 flattened scalar columns blow up Catalyst's optimizer. The right
    tool is Arrow + BLAS — but round 1's collect()+broadcast of the whole
    (n×d) matrix was a driver OOM at 100 TB (VERDICT.md "What's wrong" #3).

    Block design: each vector lands in block ``vid % n_blocks``; a tiny
    broadcast table of the B(B+1)/2 unordered block pairs replicates each
    row to the pairs it participates in; a cogroup on (bi, bj) hands every
    block pair's two sub-matrices to one Arrow task that runs a single
    (n/B × d)·(d × n/B) GEMM. Costs, all bounded and driver-free:

    * shuffle volume  = B·n rows (each row appears in B block pairs);
    * tasks           = B(B+1)/2, embarrassingly parallel;
    * task memory     = 2·(n/B)·d·8 bytes — pick n_blocks so a block pair
      fits an executor; at 1000 executors scale B with sqrt(n).

    The GEMM computes full-d dot products exactly as the broadcast form
    did; BLAS reduction order differs from a sequential sum by ~1 ulp, so
    callers decide threshold membership on the ROUNDED value (q33).
    An LSH/IVF candidate prefilter (q26-q28 machinery) can replace the
    all-pairs block grid when the corpus outgrows even the blocked form."""
    import numpy as np
    import pandas as pd

    spark = vectors.sparkSession
    blocks = vectors.select(
        F.col(id_col).cast("bigint").alias("vid"),
        F.col(vec_col).cast("array<double>").alias("vec"),
        F.pmod(F.col(id_col), F.lit(n_blocks)).cast("int").alias("blk"),
    )
    pair_keys = spark.createDataFrame(
        [(i, j) for i in range(n_blocks) for j in range(i, n_blocks)],
        "bi INT, bj INT",
    )
    left = blocks.join(F.broadcast(pair_keys), blocks["blk"] == pair_keys["bi"]).select(
        "bi", "bj", "vid", "vec"
    )
    # distinct column names on the right branch: both sides share the
    # blocks/pair_keys lineage and Spark's self-join check rejects
    # same-name references (cogroup aligns keys by position, not name)
    rblocks = blocks.select(
        F.col("vid").alias("rvid"), F.col("vec").alias("rvec"), F.col("blk").alias("rblk")
    )
    rpairs = pair_keys.select(F.col("bi").alias("rbi"), F.col("bj").alias("rbj"))
    right = rblocks.join(F.broadcast(rpairs), rblocks["rblk"] == rpairs["rbj"]).select(
        "rbi", "rbj", "rvid", "rvec"
    )

    def gemm(key, lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "id_a": np.array([], dtype=np.int64),
                "id_b": np.array([], dtype=np.int64),
                "cos_d": np.array([], dtype=np.float64),
            }
        )
        if lpdf.empty or rpdf.empty:
            return empty
        a_ids = lpdf["vid"].to_numpy(dtype=np.int64)
        b_ids = rpdf["rvid"].to_numpy(dtype=np.int64)
        a_mat = np.array(list(lpdf["vec"]), dtype=np.float64)
        b_mat = np.array(list(rpdf["rvec"]), dtype=np.float64)
        a_norms = np.sqrt((a_mat * a_mat).sum(axis=1))
        b_norms = np.sqrt((b_mat * b_mat).sum(axis=1))
        sims = (a_mat @ b_mat.T) / np.outer(a_norms, b_norms)
        mask = sims >= threshold
        if key[0] == key[1]:
            # diagonal block: both orientations present — keep a < b once
            mask &= a_ids[:, None] < b_ids[None, :]
        else:
            mask &= a_ids[:, None] != b_ids[None, :]
        ii, jj = np.nonzero(mask)
        if len(ii) == 0:
            return empty
        pa, pb = a_ids[ii], b_ids[jj]
        return pd.DataFrame(
            {
                # off-diagonal pairs arrive in one orientation; normalize
                "id_a": np.minimum(pa, pb),
                "id_b": np.maximum(pa, pb),
                "cos_d": sims[ii, jj],
            }
        )

    return (
        left.groupBy("bi", "bj")
        .cogroup(right.groupBy("rbi", "rbj"))
        .applyInPandas(gemm, schema="id_a BIGINT, id_b BIGINT, cos_d DOUBLE")
    )


def sign_lsh_neardup(
    vectors: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 16,
    bands: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Approximate near-dup pairs via random-hyperplane (sign) LSH with
    banding, verified by exact cosine — the scale path past even the
    blocked all-pairs grid, for the high-similarity regime.

    Sign-LSH collision probability per bit is 1 − θ/π, so banding
    n_planes=16 into 4 bands of 4 bits gives ~96 % recall at cos ≈ 0.9
    while random pairs (cos ≈ 0) collide with probability ~4·(1/2)⁴ ≈ 25 %
    per band-space — and every collision is then EXACTLY verified, so
    precision is 1 and only recall is approximate. Use this instead of
    :func:`all_pairs_cosine` when n² block pairs stop being affordable;
    candidate volume is linear in n plus true-near-dup pairs.

    Plan shape: one linear mapInPandas GEMM projects each vector onto the
    16 hyperplanes (deterministic seeded planes, regenerated identically
    inside every task — no driver materialization, nothing broadcast);
    explode to (band, bucket); self-join on equal buckets; distinct;
    exact-cosine verify JVM-side. All shuffles carry 8-byte ids + small
    buckets, never the vectors — the verify join re-reads them by id."""
    import numpy as np
    import pandas as pd

    r = n_planes // bands

    def signatures(batches):
        # planes derived from the seed alone → identical in every task
        for pdf in batches:
            if pdf.empty:
                yield pd.DataFrame({"vid": [], "band": [], "bucket": []})
                continue
            mat = np.array(list(pdf[vec_col]), dtype=np.float64)
            planes = np.random.default_rng(seed).standard_normal((mat.shape[1], n_planes))
            bits = (mat @ planes) >= 0.0
            vids = pdf[id_col].to_numpy(dtype=np.int64)
            out_v, out_band, out_bucket = [], [], []
            for bi in range(bands):
                chunk = bits[:, bi * r : (bi + 1) * r]
                buckets = chunk.dot(1 << np.arange(r)).astype(np.int64)
                out_v.extend(vids)
                out_band.extend([bi] * len(vids))
                out_bucket.extend(buckets)
            yield pd.DataFrame({"vid": out_v, "band": out_band, "bucket": out_bucket})

    sigs = vectors.select(id_col, vec_col).mapInPandas(
        signatures, schema="vid BIGINT, band INT, bucket BIGINT"
    )
    a, b = sigs.alias("a"), sigs.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vid") < F.col("b.vid")),
        )
        .select(F.col("a.vid").alias("id_a"), F.col("b.vid").alias("id_b"))
        .distinct()
    )
    va = vectors.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).cast("array<double>").alias("__va")
    )
    vb = vectors.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).cast("array<double>").alias("__vb")
    )
    # r13 measured rewrite (the knn_bruteforce note): hoist each side's
    # norm to a per-row column so every band collision pays ONE d-fold
    # (the dot) instead of three — bit-identical to V.cosine; unrolled
    # index trees measured 2-2.5× slower than the fold, keep folds
    va = va.withColumn("__na", V.norm(F.col("__va")))
    vb = vb.withColumn("__nb", V.norm(F.col("__vb")))
    cos_d = V.dot(F.col("__va"), F.col("__vb")) / F.nullif(
        F.col("__na") * F.col("__nb"), F.lit(0.0)
    )
    return (
        cands.join(va, "id_a")
        .join(vb, "id_b")
        .select(
            "id_a",
            "id_b",
            cos_d.alias("cos_d"),
        )
        .filter(F.col("cos_d") >= threshold)
    )


def semantic_dedup(
    vectors: DataFrame,
    threshold: float = 0.95,
    n_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: str = "seed",
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): cluster embeddings, then prune near-duplicates
    WITHIN each cluster only — the O(n²) pairwise comparison collapses to
    Σ|cell|², and recall loss is confined to near-dups that straddle a
    cell boundary (the paper's accepted trade).

    Composition of the existing IVF machinery: centroids ('seed'
    deterministic lowest-id, or 'kmeans' MLlib) → ``ivf_assign`` → one
    Arrow task per cell runs a single GEMM over the cell's matrix and
    applies the keep rule. Keep rule here is deterministic min-id: a
    vector is dropped iff some SMALLER id in its cell is ≥ threshold
    (the paper keeps a random/centroid-far exemplar; min-id makes the
    result reproducible run-to-run).

    Scale: task memory is |cell|·d·8 B + the |cell|² sim matrix — size
    n_cells so the LARGEST cell fits an executor (at 100 TB: n_cells ≈
    n/50k and k-means centroids for balance; re-shard a runaway cell by
    sub-clustering it with the same operator). Shuffle = one partition
    pass by cell; vectors shuffle once, ids/flags come back.

    Returns (vec_id, cell, keep, near_id, near_sim): ``near_id`` is the
    smaller-id in-cell vector that triggered the drop (NULL for keepers),
    ``near_sim`` its cosine rounded to 6 places."""
    import numpy as np
    import pandas as pd

    if centroids == "kmeans":
        cents = kmeans_centroids(vectors, n_cells, vec_col=vec_col)
    else:
        cents = seed_centroids(vectors, n_cells, id_col, vec_col)
    assigned = ivf_assign(vectors, cents, id_col, vec_col)

    def prune(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf[id_col].to_numpy(dtype=np.int64)
        order = np.argsort(ids)
        ids = ids[order]
        mat = np.array(list(pdf[vec_col].iloc[order]), dtype=np.float64)
        norms = np.sqrt((mat * mat).sum(axis=1))
        norms[norms == 0.0] = 1.0
        sims = (mat / norms[:, None]) @ (mat / norms[:, None]).T
        n = len(ids)
        keep = np.ones(n, dtype=bool)
        near_id = np.full(n, -1, dtype=np.int64)
        near_sim = np.full(n, np.nan, dtype=np.float64)
        for i in range(1, n):
            smaller = sims[i, :i]
            j = int(np.argmax(smaller))
            if round(float(smaller[j]), 6) >= threshold:
                keep[i] = False
                near_id[i] = ids[j]
                near_sim[i] = round(float(smaller[j]), 6)
        return pd.DataFrame(
            {
                "vec_id": ids,
                "cell": pdf["cell"].iloc[0],
                "keep": keep,
                # true NULLs for keepers (NaN would surface as DOUBLE NaN)
                "near_id": [None if k else int(v) for k, v in zip(keep, near_id)],
                "near_sim": [None if k else float(s) for k, s in zip(keep, near_sim)],
            }
        )

    return assigned.groupBy("cell").applyInPandas(
        prune,
        schema="vec_id BIGINT, cell INT, keep BOOLEAN, near_id BIGINT, near_sim DOUBLE",
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
        F.col("centroid_id"), F.col(vec_col).cast("array<double>").alias("__cvec")
    )
    d = V.squared_l2(
        F.col(vec_col).cast("array<double>"), F.col("__cvec")
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

    q = query.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("__qvec"),
    )
    qd = V.squared_l2(
        F.col("__qvec"), F.col(vec_col).cast("array<double>")
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

    # r13 measured rewrite (the knn_bruteforce note): per-row hoisted
    # norms so each scored pair pays one d-fold, bit-identical
    assigned = assigned.withColumn(
        "__vn", V.norm(F.col(vec_col).cast("array<double>"))
    )
    probes = probes.withColumn("__qn", V.norm(F.col("__qvec")))
    cos = V.dot(
        F.col(vec_col).cast("array<double>"), F.col("__qvec")
    ) / F.nullif(F.col("__vn") * F.col("__qn"), F.lit(0.0))
    scored = assigned.join(probes, "cell").filter(F.col(id_col) != F.col("query_id"))
    scored = scored.select(
        "query_id",
        F.col(id_col).alias("neighbor_id"),
        cos.alias("cos_sim"),
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


def ivf_increment(
    new_vectors: DataFrame,
    centroids: DataFrame,
    assigned: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    rebuild_share: float = 0.5,
) -> dict:
    """Incrementally grow an IVF index: assign only the ARRIVING vectors
    against the FROZEN centroid table (one narrow broadcast-argmin pass,
    cost ∝ batch — the vector-side twin of ``incremental_dedup``) and
    append to the assigned table (partition-per-cell at rest, so probes
    keep pruning).

    Frozen centroids are what makes increments cheap AND what decays
    recall when the arriving distribution drifts, so the update carries
    its own health signal: ``needs_rebuild`` is a one-row frame flagging
    when any cell's share of the grown index exceeds ``rebuild_share``
    (a skewed cell means probes over it approach brute-force). The
    caller re-runs ``kmeans_centroids`` + a full ``ivf_assign`` when
    flagged — centroid rebuilds are rare, scheduled work; per-batch adds
    never pay them."""
    add = ivf_assign(new_vectors, centroids, id_col, vec_col)
    grown = assigned.unionByName(add)
    shares = grown.groupBy("cell").agg(F.count("*").alias("n"))
    tot = shares.agg(F.sum("n").alias("tot"))
    needs = (
        shares.crossJoin(F.broadcast(tot))
        .agg(
            F.max(
                F.col("n").cast("double") / F.col("tot").cast("double")
            ).alias("max_cell_share")
        )
        .select(
            "max_cell_share",
            (F.col("max_cell_share") > F.lit(rebuild_share)).alias(
                "needs_rebuild"
            ),
        )
    )
    return {"assigned": grown, "needs_rebuild": needs}


def ann_recall(
    vectors: DataFrame,
    query: DataFrame,
    k: int = 10,
    n_cells: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Recall@k of the IVF tier against the exact tier — the standard
    ANN evaluation harness, run as a query so an index configuration
    (n_cells, nprobe) can be judged on the ACTUAL corpus before
    deployment rather than trusted on faith.

    One row per query vector: (query_id, n_exact, n_hits, recall),
    where recall =
    |IVF top-k ∩ exact top-k| / |exact top-k| — the denominator is the
    EXACT side's actual result count, which equals k whenever the
    corpus holds more than k other vectors and degrades gracefully on
    tiny corpora (recall stays 1.0 when IVF finds everything findable,
    instead of capping at n/k). Exact integers + one ratio. Scale:
    both sides reuse the broadcast-query kNN shapes (cost |Q|·|N| and
    |Q|·|N|·nprobe/n_cells); the intersection is a join on
    (query_id, neighbor_id) over 2·|Q|·k rows — negligible. Evaluating
    on a SAMPLE of queries (the caller picks |Q|) is the standard
    practice this mirrors.

    ``exact`` is persisted: it feeds both the intersection semi-join
    and the per-query denominator — unpersisted, the |Q|·|N| cosine
    scoring and its TopK shuffle would execute twice per action."""
    exact = (
        knn_bruteforce(vectors, query, k, id_col, vec_col)
        .select("query_id", "neighbor_id")
        .persist()
    )
    approx = knn_ivf(
        vectors, query, k, n_cells, nprobe, id_col, vec_col
    ).select("query_id", "neighbor_id")
    hits = exact.join(approx, ["query_id", "neighbor_id"], "left_semi")
    per_q = (
        exact.groupBy("query_id")
        .agg(F.count("*").alias("n_exact"))
        .join(
            hits.groupBy("query_id").agg(F.count("*").alias("n_hits")),
            "query_id",
            "left",
        )
        .select(
            "query_id",
            F.col("n_exact").cast("bigint").alias("n_exact"),
            F.coalesce("n_hits", F.lit(0)).cast("bigint").alias("n_hits"),
            (
                F.coalesce("n_hits", F.lit(0)).cast("double")
                / F.col("n_exact").cast("double")
            ).alias("recall"),
        )
    )
    return per_q
