"""Distributed Lloyd's k-means over int8-quantized embeddings.

Topic-style clustering is the organizing step of several curation
recipes (SemDeDup's cluster-then-dedup, cluster-balanced sampling,
per-cluster quality audits).  The reference has no clustering operator;
this one follows the public MLlib KMeans execution shape — per-iteration
centroids are collected to the driver (k × dims longs, kilobytes) and
re-broadcast as literals so the ASSIGNMENT pass is a narrow map with
zero shuffle; the only shuffle per iteration is the (cluster, dim) sum
that rebuilds the centroids.

Exactness contract (what makes this oracle-able when nothing else about
k-means is): all geometry runs on the q74-style int8 quantization of the
vectors, so every dot product / squared norm / distance is an exact
INTEGER (order-independent, engine-portable), the arg-min tie-break is
"lowest centroid id", and centroid updates use floor(sum / count) where
both operands are exact integers far below 2^53 — the IEEE double
division is therefore correctly rounded to the same value in any engine,
and its floor is exact.  Float k-means would hash-diverge on summation
order; integer k-means cannot.

Scale shape per iteration (N vectors, d dims, k clusters):
* assignment: ONE narrow pass, fold over a k-element literal centroid
  array — no crossJoin, no shuffle, stays in whole-stage codegen;
* update: posexplode to N·d rows, partial-aggregated map-side onto k·d
  keys — the classic mergeable-sum shape;
* driver traffic: k·d longs per iteration (MLlib does the same — the
  centroid collect is how every public Spark k-means works).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from . import checkpoint as _ckpt

__all__ = ["quantize_embeddings", "kmeans_quantized"]


def quantize_embeddings(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Symmetric int8 quantization (q74 convention), components as LONGs
    so downstream integer folds cannot overflow, plus the precomputed
    squared norm ``nq`` used by every distance evaluation.

    Two-step on purpose: the scale is materialized as a column BEFORE
    the per-element transform — inlining ``array_max(...)`` inside the
    element lambda re-scans the whole vector per element (O(d²)/row;
    measured 1.42 s → 0.59 s on the sf0.1 embeddings)."""
    scale = F.greatest(
        F.array_max(
            F.transform(F.col(vec_col), lambda x: F.abs(x.cast("double")))
        ),
        F.lit(1e-12),
    )
    step = emb.withColumn("__s", scale)
    q = F.transform(
        F.col(vec_col),
        lambda x: F.round(x.cast("double") * F.lit(127.0) / F.col("__s")).cast(
            "long"
        ),
    )
    nq = F.aggregate(
        F.transform(q, lambda a: a * a),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return (
        step.withColumn("q", q)
        .withColumn("nq", nq)
        .drop(vec_col, "__s")
    )


def _sq_norm(arr: list[int]) -> int:
    return sum(a * a for a in arr)


_CENT_SCHEMA = (
    "cents array<struct<cid: int, c: array<bigint>, nc: bigint>>"
)


def _assign(quant: DataFrame, cents: list[tuple[int, list[int]]]) -> DataFrame:
    """Narrow arg-min assignment against a broadcast centroid array.

    dist(q, c) = nq + nc - 2·dot(q, c) — exact longs throughout.
    ``array_min`` over (dist, cid) structs uses lexicographic struct
    ordering: minimum distance first, lowest cid on ties — each distance
    evaluated exactly once.  The centroids travel as DATA in a one-row
    broadcast DataFrame, not as plan literals: k·d literal expression
    nodes made Catalyst re-analyze a ~500-node tree every iteration
    (~1.1 s/iteration of pure driver time at k=8, d=64; 0.14 s as a
    broadcast row).  The crossJoin is a BroadcastNestedLoopJoin against
    ONE row — no shuffle, the fold runs inside codegen."""
    spark = quant.sparkSession
    payload = [(cid, c, _sq_norm(c)) for cid, c in cents]
    cdf = spark.createDataFrame([(payload,)], _CENT_SCHEMA)

    def dist(s: Column) -> Column:
        dot = F.aggregate(
            F.zip_with(F.col("q"), s["c"], lambda a, b: a * b),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        return F.col("nq") + s["nc"] - F.lit(2).cast("long") * dot

    best = F.array_min(
        F.transform(
            F.col("cents"),
            lambda s: F.struct(dist(s).alias("dist"), s["cid"].alias("cid")),
        )
    )
    return (
        quant.crossJoin(F.broadcast(cdf))
        .withColumn("__b", best)
        .select(
            *quant.columns,
            F.col("__b.cid").alias("cid"),
            F.col("__b.dist").alias("dist"),
        )
    )


def kmeans_quantized(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    iters: int = 3,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 1,
) -> DataFrame:
    """Run ``iters`` Lloyd iterations; return per-cluster summary.

    Init: the k vectors with the LOWEST ids, cid assigned in id order —
    fully deterministic, no RNG.  Clusters that lose all members simply
    drop out of the next centroid table (deterministic on both engines).

    Output: cluster_id, n_members, rep_id (min member id), inertia
    (exact integer sum of squared quantized distances).

    Restartability (``checkpoint_dir``, round 8): when set, the k×d-long
    centroid table is persisted every ``checkpoint_every`` rounds via
    :mod:`operators.checkpoint` and a rerun resumes from the newest
    complete checkpoint at or below its own ``iters``. Every Lloyd step
    is a pure deterministic function of (centroids, corpus) — exact
    integer geometry, lowest-cid tie-break — so a resumed run is
    BIT-IDENTICAL to an uninterrupted one (tests/test_checkpoint.py).
    The checkpointed state is kilobytes; the quantized corpus is input
    and is never checkpointed.
    """
    quant = quantize_embeddings(emb, vec_col).persist()
    spark = emb.sparkSession
    # id_col is semantics-bearing: it picks the deterministic seeds, so
    # resuming under a different one would mix seed trajectories
    ckpt_meta = {
        "op": "kmeans_quantized",
        "k": k,
        "vec_col": vec_col,
        "id_col": id_col,
    }
    start = 0
    if checkpoint_dir is not None:
        done = _ckpt.latest_iteration(spark, checkpoint_dir, at_most=iters)
        if done is not None:
            start = done
            cents = [
                (int(r["cid"]), list(r["c"]))
                for r in _ckpt.load_state(
                    spark, checkpoint_dir, done, ckpt_meta
                )
                .orderBy("cid")
                .collect()
            ]
    if start == 0:
        seed_rows = (
            quant.select(id_col, "q").orderBy(id_col).limit(k).collect()
        )
        cents = [(i, list(r["q"])) for i, r in enumerate(seed_rows)]

    for it in range(start + 1, iters + 1):
        assigned = _assign(quant, cents)
        # count(*) per (cid, dim) IS the member count — one aggregation
        # feeds both the numerator and the divisor, no second job/join
        sums = (
            assigned.select("cid", F.posexplode("q").alias("dim", "qv"))
            .groupBy("cid", "dim")
            .agg(F.sum("qv").alias("s"), F.count("*").alias("n"))
        )
        new_cent = (
            sums.select(
                "cid",
                "dim",
                # exact-int floor through a correctly-rounded double
                # division (|s| < 2^53): same long on every engine
                F.floor(F.col("s") / F.col("n")).alias("cv"),
            )
            .groupBy("cid")
            .agg(
                F.array_sort(F.collect_list(F.struct("dim", "cv"))).alias(
                    "__dc"
                )
            )
            .select(
                "cid",
                F.transform(F.col("__dc"), lambda s: s["cv"]).alias("c"),
            )
            .orderBy("cid")
            .collect()
        )
        cents = [(int(r["cid"]), list(r["c"])) for r in new_cent]
        if checkpoint_dir is not None and (
            it % checkpoint_every == 0 or it == iters
        ):
            state = spark.createDataFrame(cents, "cid INT, c ARRAY<BIGINT>")
            _ckpt.save_state(state, checkpoint_dir, it, ckpt_meta)

    final = _assign(quant, cents)
    out = final.groupBy("cid").agg(
        F.count("*").alias("n_members"),
        F.min(id_col).alias("rep_id"),
        F.sum("dist").alias("inertia"),
    )
    out = out.select(
        F.col("cid").alias("cluster_id"), "n_members", "rep_id", "inertia"
    )
    # materialize the k-row summary BEFORE releasing the cache — an
    # unpersist ahead of the caller's action would force the final
    # assignment (the most expensive pass) to re-quantize cache-cold,
    # while never unpersisting would pin corpus-scale storage. The
    # operator is already eager (per-iteration collects), and k rows on
    # the driver is the same footprint as the centroids themselves.
    spark = quant.sparkSession
    rows = out.collect()
    quant.unpersist()
    return spark.createDataFrame(rows, out.schema)
