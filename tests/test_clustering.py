"""Quantized k-means (operators/clustering.py) against a pure-Python
Lloyd reference with the same integer geometry — exact to the tie-break,
like test_bpe's strategy for iterative operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from superstore_data_pipeline_analytics_dashboard__spark.operators.clustering import (
    kmeans_quantized,
    quantize_embeddings,
)
from tests.conftest import SF_SMOKE


def _quant_py(vec: list[float]) -> list[int]:
    import math

    scale = max(max(abs(x) for x in vec), 1e-12)

    # HALF_UP (away from zero), matching Spark F.round / DuckDB round —
    # Python's round() is banker's and would diverge on exact .5 values
    def r(v: float) -> int:
        return int(math.floor(abs(v) + 0.5)) * (1 if v >= 0 else -1)

    return [r(x * 127.0 / scale) for x in vec]


def _kmeans_py(rows: list[tuple[int, list[int]]], k: int, iters: int):
    """Pure-Python Lloyd twin: lowest-id seeds, strictly-smaller/lowest-cid
    tie-break, floor(sum/count) updates."""
    import math

    cents = [list(q) for _, q in sorted(rows)[:k]]

    def assign(cs):
        out = {}
        for vid, q in rows:
            best = None
            for cid, c in enumerate(cs):
                d = sum((a - b) ** 2 for a, b in zip(q, c))
                if best is None or d < best[0]:
                    best = (d, cid)
            out[vid] = best
        return out

    for _ in range(iters):
        a = assign(cents)
        new = []
        for cid in range(len(cents)):
            members = [q for vid, q in rows if a[vid][1] == cid]
            if members:
                n = len(members)
                new.append(
                    [
                        math.floor(sum(m[d] for m in members) / n)
                        for d in range(len(members[0]))
                    ]
                )
        cents = new
    return assign(cents)


def test_kmeans_matches_python_reference(spark):
    emb = (
        spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
        .limit(60)
        .select("vec_id", "embedding")
    )
    rows = [
        (r["vec_id"], _quant_py(list(r["embedding"])))
        for r in emb.collect()
    ]
    want_assign = _kmeans_py(rows, k=4, iters=2)

    want = {}
    for vid, (d, cid) in want_assign.items():
        n, rep, inertia = want.get(cid, (0, None, 0))
        rep = vid if rep is None else min(rep, vid)
        want[cid] = (n + 1, rep, inertia + d)

    got = {
        r["cluster_id"]: (r["n_members"], r["rep_id"], r["inertia"])
        for r in kmeans_quantized(emb, k=4, iters=2).collect()
    }
    # python cids are positional over SURVIVING clusters; spark keeps the
    # original ids — compare the multiset of (n, rep, inertia) summaries
    assert sorted(got.values()) == sorted(want.values())


def test_kmeans_partitions_all_vectors(spark):
    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    n = emb.count()
    out = kmeans_quantized(emb, k=8, iters=1).collect()
    assert sum(r["n_members"] for r in out) == n
    assert all(r["inertia"] >= 0 for r in out)
    assert len(out) <= 8


def test_quantize_embeddings_bounds(spark):
    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    q = quantize_embeddings(emb)
    bad = q.filter(
        F.exists("q", lambda x: (x > 127) | (x < -127))
    ).count()
    assert bad == 0
    # nq equals the fold of squares
    chk = q.select(
        (
            F.aggregate(
                F.transform("q", lambda a: a * a),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            )
            == F.col("nq")
        ).alias("ok")
    )
    assert chk.filter(~F.col("ok")).count() == 0
