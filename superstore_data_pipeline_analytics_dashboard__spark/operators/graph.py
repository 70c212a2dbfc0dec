"""Connected components — the step that turns pairwise near-duplicate
PAIRS into duplicate CLUSTERS (one canonical doc per component).

Pairwise dedup output (minhash_dedup / ngram_jaccard_pairs) is a graph;
dropping "the higher id of each pair" under-deletes on chains (a~b, b~c:
c survives if only (b,c) is seen after b was dropped). The correct
canonicalization is: component id = min doc id reachable, keep exactly
that doc per component.

Implementation is iterative min-label propagation on DataFrames:

    labels(v) ← min(labels(v), min over neighbors u of labels(u))

repeated until no label changes. Each iteration is one join + one groupBy
(both shuffle on the node key — AQE handles skew from high-degree nodes);
``localCheckpoint`` truncates the lineage so plan size stays constant
across iterations (an unbounded iterative plan is the classic Spark
iterative-algorithm trap). Rounds needed = graph diameter; near-dup
graphs are shallow (clusters are cliques-ish), so this converges in a
handful of rounds. For adversarially long chains at 100 TB, the known
upgrade is the large-star/small-star algorithm (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14) — same primitive
ops, fewer rounds; not needed for corpus dedup workloads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
    driver_edge_threshold: int = 100_000,
) -> DataFrame:
    """(node, component) for every node appearing in ``edges``; component
    id = the minimum node id in the component. Undirected: edges are
    symmetrized internally. Raises if not converged after ``max_iter``.

    Edge sets at or below ``driver_edge_threshold`` (distinct symmetrized
    edges) take a driver union-find fast path: the VERIFIED near-dup pair
    graph is orders of magnitude smaller than the corpus that produced it,
    and each distributed propagation round costs join+groupBy+count jobs
    whose fixed latency dwarfs the work for small graphs (measured 3.6 s
    for a 238-edge graph at 32 threads). The bound mirrors Spark's own
    broadcast-join reasoning, sized honestly for PYTHON object overhead:
    collected ``Row``s cost ~100-200 bytes each and the parent dict ~100
    bytes/node, so 100k edges ≈ tens of MB of driver heap — comfortable
    at default driver sizing, where the previous 1M default could reach
    hundreds of MB. The count that guards it doubles as the cache
    materializer, so the decision adds no extra job. Above the bound the
    iterative
    min-label-propagation path runs unchanged (and
    :func:`connected_components_star` remains the adversarial-diameter
    insurance). Pass ``driver_edge_threshold=0`` to force the
    distributed path (tests do)."""
    # persisted: every propagation round joins against sym, and without the
    # persist each round would re-execute the whole upstream pair-finding
    # DAG (measured: rounds cost ~1 s, the recomputed DAG ~3-10 s EACH)
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .unionByName(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
        .persist()
    )
    if sym.count() <= driver_edge_threshold:
        import pyspark.sql.types as T

        parent: dict = {}

        def find(x):
            root = x
            while parent[root] != root:
                root = parent[root]
            while parent[x] != root:  # path compression
                parent[x], x = root, parent[x]
            return root

        for r in sym.collect():
            u, v = r["u"], r["v"]
            parent.setdefault(u, u)
            parent.setdefault(v, v)
            ru, rv = find(u), find(v)
            if ru != rv:
                parent[max(ru, rv)] = min(ru, rv)
        rows = [(n, find(n)) for n in parent]
        node_type = sym.schema["u"].dataType
        out = edges.sparkSession.createDataFrame(
            rows,
            T.StructType(
                [
                    T.StructField("node", node_type, False),
                    T.StructField("component", node_type, False),
                ]
            ),
        )
        sym.unpersist()
        return out
    labels = (
        sym.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        nbr = sym.join(labels, sym["u"] == labels["node"]).select(
            F.col("v").alias("node"), F.col("component")
        )
        # lazy checkpoint: the convergence count below is the action that
        # materializes it, so each round costs ONE job, not two
        new_labels = (
            labels.unionByName(nbr)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
            .localCheckpoint(eager=False)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            # labels are checkpointed (independent of sym's lineage), so the
            # edge cache can be released before handing the result back
            sym.unpersist()
            return labels
    raise RuntimeError(f"connected_components did not converge in {max_iter} rounds")


def connected_components_star(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 50,
) -> DataFrame:
    """Large-star/small-star connected components (Kiveris et al.,
    "Connected Components in MapReduce and Beyond", SoCC'14) — the
    adversarial-diameter upgrade promised in the module doc.

    Min-label propagation needs diameter rounds: a 10⁶-node chain means
    10⁶ shuffles. The star algorithm converges in O(log² n) rounds on ANY
    topology by rewiring the edge list itself each round:

    * large-star — per neighborhood Γ(u), connect every LARGER neighbor
      to m = min(Γ(u) ∪ {u});
    * small-star — per node u over its smaller neighbors, connect them
      (and u) to the minimum.

    Both are one window-min over a partition key + a projection — the
    same shuffle primitives as propagation, just on a shrinking edge
    list. Convergence = the (count, xxhash64-sum) signature of the edge
    list repeating, at which point the list IS the star forest
    (node → component-min). Same output contract as
    :func:`connected_components`."""
    e = (
        edges.select(
            F.col(src).cast("bigint").alias("u"), F.col(dst).cast("bigint").alias("v")
        )
        .filter(F.col("u") != F.col("v"))
        .select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )  # canonical direction u > v, the small-star input shape
        .distinct()
        .localCheckpoint()
    )

    def signature(df: DataFrame) -> tuple:
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            # 31-bit-reduced terms: a raw xxhash64 sum overflows BIGINT
            # under ANSI after two adversarial terms
            F.sum(F.pmod(F.xxhash64("u", "v"), F.lit(1 << 31))).alias("h"),
        ).first()
        return (row["n"], row["h"])

    from pyspark.sql import Window

    sig = signature(e)
    for _ in range(max_iter):
        # large-star: symmetric neighborhoods, larger neighbors re-point to
        # the neighborhood minimum. Output keeps u > v invariant (v=m ≤ u).
        sym = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        w = Window.partitionBy("u")
        ls = (
            sym.withColumn("m", F.least(F.min("v").over(w), F.col("u")))
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .distinct()
        )
        # small-star: all neighbors here are < u; point them AND u at the
        # minimum of the closed neighborhood.
        ss = ls.withColumn("m", F.least(F.min("v").over(w), F.col("u")))
        e = (
            ss.select(F.col("v").alias("u"), F.col("m").alias("v"))
            .unionByName(ss.select("u", F.col("m").alias("v")))
            .filter(F.col("u") != F.col("v"))
            .distinct()
            .localCheckpoint(eager=False)  # signature() below materializes
        )
        new_sig = signature(e)
        if new_sig == sig:
            roots = e.select(F.col("v").alias("node")).distinct().withColumn(
                "component", F.col("node")
            )
            return (
                e.select(F.col("u").alias("node"), F.col("v").alias("component"))
                .unionByName(roots)
                .distinct()
            )
        sig = new_sig
    raise RuntimeError(f"connected_components_star did not converge in {max_iter} rounds")


def dedup_clusters(
    pairs: DataFrame,
    left: str = "doc_a",
    right: str = "doc_b",
    algorithm: str = "propagation",
) -> DataFrame:
    """Near-dup pairs → (doc_id, component_id, is_canonical): the full
    transitive closure of duplication, with the lowest id of each cluster
    marked canonical (the row to keep). ``algorithm``: 'propagation'
    (min-label; rounds = diameter, the right default for cliques-ish
    near-dup graphs) or 'star' (large/small-star; O(log² n) rounds,
    the insurance path for adversarial chains)."""
    cc = connected_components_star if algorithm == "star" else connected_components
    comps = cc(pairs, src=left, dst=right)
    return comps.select(
        F.col("node").alias("doc_id"),
        F.col("component").alias("component_id"),
        (F.col("node") == F.col("component")).alias("is_canonical"),
    )


def triangle_count(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Exact triangle count of an undirected simple graph (one row:
    ``n_wedges``, ``n_triangles``).

    Degree-ordered orientation — the standard distributed formulation
    (node-iterator++ / Cohen's MapReduce algorithm): orient every edge
    from the (degree, id)-smaller endpoint to the larger, enumerate
    wedges only at each edge's SOURCE (so a node generates at most
    C(out_deg, 2) wedges, and out-degree under this orientation is
    O(sqrt(m)) for ANY degree distribution — a star graph's hub
    generates ZERO wedges instead of C(n,2)), then close wedges with a
    semi-join against the oriented edge set. Shuffles carry only id
    pairs; the wedge volume Σ C(out_deg,2) ≤ O(m^1.5) is the known
    worst-case optimum for exact counting. The approximate path at
    corpus scale is DOCT/colorful sampling — not needed while m^1.5
    fits, and exactness keeps the oracle checkable."""
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).filter(
        F.col("u") != F.col("v")
    )
    und = e.select("u", "v").union(e.select(F.col("v").alias("u"), F.col("u").alias("v"))).distinct()
    deg = und.groupBy("u").agg(F.count("*").alias("d")).select(
        F.col("u").alias("n"), "d"
    )
    # total order (degree, id) as one comparable struct
    keyed = (
        und.join(deg.withColumnRenamed("n", "u").withColumnRenamed("d", "du"), "u")
        .join(deg.withColumnRenamed("n", "v").withColumnRenamed("d", "dv"), "v")
    )
    oriented = keyed.filter(
        (F.col("du") < F.col("dv"))
        | ((F.col("du") == F.col("dv")) & (F.col("u") < F.col("v")))
    ).select("u", "v")
    w1 = oriented.select(F.col("u").alias("c"), F.col("v").alias("a"))
    w2 = oriented.select(F.col("u").alias("c"), F.col("v").alias("b"))
    wedges = w1.join(w2, "c").filter(F.col("a") < F.col("b"))
    # the closing edge (a, b) is oriented one way or the other; the
    # oriented set has each undirected edge exactly once, so check both
    closing = oriented.select("u", "v").union(
        oriented.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    tris = wedges.join(
        closing,
        (F.col("a") == F.col("u")) & (F.col("b") == F.col("v")),
        "left_semi",
    )
    n_wedges = wedges.agg(F.count("*").alias("n_wedges"))
    n_tris = tris.agg(F.count("*").alias("n_triangles"))
    return n_wedges.crossJoin(n_tris)
