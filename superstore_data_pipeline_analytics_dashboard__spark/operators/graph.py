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

from . import checkpoint as _ckpt


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
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 1,
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
    :func:`connected_components`.

    Restartability (``checkpoint_dir``, round 8): the per-round state IS
    the rewired edge list (canonical u > v, a SET — every round is a
    pure function of it, so content is partition-order-independent even
    though row order is not). When set, the list is persisted every
    ``checkpoint_every`` rounds via :mod:`operators.checkpoint` and a
    rerun resumes from the newest complete checkpoint with a FRESH
    ``max_iter`` budget (rounds here are convergence-driven, not a
    target count — so a run that RAISES on budget exhaustion is now
    recoverable: resume and keep converging, tested). The convergence
    signature is recomputed from the loaded list, which is exactly the
    value the interrupted run held. Checkpoint cost: one linear write of
    the current (shrinking) edge list — the thing you cannot afford to
    recompute O(log² n) rounds of on a 100 TB graph."""
    spark = edges.sparkSession
    ckpt_meta = {"op": "connected_components_star"}
    start = 0
    if checkpoint_dir is not None:
        done = _ckpt.latest_iteration(spark, checkpoint_dir)
        if done is not None:
            start = done
            e = _ckpt.load_state(
                spark, checkpoint_dir, done, ckpt_meta
            ).localCheckpoint()
    if start == 0:
        e = (
            edges.select(
                F.col(src).cast("bigint").alias("u"),
                F.col(dst).cast("bigint").alias("v"),
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
    for it in range(start + 1, start + max_iter + 1):
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
        if checkpoint_dir is not None and it % checkpoint_every == 0:
            _ckpt.save_state(e, checkpoint_dir, it, ckpt_meta)
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
    # persisted: `und` feeds both the degree count and the orientation
    # join, and `oriented` feeds both wedge sides plus the closing-edge
    # set — without the persists each consumer re-expands the ENTIRE
    # upstream edge-producing pipeline (q88's input is the whole
    # co-purchase pair generation: 228 Exchanges in the unpersisted
    # plan, recomputed ~4x)
    und = (
        e.select("u", "v")
        .union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .distinct()
        .persist()
    )
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
    ).select("u", "v").persist()
    w1 = oriented.select(F.col("u").alias("c"), F.col("v").alias("a"))
    w2 = oriented.select(F.col("u").alias("c"), F.col("v").alias("b"))
    wedges = w1.join(w2, "c").filter(F.col("a") < F.col("b"))
    # the closing edge (a, b) is oriented one way or the other; the
    # oriented set has each undirected edge exactly once, so check both —
    # and the (u, v) pairs stay UNIQUE, so the left join below cannot
    # multiply wedge rows and count(hit) is exactly the triangle count.
    # One pass over the wedge stream computes both counts (the former
    # left_semi + two counts + crossJoin shape ran the wedge join twice).
    closing = (
        oriented.select("u", "v")
        .union(oriented.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .withColumn("__hit", F.lit(1))
    )
    return wedges.join(
        closing,
        (F.col("a") == F.col("u")) & (F.col("b") == F.col("v")),
        "left",
    ).agg(
        F.count("*").alias("n_wedges"),
        F.count("__hit").alias("n_triangles"),
    )


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 3,
    damping: float = 0.85,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 1,
) -> DataFrame:
    """PageRank over a DIRECTED edge list — (node, rank) for every node
    with at least one in- or out-edge. Callers with an undirected graph
    (copurchase, near-dup) symmetrize before calling.

    Classic power iteration as DataFrames: each round is ONE join of the
    node-sized rank table against the edge list on ``src`` (ranks fan
    out along out-edges) and ONE groupBy on ``dst`` (contributions sum
    at the receiver) — the canonical Pregel-on-shuffle formulation.
    Nothing ever materializes on the driver; edges are persisted once
    and every round reuses the cache; the rank tables chain through lazy
    ``localCheckpoint``s so lineage stays bounded across rounds (the
    iterative-lineage trap, same fix as :func:`connected_components`).

    Numeric determinism (the cross-engine-hash contract): FIXED-POINT.
    Rank state is a BIGINT in 1e-12 units and every iteration step is
    exact integer arithmetic — contribution = ``rank_u div outdeg``
    (truncating; all values positive, so Spark ``div`` == DuckDB ``//``),
    damping as the rational ``· num div den`` (85/100), reset mass a
    constant integer. Integer ops have ONE answer on any engine, so the
    unrolled SQL oracle matches bit-for-bit. The first cut used
    DECIMAL(20,12) state with double division re-cast to decimal each
    round (the q103 boundary pattern) and FAILED parity by ~1e-12: the
    double→decimal cast rounds off the double's SHORTEST DECIMAL REPR in
    Spark (BigDecimal.valueOf) but off the BINARY value in DuckDB, and
    with hundreds of casts per iteration the tie cases surface. Fixed
    point never converts binary→decimal, so the hazard class is gone.
    The ~1e-12 truncation bias per step is irrelevant for a centrality
    score. Only the final export divides: ``rank_u / 1e12`` in IEEE
    double — both operands exactly representable (rank_u < 2^53), one
    correctly-rounded op, bit-identical. Headroom: the damping multiply
    ``s·85`` needs s < 2^63/85 ≈ 1.1e17 micro-units ≈ 1e5 aggregate
    in-rank — fine for any graph whose max in-degree·avg-rank < 1e5;
    beyond that, drop SCALE to 1e9.

    Simplifications, documented: uniform init rank = 1 (not 1/N — the
    result is a relative centrality score; dividing by N rescales every
    rank identically), and dangling-node mass is dropped rather than
    redistributed (a node with no in-edges settles at ``1 - damping``).
    Both match the common "lightweight PageRank" used for corpus/link
    quality signals, and both keep the oracle exactly expressible.

    At 100 TB: the rank table is node-sized, edges dominate. Pre-
    partitioning edges by ``src`` makes the per-round join co-located
    (one-time shuffle amortized over all rounds); high in-degree hubs
    are plain aggregation skew, which AQE splits. Rounds are O(diameter)
    for convergence but fixed ``iters`` is the corpus-signal norm.

    Restartability (``checkpoint_dir``, round 8): when set, the
    node-sized ``rank_u`` table is persisted every ``checkpoint_every``
    rounds via :mod:`operators.checkpoint` (versioned dirs + ``_SUCCESS``
    commit markers + a stamped damping guard), and a rerun of the same
    call resumes from the newest complete checkpoint at or below its
    own ``iters``. State is exact BIGINT fixed point and each round is
    a pure function of (ranks, edges), so resumed output is
    BIT-IDENTICAL to an uninterrupted run (pinned in
    tests/test_checkpoint.py). After each save the loop RELOADS ranks
    from the written files — the continued run provably consumes the
    persisted state, and lineage truncates to the files across the
    process boundary (edges themselves are input, never checkpointed).
    """
    SCALE = 10**12
    num = round(damping * 100)  # damping as the exact rational num/100
    reset_u = (100 - num) * (SCALE // 100)
    spark = edges.sparkSession
    ckpt_meta = {"op": "pagerank", "damping_num": num, "scale": SCALE}
    start = 0
    if checkpoint_dir is not None:
        done = _ckpt.latest_iteration(spark, checkpoint_dir, at_most=iters)
        if done is not None:
            start = done
            ranks = _ckpt.load_state(spark, checkpoint_dir, done, ckpt_meta)
            if done == iters:
                # complete run already on disk: a no-op resume must not
                # pay the edge scan — nodes/outdeg exist only for the
                # loop, and the loop will not run
                return ranks.select(
                    "node",
                    (F.col("rank_u").cast("double") / F.lit(float(SCALE))).alias(
                        "rank"
                    ),
                )
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).persist()
    outdeg = e.groupBy("src").agg(F.count("*").alias("outdeg"))
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    if start == 0:
        ranks = nodes.select("node", F.lit(SCALE).alias("rank_u"))
    for it in range(start + 1, iters + 1):
        contrib = (
            e.join(ranks.withColumnRenamed("node", "src"), "src")
            .join(outdeg, "src")
            .select(
                F.col("dst").alias("node"),
                F.expr("rank_u div outdeg").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("s"))
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                (
                    F.lit(reset_u)
                    + F.coalesce(
                        F.expr(f"(s * {num}) div 100"), F.lit(0)
                    )
                ).alias("rank_u"),
            )
            .localCheckpoint(eager=False)
        )
        if checkpoint_dir is not None and (
            it % checkpoint_every == 0 or it == iters
        ):
            _ckpt.save_state(ranks, checkpoint_dir, it, ckpt_meta)
            ranks = _ckpt.load_state(spark, checkpoint_dir, it, ckpt_meta)
    out = ranks.select(
        "node",
        (F.col("rank_u").cast("double") / F.lit(float(SCALE))).alias("rank"),
    )
    out.count()  # materialize the final checkpoint before releasing edges
    e.unpersist()
    return out
