"""Product quantization (PQ) ANN — the memory-bound scale path.

IVF (similarity.knn_ivf) prunes WHICH vectors a query scores;
PQ compresses HOW each vector is scored: d float components become
m 4-bit codebook ids (here 64 dims → 8 codes → one packed bigint), and
a query scores a candidate with m table lookups + adds instead of d
multiplies. This is the layout every billion-vector ANN service uses
(IVF-PQ): at 100 TB the code table is ~1/32 the raw embedding bytes
and scan-scored without touching the vectors. Reference scope: the
reference ships no ANN operator; q25/q28/q136 built the exact/IVF/
recall tiers, this adds the compressed-codes tier.

Exactness contract (the clustering.py discipline): ALL geometry runs
on the int8-quantized grid (quantize_embeddings), so subspace Lloyd
training, code assignment, ADC lookup tables, and the exact reference
distances are INTEGER arithmetic — order-independent, engine-portable,
deterministic run-to-run (seeds = the m subvectors of the k lowest
ids; arg-min ties break on lowest code id). A float PQ would
hash-diverge on summation order; integer PQ cannot.

Scale shape (N vectors, m subspaces, k codes, d dims):
* training: per iteration ONE narrow assignment pass over the N·m
  subvector rows (fold against a one-row broadcast codebook — the
  measured-right call from clustering.py vs plan literals) and one
  (m·k·d/m)-key partial-aggregated update; driver traffic m·k·(d/m)
  longs per iteration (= one codebook, kilobytes).
* encode: the final assignment pass + a per-vector groupBy packing
  m codes into one bigint.
* ADC search: |Q| lookup tables of m·k ints are computed driver-side
  from the |Q| collected query rows (bounded by the eval set — the
  documented dimension-sized collect) and broadcast; scoring is a
  narrow fold per (vector, query), then a per-query top-k window.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .clustering import quantize_embeddings

__all__ = ["pq_train_encode", "pq_adc_recall", "ivf_pq_recall"]

_CB_SCHEMA = (
    "cb array<array<struct<cid: int, c: array<bigint>, nc: bigint>>>"
)


def _sq(v: list[int]) -> int:
    return sum(x * x for x in v)


def _subvectors(quant: DataFrame, m: int, dsub: int) -> DataFrame:
    """(vec_id, j, sq, nsq): the N·m subvector rows."""
    slices = F.array(
        *[F.slice("q", j * dsub + 1, dsub) for j in range(m)]
    )
    sub = quant.select(
        "vec_id", F.posexplode(slices).alias("j", "sq")
    )
    nsq = F.aggregate(
        F.transform("sq", lambda a: a * a),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return sub.withColumn("nsq", nsq)


def _assign_codes(
    sub: DataFrame, codebooks: list[list[tuple[int, list[int], int]]]
) -> DataFrame:
    """Narrow arg-min of each subvector against ITS subspace's codes.

    The codebook travels as a one-row broadcast DataFrame (array
    indexed by subspace), never as plan literals — clustering.py
    measured ~1 s/iteration of Catalyst re-analysis for the literal
    form."""
    spark = sub.sparkSession
    payload = [
        [(cid, c, nc) for cid, c, nc in book] for book in codebooks
    ]
    cdf = spark.createDataFrame([(payload,)], _CB_SCHEMA)

    def dist(s: Column) -> Column:
        dot = F.aggregate(
            F.zip_with(F.col("sq"), s["c"], lambda a, b: a * b),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        return F.col("nsq") + s["nc"] - F.lit(2).cast("long") * dot

    cand = F.element_at(F.col("cb"), F.col("j") + 1)
    best = F.array_min(
        F.transform(
            cand, lambda s: F.struct(dist(s).alias("dist"), s["cid"].alias("cid"))
        )
    )
    return (
        sub.crossJoin(F.broadcast(cdf))
        .withColumn("__b", best)
        .select(
            "vec_id",
            "j",
            "sq",
            "nsq",
            F.col("__b.cid").alias("cid"),
        )
    )


def pq_train_encode(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    k: int = 16,
    iters: int = 3,
) -> tuple[DataFrame, list[list[tuple[int, list[int], int]]], DataFrame]:
    """Train m per-subspace codebooks (integer Lloyd, k codes each),
    encode every vector. Returns (codes, codebooks, quant):

    * codes: (vec_id, codes array<int>[m], pq_code bigint) — pq_code
      packs the m codes base-k, so the whole encoding is one
      hash-comparable integer;
    * codebooks: python list[j][(cid, subvector, sq_norm)];
    * quant: the persisted int8 quantization (callers running an
      exact reference tier reuse it; they own the unpersist).
    """
    d = len(emb.select(vec_col).first()[0])
    dsub = d // m
    quant = quantize_embeddings(
        emb.select(F.col(id_col).alias("vec_id"), vec_col), vec_col
    ).persist()
    sub = _subvectors(quant, m, dsub).persist()

    seed_rows = (
        sub.filter(
            F.col("vec_id").isin(
                [r["vec_id"] for r in quant.select("vec_id").orderBy("vec_id").limit(k).collect()]
            )
        )
        .orderBy("j", "vec_id")
        .collect()
    )
    codebooks: list[list[tuple[int, list[int], int]]] = []
    for j in range(m):
        rows_j = [r for r in seed_rows if r["j"] == j]
        codebooks.append(
            [(i, list(r["sq"]), _sq(list(r["sq"]))) for i, r in enumerate(rows_j)]
        )

    for _ in range(iters):
        assigned = _assign_codes(sub, codebooks)
        sums = (
            assigned.select("j", "cid", F.posexplode("sq").alias("dim", "v"))
            .groupBy("j", "cid", "dim")
            .agg(F.sum("v").alias("s"), F.count("*").alias("n"))
        )
        rows = (
            sums.select(
                "j",
                "cid",
                "dim",
                F.floor(F.col("s") / F.col("n")).alias("cv"),
            )
            .groupBy("j", "cid")
            .agg(
                F.array_sort(F.collect_list(F.struct("dim", "cv"))).alias("__dc")
            )
            .select(
                "j",
                "cid",
                F.transform("__dc", lambda s: s["cv"]).alias("c"),
            )
            .collect()
        )
        # cids are renumbered DENSELY (cid = list position, ordered by the
        # previous cid) on every rebuild: a Lloyd update can drop an empty
        # cluster (guaranteed when two seed subvectors are identical —
        # arg-min ties all go to the lower cid), and the ADC lookup tables
        # index `element_at(row, cid + 1)` by LIST POSITION — a sparse cid
        # would read the wrong entry or throw out-of-range under ANSI.
        # Lloyd needs no cid identity across iterations, so for the
        # no-drop case the renumbering is the identity map.
        codebooks = [[] for _ in range(m)]
        for r in sorted(rows, key=lambda r: (r["j"], r["cid"])):
            c = list(r["c"])
            codebooks[r["j"]].append((len(codebooks[r["j"]]), c, _sq(c)))

    final = _assign_codes(sub, codebooks)
    packed = (
        final.groupBy("vec_id")
        .agg(
            F.array_sort(F.collect_list(F.struct("j", "cid"))).alias("__jc")
        )
        .select(
            "vec_id",
            F.transform("__jc", lambda s: s["cid"].cast("int")).alias("codes"),
        )
        .withColumn(
            "pq_code",
            F.aggregate(
                F.col("codes"),
                F.lit(0).cast("bigint"),
                lambda acc, c: acc * k + c.cast("bigint"),
            ),
        )
    )
    sub.unpersist()
    return packed, codebooks, quant


def _adc_tables(
    qrows, codebooks: list[list[tuple[int, list[int], int]]], m: int, dsub: int
) -> list[tuple[int, list[list[int]]]]:
    """Per-query ADC lookup tables (m·k exact integer distances from the
    query's subvectors to every codebook entry), computed driver-side
    from the |Q| collected query rows."""
    tables = []
    for r in qrows:
        qv = list(r["q"])
        tbl = []
        for j in range(m):
            sq = qv[j * dsub : (j + 1) * dsub]
            nsq = _sq(sq)
            tbl.append(
                [
                    nsq + nc - 2 * sum(a * b for a, b in zip(sq, c))
                    for _, c, nc in codebooks[j]
                ]
            )
        tables.append((int(r["vec_id"]), tbl))
    return tables


def _exact_int_top(
    quant: DataFrame, qrows, k_top: int
) -> DataFrame:
    """Exact integer reference tier, shared by both recall evals (the
    two copies had drifted into verbatim duplicates — ADVICE r13): the
    |Q|-row broadcast query frame (r13 restructure), the zip_with fold
    dot, the squared-L2 distance on the int8 grid, and the per-query
    top-``k_top`` window with the lowest-vec_id tie-break."""
    spark = quant.sparkSession
    qvec = spark.createDataFrame(
        [(int(r["vec_id"]), list(r["q"]), int(r["nq"])) for r in qrows],
        "qid BIGINT, qq ARRAY<BIGINT>, qnq BIGINT",
    )
    qdot = F.aggregate(
        F.zip_with(F.col("q"), F.col("qq"), lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    exact = (
        quant.crossJoin(F.broadcast(qvec))
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            "vec_id",
            "qid",
            (
                F.col("nq")
                + F.col("qnq")
                - F.lit(2).cast("long") * qdot
            ).alias("dist"),
        )
    )
    we = Window.partitionBy("qid").orderBy(F.asc("dist"), F.asc("vec_id"))
    return exact.withColumn("rnk", F.row_number().over(we)).filter(
        F.col("rnk") <= k_top
    )


def pq_adc_recall(
    emb: DataFrame,
    query_pred: Column,
    m: int = 8,
    k: int = 16,
    iters: int = 3,
    k_top: int = 10,
) -> DataFrame:
    """End-to-end PQ eval: train+encode, ADC top-k for the query rows
    selected by ``query_pred``, recall vs the EXACT integer tier on
    the same grid. Returns one row per query:
    (query_id, adc_best, exact_best, n_overlap, recall).

    The |Q| lookup tables (m·k ints each) are computed driver-side
    from the collected query subvectors — bounded by the eval set,
    the same documented collect class as IVF's centroid seeds."""
    codes, codebooks, quant = pq_train_encode(emb, m=m, k=k, iters=iters)
    spark = emb.sparkSession
    # subvector width from the trained codebooks — re-probing it via
    # quant.select("q").first() was one redundant cached-scan job (r14)
    dsub = len(codebooks[0][0][1])

    qrows = quant.filter(query_pred).select("vec_id", "q", "nq").collect()
    # ADC scoring keeps the one-row array-of-structs + explode shape
    # DELIBERATELY (r13 A/B): a |Q|-row broadcast join was probed and
    # regressed ~20% — its join output materializes the m·k-long lookup
    # table per (vector, query) row, where this form computes `est`
    # inside the transform and explodes only (qid, est).
    tables = _adc_tables(qrows, codebooks, m, dsub)
    tdf = spark.createDataFrame(
        [(tables,)],
        "qt array<struct<qid: bigint, tbl: array<array<bigint>>>>",
    )
    scored = codes.crossJoin(F.broadcast(tdf)).select(
        "vec_id",
        F.explode(
            F.transform(
                "qt",
                lambda s: F.struct(
                    s["qid"].alias("qid"),
                    F.aggregate(
                        F.zip_with(
                            F.col("codes"),
                            s["tbl"],
                            lambda c, row: F.element_at(row, c + 1),
                        ),
                        F.lit(0).cast("bigint"),
                        lambda acc, x: acc + x,
                    ).alias("est"),
                ),
            )
        ).alias("s"),
    ).select("vec_id", F.col("s.qid").alias("qid"), F.col("s.est").alias("est"))
    scored = scored.filter(F.col("vec_id") != F.col("qid"))
    w = Window.partitionBy("qid").orderBy(F.asc("est"), F.asc("vec_id"))
    adc_top = scored.withColumn("rnk", F.row_number().over(w)).filter(
        F.col("rnk") <= k_top
    )

    # exact tier on the SAME int8 grid: integer distances, same ties —
    # r13 restructure (|Q|-row broadcast frame + zip_with fold dot; rows
    # and integer values identical to the exploded form)
    exact_top = _exact_int_top(quant, qrows, k_top)

    overlap = (
        adc_top.select("qid", "vec_id")
        .join(exact_top.select("qid", "vec_id"), ["qid", "vec_id"])
        .groupBy("qid")
        .agg(F.count("*").alias("n_overlap"))
    )
    bests = (
        adc_top.filter(F.col("rnk") == 1)
        .select("qid", F.col("vec_id").alias("adc_best"))
        .join(
            exact_top.filter(F.col("rnk") == 1).select(
                "qid", F.col("vec_id").alias("exact_best")
            ),
            "qid",
        )
    )
    # returned LAZY as one plan (r14, VERDICT r13 item 8): the old
    # collect + createDataFrame round-trip hid the whole eval behind a
    # `Scan ExistingRDD` final plan, so the census could not see it.
    # `quant` stays persisted (one-shot driver semantics — the repo's
    # standing persist rule; the caller's single action reads it once,
    # and unpersisting here would let a lazy consumer retrain from
    # scratch). Values identical: same plan, same integer arithmetic.
    return (
        bests.join(overlap, "qid", "left")
        .withColumn("n_overlap", F.coalesce("n_overlap", F.lit(0)))
        .select(
            F.col("qid").alias("query_id"),
            "adc_best",
            "exact_best",
            F.col("n_overlap").cast("bigint").alias("n_overlap"),
            (F.col("n_overlap").cast("double") / F.lit(float(k_top))).alias(
                "recall"
            ),
        )
    )


def ivf_pq_recall(
    emb: DataFrame,
    query_pred: Column,
    n_cells: int = 16,
    nprobe: int = 4,
    m: int = 8,
    k: int = 16,
    iters: int = 2,
    k_top: int = 10,
) -> DataFrame:
    """IVF-PQ — the composed billion-scale ANN layout: IVF prunes WHICH
    vectors a query scores (probe ``nprobe`` of ``n_cells`` cells), PQ
    compresses HOW each survivor is scored (m table lookups on the
    packed codes). Search cost ≈ (nprobe/n_cells) · N code-scored rows
    per query, and n_scored is REPORTED per query so the pruning claim
    is visible in the output, next to recall vs the exact integer tier
    over the FULL corpus (recall pays for pruning twice: a missed cell
    loses its neighbors entirely — the q136 IVF position, compounded by
    code quantization).

    Shapes: cells route on float L2 against the deterministic lowest-id
    seed centroids (similarity.ivf_assign — at rest the codes table is
    partitioned by cell so probes prune partitions); the |Q| ADC tables
    and |Q|·nprobe probe pairs travel as broadcast DataFrames; scoring
    joins codes⋈probes on cell — the only wide op, sized by the pruned
    candidate set."""
    from .similarity import ivf_assign, seed_centroids

    spark = emb.sparkSession
    codes, codebooks, quant = pq_train_encode(emb, m=m, k=k, iters=iters)
    # subvector width from the trained codebooks (r14, same as
    # pq_adc_recall: drops one redundant cached-scan job)
    dsub = len(codebooks[0][0][1])

    cents = seed_centroids(emb, n_cells)
    cells = ivf_assign(emb, cents).select("vec_id", "cell")
    coded = codes.join(cells, "vec_id")

    qrows = quant.filter(query_pred).select("vec_id", "q", "nq").collect()
    tdf = spark.createDataFrame(
        _adc_tables(qrows, codebooks, m, dsub),
        "qid BIGINT, tbl ARRAY<ARRAY<BIGINT>>",
    )

    qe = emb.filter(query_pred).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("__qvec")
    )
    from ..functions import vectors as V

    qd = V.squared_l2(
        F.col("__qvec").cast("array<double>"),
        F.col("embedding").cast("array<double>"),
    )
    wq = Window.partitionBy("qid").orderBy(F.asc("__qdist"), F.asc("centroid_id"))
    probes = (
        qe.crossJoin(F.broadcast(cents))
        .select("qid", "centroid_id", qd.alias("__qdist"))
        .withColumn("__rn", F.row_number().over(wq))
        .filter(F.col("__rn") <= nprobe)
        .select("qid", F.col("centroid_id").alias("cell"))
    )

    cand = coded.join(F.broadcast(probes), "cell").filter(
        F.col("vec_id") != F.col("qid")
    )
    est = F.aggregate(
        F.zip_with(
            F.col("codes"),
            F.col("tbl"),
            lambda c, row: F.element_at(row, c + 1),
        ),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    scored = cand.join(F.broadcast(tdf), "qid").select(
        "qid", "vec_id", est.alias("est")
    )
    w = Window.partitionBy("qid").orderBy(F.asc("est"), F.asc("vec_id"))
    adc_top = scored.withColumn("rnk", F.row_number().over(w)).filter(
        F.col("rnk") <= k_top
    )
    n_scored = scored.groupBy("qid").agg(
        F.count("*").cast("bigint").alias("n_scored")
    )

    # exact integer tier over the FULL corpus (same grid, same ties) —
    # r13 restructure: |Q|-row broadcast frame + zip_with fold dot; rows
    # and integer values identical to the exploded form
    exact_top = _exact_int_top(quant, qrows, k_top)

    overlap = (
        adc_top.select("qid", "vec_id")
        .join(exact_top.select("qid", "vec_id"), ["qid", "vec_id"])
        .groupBy("qid")
        .agg(F.count("*").alias("n_overlap"))
    )
    bests = (
        adc_top.filter(F.col("rnk") == 1)
        .select("qid", F.col("vec_id").alias("adc_best"))
        .join(
            exact_top.filter(F.col("rnk") == 1).select(
                "qid", F.col("vec_id").alias("exact_best")
            ),
            "qid",
        )
    )
    # returned LAZY as one plan (r14, VERDICT r13 item 8) — same
    # rationale as pq_adc_recall: the census sees the real tree, quant
    # stays persisted under the one-shot persist rule
    return (
        bests.join(n_scored, "qid")
        .join(overlap, "qid", "left")
        .withColumn("n_overlap", F.coalesce("n_overlap", F.lit(0)))
        .select(
            F.col("qid").alias("query_id"),
            "n_scored",
            "adc_best",
            "exact_best",
            F.col("n_overlap").cast("bigint").alias("n_overlap"),
            (F.col("n_overlap").cast("double") / F.lit(float(k_top))).alias(
                "recall"
            ),
        )
    )
