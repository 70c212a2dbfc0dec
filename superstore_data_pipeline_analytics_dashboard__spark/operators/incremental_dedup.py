"""Incremental deduplication: dedup a NEW batch against an existing
corpus without rescanning the corpus — the daily-crawl shape of a
pretraining pipeline, where re-running batch dedup over 100 TB for a
1 TB increment would pay 100× the work the delta needs.

Both tiers keep a compact persisted STATE and make every per-batch job
cost ∝ |batch| + candidate pairs:

* exact tier   — state = the distinct content-fingerprint set of kept
  docs (16-byte md5 per doc). Increment: fingerprint the batch,
  collapse within-batch copies (keep lowest id), anti-join the state.
* MinHash tier — state = the kept corpus's hashed-shingle index
  (doc_id, sh — the same 8-byte inverted index the batch path builds)
  plus its LSH band table (doc_id, band, bucket). Increment: shingle +
  sign + band the batch only; cross candidates come from a band-bucket
  join of new bands against the stored band table (at rest, bucket-
  partitioned storage co-locates this join); verification joins the
  batch's shingles against the slice of stored shingles semi-joined to
  candidate old docs — never the whole store.

KEEP SEMANTICS (documented, and the one place the incremental result
can differ from a full batch re-run): a new doc is dropped when it
near-matches any ALREADY-KEPT doc, then within-batch survivors are
clustered and only each cluster's lowest id kept — the standard online
rule. A full batch re-run computes components over ALL pairs at once,
so a chain old~new1~new2 where new1 also matches old can merge clusters
the online rule keeps apart. The exact tier has no such gap: fingerprint
identity is transitive, and a test pins sequential == batch for it.

State updates are APPEND-ONLY (kept docs' fingerprints / shingles /
bands), which maps to a partition-per-batch parquet table — no
read-modify-write of corpus-scale state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions import text as T
from .dedup import (
    _bands_from_sigs,
    _signatures_from_hashed,
    hashed_shingles,
)


# ------------------------------------------------------------ exact tier


def exact_state(kept_docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Bootstrap the exact-dedup state: the DISTINCT fingerprint set of
    an already-deduplicated corpus. One narrow pass + one shuffle."""
    return (
        kept_docs.select(T.fingerprint(text_col).alias("fingerprint"))
        .distinct()
    )


def exact_increment(
    new_docs: DataFrame,
    state: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> dict:
    """Dedup ``new_docs`` against ``state`` (a fingerprint set from
    :func:`exact_state`): collapse within-batch copies to the lowest id,
    drop anything whose fingerprint is already seen. Returns
    ``{"kept": surviving rows of new_docs, "state": updated state}``;
    the state delta is exactly the kept docs' fingerprints."""
    fps = new_docs.select(
        F.col(id_col), T.fingerprint(text_col).alias("fingerprint")
    )
    batch_first = fps.groupBy("fingerprint").agg(F.min(id_col).alias(id_col))
    fresh = batch_first.join(state, "fingerprint", "left_anti")
    kept = new_docs.join(fresh.select(id_col), id_col, "left_semi")
    new_state = state.unionByName(fresh.select("fingerprint"))
    return {"kept": kept, "state": new_state}


# ---------------------------------------------------------- MinHash tier


def minhash_state(
    kept_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
) -> dict:
    """Bootstrap the near-dup state from an already-deduplicated corpus:
    ``{"shingles": (doc_id, sh), "bands": (doc_id, band, bucket)}``.
    Shingles are the verification index; bands are the candidate index.
    Both are what the batch path computes anyway — bootstrapping costs
    one batch-dedup pass, after which increments never rescan. The
    shingle index is persisted: it is both a state entry and the input
    to the band table, so unpersisted it would tokenize the corpus once
    per consumer; at-rest deployments write both entries to parquet and
    re-reads become cheap column scans."""
    sh = hashed_shingles(kept_docs, id_col, text_col, n).persist()
    sigs = _signatures_from_hashed(sh, num_hashes)
    return {
        "shingles": sh,
        "bands": _bands_from_sigs(sigs, num_hashes, bands),
    }


def minhash_increment(
    new_docs: DataFrame,
    state: dict,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
) -> dict:
    """Near-dup dedup of ``new_docs`` against ``state`` + within-batch.

    Stages (each ∝ batch size or candidate count, never corpus size):
    shingle/sign/band the batch, then ONE band-bucket join against the
    stored band table UNIONED with the batch's own (orientation
    ``new < other`` on the batch side) produces cross-corpus and
    within-batch candidates together, and ONE exact-Jaccard pass over
    (batch shingles ⋈ candidate-other shingles) verifies both kinds at
    once — the "other" shingle side is the candidate-old slice of the
    store plus the batch index, never the whole store. The previous
    two-pass form (vs-old join+verify, then a second join+verify among
    survivors) ran ~2× the stages for the same answer: 16.0 s → 11.5 s
    for the bench instance at sf0.1 (the floor is the sequential
    persist-materialize chain's fixed job latency, not data volume —
    it flattens as the batch grows), and at corpus scale one
    verification shuffle replaces two overlapping ones. Answer
    unchanged because verification is per-pair: a within pair whose
    endpoint drops against the corpus is discarded AFTER verification
    here instead of never generated, and the surviving pair set —
    what clustering sees — is identical.

    Then: drop batch docs verified against an old doc, cluster the
    surviving batch's verified pairs, keep each cluster's lowest id.
    Returns ``{"kept", "state"}`` with the state grown by the kept
    docs only. Precondition (already implied by the append-only state):
    ids are globally unique across corpus and batch.

    cand / verified are PERSISTED (sh_new / bands_new as before): each
    is re-read by 2-3 downstream branches (the old-slice semi-join, the
    drop/pair splits, the survivors' anti-joins), and without the
    persists every branch re-executes the corpus-side DAG — when the
    state is composed in memory (tests, single-session chains) that
    multiplied the whole increment ~5× (measured 40.7 s → 8.1 s at
    sf0.1 on the two-pass form). A parquet-backed state makes the
    corpus side a cheap column scan, but the candidate/verified sets
    are worth pinning in any deployment: id-pair-sized, never
    corpus-sized."""
    from .graph import dedup_clusters

    sh_new = hashed_shingles(new_docs, id_col, text_col, n).persist()
    sigs_new = _signatures_from_hashed(sh_new, num_hashes)
    bands_new = _bands_from_sigs(sigs_new, num_hashes, bands).persist()

    all_bands = (
        state["bands"]
        .select("doc_id", "band", "bucket")
        .withColumn("is_old", F.lit(True))
        .unionByName(
            bands_new.select("doc_id", "band", "bucket").withColumn(
                "is_old", F.lit(False)
            )
        )
    )
    cand = (
        bands_new.alias("a")
        .join(
            all_bands.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("b.is_old") | (F.col("a.doc_id") < F.col("b.doc_id"))),
        )
        .select(
            F.col("a.doc_id").alias("new_id"),
            F.col("b.doc_id").alias("other_id"),
            F.col("b.is_old").alias("is_old"),
        )
        .distinct()
        .persist()
    )
    # verification index slice: only candidate olds' shingles leave the
    # store; the batch's own index covers the within-batch side
    old_sh = state["shingles"].join(
        cand.filter(F.col("is_old"))
        .select(F.col("other_id").alias("doc_id"))
        .distinct(),
        "doc_id",
        "left_semi",
    )
    other_sh = old_sh.unionByName(sh_new)
    sizes_new = sh_new.groupBy("doc_id").agg(F.count("*").alias("set_size"))
    sizes_other = other_sh.groupBy("doc_id").agg(
        F.count("*").alias("set_size")
    )
    inter = (
        cand.join(
            sh_new.select(F.col("doc_id").alias("new_id"), "sh"), "new_id"
        )
        .join(
            other_sh.select(F.col("doc_id").alias("other_id"), "sh"),
            ["other_id", "sh"],
        )
        .groupBy("new_id", "other_id", "is_old")
        .agg(F.count("*").alias("n_common"))
    )
    jac = F.col("n_common") / (
        F.col("size_new") + F.col("size_other") - F.col("n_common")
    )
    verified = (
        inter.join(
            sizes_new.select(
                F.col("doc_id").alias("new_id"),
                F.col("set_size").alias("size_new"),
            ),
            "new_id",
        )
        .join(
            sizes_other.select(
                F.col("doc_id").alias("other_id"),
                F.col("set_size").alias("size_other"),
            ),
            "other_id",
        )
        .filter(jac.cast("decimal(9,6)") >= threshold)
        .select("new_id", "other_id", "is_old")
        .persist()
    )
    dropped_vs_old = (
        verified.filter(F.col("is_old"))
        .select(F.col("new_id").alias("doc_id"))
        .distinct()
    )
    # within-batch pairs among survivors: verified batch pairs whose
    # endpoints both dodged the corpus drop
    w_pairs = (
        verified.filter(~F.col("is_old"))
        .join(
            dropped_vs_old.withColumnRenamed("doc_id", "new_id"),
            "new_id",
            "left_anti",
        )
        .join(
            dropped_vs_old.withColumnRenamed("doc_id", "other_id"),
            "other_id",
            "left_anti",
        )
        .select(
            F.col("new_id").alias("doc_a"), F.col("other_id").alias("doc_b")
        )
    )
    w_losers = (
        dedup_clusters(w_pairs)
        .filter(~F.col("is_canonical"))
        .select(F.col("doc_id"))
    )

    dropped = dropped_vs_old.unionByName(w_losers)
    kept = new_docs.join(dropped, new_docs[id_col] == dropped["doc_id"], "left_anti")

    kept_ids = kept.select(F.col(id_col).alias("doc_id"))
    kept_sh = sh_new.join(kept_ids, "doc_id", "left_semi")
    kept_bands = bands_new.join(kept_ids, "doc_id", "left_semi")
    new_state = {
        "shingles": state["shingles"].unionByName(kept_sh),
        "bands": state["bands"].unionByName(kept_bands),
    }
    return {"kept": kept, "state": new_state}
