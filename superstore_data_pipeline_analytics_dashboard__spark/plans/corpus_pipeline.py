"""Training-corpus curation pipeline: the LLM-data operators composed
end-to-end, the way a 100 TB pretraining-data job would run them.

    documents
      → text statistics (tokens, chars, BPE-ish tokens, ratios)   [narrow]
      → quality + language gates                                  [narrow]
      → exact dedup (fingerprint groupBy, keep lowest id)         [1 shuffle]
      → near-dup removal (MinHash LSH → verified Jaccard pairs →
        drop the higher id of each pair)                          [bounded]
      → curated corpus + per-stage audit counts

Stage order is deliberate: cheap narrow filters first (shrink the corpus
before any shuffle), exact dedup before near-dup (exact copies would
flood the LSH bands), and near-dup last on the smallest survivor set.
Every stage is a DataFrame→DataFrame function usable standalone.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text as T
from ..operators import dedup as DD


def with_text_stats(
    docs: DataFrame, text_col: str = "text", keep_tokens: bool = False
) -> DataFrame:
    """Annotate every document with the full text-statistics block.

    Tokenization and the per-language stopword ratios are projected once
    and every stat derives from them — the one-shot forms would re-run the
    regex normalize + split ~10× per row (token count, 3 stopword ratios,
    quality's three parts, fingerprint). With ``keep_tokens`` the token
    array survives as ``__toks`` so a downstream shingle stage can skip
    its own tokenize (costs cache width ≈ the text column again — worth
    it when near-dup follows, skip it when only the stats are needed)."""
    staged = docs.select(
        "*",
        T.tokens(text_col).alias("__toks"),
        T.punct_ratio(text_col).alias("__punct"),
    ).select(
        "*",
        F.size("__toks").alias("n_tokens"),
        T.stopword_ratio_from_tokens(F.col("__toks"), T.STOPWORDS_EN).alias("__sw_en"),
        T.stopword_ratio_from_tokens(F.col("__toks"), T.STOPWORDS_DE).alias("__sw_de"),
        T.stopword_ratio_from_tokens(F.col("__toks"), T.STOPWORDS_FR).alias("__sw_fr"),
    )
    return staged.select(
        *docs.columns,
        *(["__toks"] if keep_tokens else []),
        "n_tokens",
        T.bpe_ish_token_count(text_col).alias("n_bpe_tokens"),
        T.char_count(text_col).alias("n_chars"),
        F.round(F.col("__punct"), 6).alias("punct_ratio"),
        F.round(F.col("__sw_en"), 6).alias("stopword_ratio"),
        F.round(
            T.quality_score_from_parts(
                F.col("n_tokens"), F.col("__sw_en"), F.col("__punct")
            ),
            6,
        ).alias("quality"),
        T.lang_id_from_ratios(
            F.col("__sw_en"), F.col("__sw_de"), F.col("__sw_fr")
        ).alias("lang_pred"),
        T.fingerprint(text_col).alias("fingerprint"),
    )


def quality_gate(
    annotated: DataFrame,
    min_tokens: int = 5,
    min_quality: float = 0.2,
    languages: tuple[str, ...] | None = None,
) -> DataFrame:
    """Narrow filters — run BEFORE any shuffle so the scan prunes."""
    out = annotated.filter(
        (F.col("n_tokens") >= min_tokens) & (F.col("quality") >= min_quality)
    )
    if languages:
        out = out.filter(F.col("lang_pred").isin(*languages))
    return out


def drop_exact_dups(annotated: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Keep the lowest id per content fingerprint (one hash-groupBy)."""
    from pyspark.sql import Window

    w = Window.partitionBy("fingerprint").orderBy(id_col)
    return (
        annotated.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def drop_near_dups(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    num_hashes: int = 64,
    bands: int = 16,
    tokens_col: str | None = None,
    max_df: int | None = None,
) -> DataFrame:
    """MinHash-LSH candidates → exact-Jaccard verification → connected
    components over the verified pairs → keep only each component's
    canonical (lowest-id) doc. Clustering, not pairwise drop-higher-id:
    on a chain a~b, b~c with no (a,c) pair, the pairwise rule would keep
    both a and c. num_hashes/bands trade signature cost against the LSH
    S-curve — (64, 16) targets ~0.5 Jaccard, (32, 8) halves signature
    work for the same band width. ``max_df`` (recommended at corpus
    scale) drops boilerplate shingles before signatures — see
    ``dedup.max_df_filter``."""
    from ..operators.graph import dedup_clusters

    pairs = DD.minhash_dedup(
        docs, id_col, text_col, n=n, threshold=threshold,
        num_hashes=num_hashes, bands=bands, tokens_col=tokens_col,
        max_df=max_df,
    )
    losers = (
        dedup_clusters(pairs.select("doc_a", "doc_b"))
        .filter(~F.col("is_canonical"))
        .select(F.col("doc_id").alias(id_col))
    )
    return docs.join(losers, id_col, "left_anti")


def curate(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 5,
    min_quality: float = 0.2,
    languages: tuple[str, ...] | None = None,
    near_dup_threshold: float = 0.5,
    num_hashes: int = 64,
    bands: int = 16,
    max_df: int | None = None,
) -> dict[str, DataFrame]:
    """Full curation run. Returns the curated corpus plus an audit frame
    of per-stage row counts (the qa.LoadIssues idea applied to corpus
    curation)."""
    from ..operators.dedup import _parallelize

    # NOT threading tokens into the shingle stage, deliberately: keeping
    # __toks through the exact-dedup window makes every shuffle row carry
    # the token array, and the measured cost (19.9 s vs 11.5 s at sf0.1)
    # dwarfs the one regex tokenize it saves. Re-tokenizing the (smaller,
    # post-dedup) survivor set is the cheaper side of the trade — use
    # `tokens_col` only when no shuffle sits between tokenize and shingle.
    annotated = with_text_stats(_parallelize(docs), text_col).cache()
    gated = quality_gate(annotated, min_tokens, min_quality, languages)
    exact = drop_exact_dups(gated, id_col).cache()
    # cached BEFORE counting: the LSH near-dup DAG is the expensive stage
    # and callers will act on `curated` again — without the cache the
    # audit count would execute the whole pipeline twice
    curated = drop_near_dups(
        exact, id_col, text_col, threshold=near_dup_threshold,
        num_hashes=num_hashes, bands=bands, max_df=max_df,
    ).cache()

    spark = docs.sparkSession
    # ONE tagged action computes all four audit counts — they were four
    # driver-sequenced count() jobs (r14 job-count fold; the caches
    # still materialize inside this action, in dependency order, so
    # later consumers of `curated` hit them exactly as before)
    stages = [
        ("input", docs),
        ("after_quality_gate", gated),
        ("after_exact_dedup", exact),
        ("after_near_dedup", curated),
    ]
    tagged = None
    for name, frame in stages:
        one = frame.agg(F.count(F.lit(1)).alias("n_docs")).select(
            F.lit(name).alias("stage"), F.col("n_docs").cast("long")
        )
        tagged = one if tagged is None else tagged.unionByName(one)
    counts = {r["stage"]: int(r["n_docs"]) for r in tagged.collect()}
    audit = spark.createDataFrame(
        [(name, counts[name]) for name, _ in stages],
        "stage STRING, n_docs BIGINT",
    )
    return {"annotated": annotated, "curated": curated, "audit": audit}
