"""End-to-end corpus curation: stages compose, counts are monotone,
dups actually leave, survivors keep canonical ids."""

from pyspark.sql import functions as F

from superstore_data_pipeline_analytics_dashboard__spark.plans import corpus_pipeline as C
from tests.conftest import SF_SMOKE


def _docs(spark):
    base = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    # plant one exact dup and one near dup of doc 0
    d0 = base.filter(F.col("doc_id") == 0).first()
    extra = spark.createDataFrame(
        [
            (100001, d0["text"], d0["lang"], d0["source"], d0["n_chars"]),
            (100002, d0["text"] + " extra tail words here", d0["lang"],
             d0["source"], d0["n_chars"] + 22),
        ],
        base.schema,
    )
    return base.unionByName(extra)


def test_curate_end_to_end(spark):
    docs = _docs(spark)
    out = C.curate(docs, min_tokens=3, min_quality=0.0, near_dup_threshold=0.5)
    audit = {r["stage"]: r["n_docs"] for r in out["audit"].collect()}
    assert audit["input"] == 502
    # monotone shrinkage
    assert (
        audit["input"] >= audit["after_quality_gate"]
        >= audit["after_exact_dedup"] >= audit["after_near_dedup"]
    )
    # the planted exact dup must be gone, canonical id 0 kept
    ids = {r["doc_id"] for r in out["curated"].select("doc_id").collect()}
    assert 0 in ids and 100001 not in ids
    # the planted near dup must be gone too
    assert 100002 not in ids
    assert audit["after_exact_dedup"] - audit["after_near_dedup"] >= 1


def test_annotated_has_full_stats_block(spark):
    out = C.with_text_stats(spark.read.parquet(f"{SF_SMOKE}/documents.parquet"))
    for col in ("n_tokens", "n_bpe_tokens", "n_chars", "punct_ratio",
                "stopword_ratio", "quality", "lang_pred", "fingerprint"):
        assert col in out.columns
    row = out.first()
    assert row["n_tokens"] > 0 and 0.0 <= row["quality"] <= 1.0


def test_language_gate(spark):
    docs = spark.createDataFrame(
        [(1, "the cat is on the mat and it is fine", "en", "s", 1),
         (2, "der hund und die katze im haus und so", "de", "s", 1)],
        "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT",
    )
    out = C.quality_gate(C.with_text_stats(docs), min_tokens=1,
                         min_quality=0.0, languages=("en",))
    assert [r["doc_id"] for r in out.collect()] == [1]
