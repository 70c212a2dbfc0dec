"""Text-analysis expression tests (functions.text): tokenization,
shingles, ratios, language ID, quality, fingerprints."""

from pyspark.sql import functions as F

from superstore_data_pipeline_analytics_dashboard__spark.functions import text as T


def _one(spark, text, col):
    return spark.createDataFrame([(text,)], ["text"]).select(col.alias("v")).first()["v"]


def test_normalize_collapses_whitespace_and_case(spark):
    assert _one(spark, "  Hello\t WORLD  \n", T.normalize("text")) == "hello world"


def test_tokens_no_empty_strings(spark):
    got = _one(spark, "  a  b   c ", T.tokens("text"))
    assert got == ["a", "b", "c"]


def test_tokens_empty_doc_yields_empty_array(spark):
    """ADVICE r1: an empty/whitespace-only doc must tokenize to [], not
    [""] — otherwise token_count=1 skews quality and every empty doc
    shares one "" shingle, inflating LSH candidate pairs."""
    assert _one(spark, "", T.tokens("text")) == []
    assert _one(spark, "   \t\n ", T.tokens("text")) == []
    assert _one(spark, "", T.token_count("text")) == 0
    # quality score of an empty doc: len 0, sw 0, punct 0 → 0.2 from the
    # punct-penalty term only
    q = _one(spark, "", T.quality_score("text"))
    assert abs(q - 0.2) < 1e-12


def test_word_shingles(spark):
    got = _one(spark, "a b c d", T.word_shingles("text", 3))
    assert got == ["a b c", "b c d"]


def test_word_shingles_short_doc_whole_doc(spark):
    assert _one(spark, "a b", T.word_shingles("text", 3)) == ["a b"]


def test_token_and_char_count(spark):
    assert _one(spark, "one two three", T.token_count("text")) == 3
    assert _one(spark, "abc", T.char_count("text")) == 3


def test_punct_ratio(spark):
    assert _one(spark, "ab!?", T.punct_ratio("text")) == 0.5
    assert _one(spark, "abcd", T.punct_ratio("text")) == 0.0


def test_stopword_ratio(spark):
    assert _one(spark, "the cat and the dog", T.stopword_ratio("text")) == 0.6


def test_lang_id_votes(spark):
    assert _one(spark, "the cat is on the mat", T.lang_id("text")) == "en"
    assert _one(spark, "der hund und die katze im haus", T.lang_id("text")) == "de"
    assert _one(spark, "le chat est dans la maison", T.lang_id("text")) == "fr"
    assert _one(spark, "xyzzy plugh zork", T.lang_id("text")) == "und"


def test_quality_score_orders_sensibly(spark):
    good = "the quick brown fox jumps over the lazy dog and runs away " * 3
    bad = "!!! ??? ### $$$ %%%"
    df = spark.createDataFrame([(1, good), (2, bad)], ["id", "text"]).select(
        "id", T.quality_score("text").alias("q")
    )
    got = {r["id"]: r["q"] for r in df.collect()}
    assert got[1] > got[2]
    assert 0.0 <= got[2] <= got[1] <= 1.0


def test_fingerprint_stable_under_formatting(spark):
    df = spark.createDataFrame(
        [("Hello   World",), ("hello world",), ("HELLO\tWORLD",), ("other",)], ["text"]
    ).select(T.fingerprint("text").alias("f"))
    fps = [r["f"] for r in df.collect()]
    assert fps[0] == fps[1] == fps[2] != fps[3]


def test_dup_ngram_frac_counts_repeats(spark):
    """'a b a b a b' trigrams = [aba, bab, aba, bab]: 4 total, 2 distinct
    -> duplicate fraction 0.5; an all-unique doc scores 0."""
    rep = _one(spark, "a b a b a b", T.dup_ngram_frac(T.word_shingles("text", 3)))
    uniq = _one(spark, "a b c d e f", T.dup_ngram_frac(T.word_shingles("text", 3)))
    assert abs(rep - 0.5) < 1e-12
    assert uniq == 0.0


def test_top_ngram_count_longest_run(spark):
    """'a b a b a b' bigrams = [ab, ba, ab, ba, ab] -> most frequent
    bigram occurs 3 times; single-token and empty docs (whole-doc
    fallback shingle) score 1."""
    assert _one(spark, "a b a b a b", T.top_ngram_count(T.word_shingles("text", 2))) == 3
    assert _one(spark, "solo", T.top_ngram_count(T.word_shingles("text", 2))) == 1
    assert _one(spark, "", T.top_ngram_count(T.word_shingles("text", 2))) == 1


def test_repetition_stats_are_shuffle_free(spark):
    """The repetition filters exist to be a narrow projection — the plan
    must contain no Exchange (no explode+groupBy formulation creep)."""
    df = spark.createDataFrame([("a b a b",), ("x y z",)], ["text"]).select(
        T.dup_ngram_frac(T.word_shingles("text", 3)).alias("d"),
        T.top_ngram_count(T.word_shingles("text", 2)).alias("t"),
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_token_chunks_cover_and_overlap(spark):
    from superstore_data_pipeline_analytics_dashboard__spark.plans.catalog_queries import (
        QUERIES,
    )
    from tests.conftest import SF_SMOKE

    rows = QUERIES["q86_token_chunks"](spark, SF_SMOKE).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert by_doc
    for chunks in by_doc.values():
        chunks.sort(key=lambda r: r["chunk_id"])
        # stride spacing, full coverage, and >=1-token chunks
        for i, c in enumerate(chunks):
            assert c["chunk_id"] == i
            assert c["begin_tok"] == i * 12
            assert 1 <= c["n_chunk_tokens"] <= 16
            assert len(c["chunk_text"].split(" ")) == c["n_chunk_tokens"]
        # consecutive full chunks overlap by window - stride = 4 tokens
        for a, b in zip(chunks, chunks[1:]):
            if a["n_chunk_tokens"] == 16:
                tail = a["chunk_text"].split(" ")[12:]
                head = b["chunk_text"].split(" ")[: len(tail)]
                assert tail == head
