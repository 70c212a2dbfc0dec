"""Text-analysis expressions for large-scale training-data pipelines.

Everything here is built-in-function-only (codegen-able, no UDFs):
tokenization, word shingles, stopword/punctuation ratios, a language-ID
heuristic, a quality score, and document fingerprints. Each has a matching
ANSI-SQL formulation used by the DuckDB oracle — keep the two in sync
(see __spark_entry__.oracle_sql).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: tiny embedded stopword lists for the n-gram/stopword language heuristic.
STOPWORDS_EN = (
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "that", "for", "on", "with", "as", "was", "at", "by", "be", "this",
)
STOPWORDS_DE = (
    "der", "die", "das", "und", "oder", "von", "zu", "im", "ist", "es",
    "dass", "für", "auf", "mit", "als", "war", "bei", "sein", "ein", "eine",
)
STOPWORDS_FR = (
    "le", "la", "les", "et", "ou", "de", "à", "dans", "est", "il",
    "que", "pour", "sur", "avec", "comme", "était", "par", "être", "un", "une",
)


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def normalize(col: Column | str) -> Column:
    """Lowercase + collapse whitespace + trim: the canonical form used by
    fingerprinting and exact dedup."""
    return F.trim(F.regexp_replace(F.lower(_c(col)), r"\s+", " "))


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization of the normalized text → array<string>.

    Normalizing handles interior runs, but splitting an EMPTY normalized
    string still yields one empty element — so an empty/whitespace-only
    document would count 1 token, skew quality_score, and share a single
    "" shingle across every empty doc (ADVICE r1). The array_remove
    guarantees genuinely-empty docs tokenize to []; the oracle mirrors it
    with ``list_filter(..., x -> x <> '')``."""
    return F.array_remove(F.split(normalize(col), " "), "")


def shingles_from_tokens(toks: Column, n: int = 3) -> Column:
    """n-word shingles from an already-materialized token array column.
    Callers on the hot path should project ``tokens()`` into a real column
    first and pass that: embedding the tokenize expression here would
    re-run the regex normalize + split once per window (measured ~7× on
    the shingle stage). Docs shorter than ``n`` words yield a single
    whole-doc shingle so no document silently drops out of dedup."""
    k = F.greatest(F.size(toks) - F.lit(n - 1), F.lit(1))
    return F.transform(
        F.sequence(F.lit(1), k),
        lambda i: F.array_join(F.slice(toks, i, n), " "),
    )


def word_shingles(col: Column | str, n: int = 3) -> Column:
    """n-word shingles as strings straight from the text column —
    convenience form for one-off expressions; see ``shingles_from_tokens``
    for the two-step hot-path form."""
    return shingles_from_tokens(tokens(col), n)


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


def char_count(col: Column | str) -> Column:
    return F.length(_c(col))


def punct_ratio(col: Column | str) -> Column:
    """Fraction of characters that are ASCII punctuation."""
    c = _c(col)
    n_punct = F.length(c) - F.length(
        F.regexp_replace(c, r"""[!-/:-@\[-`{-~]""", "")
    )
    return n_punct / F.greatest(F.length(c), F.lit(1))


def stopword_ratio_from_tokens(
    toks: Column, stopwords: tuple[str, ...] = STOPWORDS_EN
) -> Column:
    """Fraction of tokens that are stopwords, over a materialized token
    array column (hot-path form — tokenize once, derive many stats)."""
    sw = F.array(*[F.lit(w) for w in stopwords])
    n_sw = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return n_sw / F.greatest(F.size(toks), F.lit(1))


def stopword_ratio(col: Column | str, stopwords: tuple[str, ...] = STOPWORDS_EN) -> Column:
    """Fraction of tokens that are stopwords (array-filter, JVM-side)."""
    return stopword_ratio_from_tokens(tokens(col), stopwords)


def lang_id_from_ratios(en: Column, de: Column, fr: Column) -> Column:
    """Argmax vote over precomputed per-language stopword ratios
    (en > de > fr on ties), 'und' (undetermined) when no hits."""
    return (
        F.when((en >= de) & (en >= fr) & (en > 0), F.lit("en"))
        .when((de >= fr) & (de > 0), F.lit("de"))
        .when(fr > 0, F.lit("fr"))
        .otherwise(F.lit("und"))
    )


def lang_id(col: Column | str) -> Column:
    """Stopword-vote language heuristic over the text column."""
    toks = tokens(col)
    return lang_id_from_ratios(
        stopword_ratio_from_tokens(toks, STOPWORDS_EN),
        stopword_ratio_from_tokens(toks, STOPWORDS_DE),
        stopword_ratio_from_tokens(toks, STOPWORDS_FR),
    )


def quality_score_from_parts(n_tok: Column, sw_ratio: Column, p_ratio: Column) -> Column:
    """Composite [0,1] quality heuristic from precomputed parts: rewards
    reasonable length and stopword presence, penalizes punctuation soup."""
    len_score = F.least(n_tok / F.lit(100.0), F.lit(1.0))
    sw_score = F.least(sw_ratio * F.lit(5.0), F.lit(1.0))
    punct_pen = F.greatest(F.lit(1.0) - p_ratio * F.lit(4.0), F.lit(0.0))
    return len_score * F.lit(0.4) + sw_score * F.lit(0.4) + punct_pen * F.lit(0.2)


def quality_score(col: Column | str) -> Column:
    """Composite [0,1] quality heuristic over the text column.
    Deterministic and SQL-portable (mirrored in the oracle)."""
    return quality_score_from_parts(
        token_count(col), stopword_ratio(col), punct_ratio(col)
    )


#: GPT-2-style pre-tokenizer pattern: contractions, letter runs, digit
#: runs, punctuation runs, whitespace — \p classes behave identically in
#: Java (Spark) and RE2 (DuckDB) regex engines (verified).
BPE_ISH_PATTERN = r"""'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"""


def bpe_ish_tokens(col: Column | str) -> Column:
    """BPE-ish pre-tokenization (the unit a byte-pair encoder would merge
    within) — a better LLM-cost proxy than whitespace tokens."""
    return F.regexp_extract_all(_c(col), F.lit(BPE_ISH_PATTERN), 0)


def bpe_ish_token_count(col: Column | str) -> Column:
    return F.size(bpe_ish_tokens(col))


def dup_ngram_frac(grams: Column) -> Column:
    """Fraction of n-gram occurrences that repeat an earlier occurrence
    within the same document — the MassiveText/Gopher "duplicate n-gram
    fraction" repetition filter. Pure array expression (size vs
    array_distinct size), so per-document repetition scoring is a narrow
    projection: no explode, no shuffle, scales with bytes scanned."""
    total = F.size(grams)
    dup = (total - F.size(F.array_distinct(grams))).cast("double")
    return dup / F.greatest(total, F.lit(1))


def top_ngram_count(grams: Column) -> Column:
    """Occurrence count of the document's MOST FREQUENT n-gram (the
    numerator of Gopher's "top n-gram fraction" filter).

    Computed as the longest equal-run of the sorted gram array — one
    array_sort (O(m log m) per doc) plus a single aggregate fold, all
    JVM-side. The explode + groupBy(doc, gram) formulation computes the
    same thing but shuffles every gram occurrence; this form keeps
    per-document stats shuffle-free so only the documents themselves are
    ever scanned."""
    srt = F.array_sort(grams)
    zero = F.lit(0).cast("long")
    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        zero.alias("run"),
        zero.alias("best"),
    )

    def step(acc: Column, x: Column) -> Column:
        run = F.when(x.eqNullSafe(acc["prev"]), acc["run"] + 1).otherwise(
            F.lit(1).cast("long")
        )
        return F.struct(
            x.alias("prev"), run.alias("run"), F.greatest(acc["best"], run).alias("best")
        )

    return F.aggregate(srt, init, step, lambda acc: acc["best"])


def fingerprint(col: Column | str) -> Column:
    """Content fingerprint: md5 of the normalized text (lowercased,
    whitespace-collapsed) — stable under incidental formatting changes."""
    return F.md5(normalize(col))
