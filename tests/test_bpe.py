"""BPE training/encoding vs a pure-Python reference implementation.

The reference is the textbook Sennrich BPE trainer (pair counts over a
word-frequency dict, arg-max with the same (count DESC, left ASC,
right ASC) tie-break, left-to-right non-overlapping replacement) —
independent code, not a transcription of the Spark fold, so agreement
pins the operator's semantics exactly.
"""

from superstore_data_pipeline_analytics_dashboard__spark.operators.bpe import (
    bpe_encode,
    bpe_train,
)

CORPUS = [
    (1, "low lower lowest low low"),
    (2, "new newer newest new"),
    (3, "wider wide wide new low"),
    (4, "the newest the widest the lowest"),
]


def _ref_train(texts: list[str], n_merges: int):
    freq: dict[tuple[str, ...], int] = {}
    for t in texts:
        for w in t.split():
            k = tuple(w)
            freq[k] = freq.get(k, 0) + 1
    merges = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for sym, f in freq.items():
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + f
        pairs = {p: c for p, c in pairs.items() if c >= 2}
        if not pairs:
            break
        # (count DESC, left ASC, right ASC)
        (l, r), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((l, r, l + r, cnt))
        new_freq: dict[tuple[str, ...], int] = {}
        for sym, f in freq.items():
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == l and sym[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            k = tuple(out)
            new_freq[k] = new_freq.get(k, 0) + f
        freq = new_freq
    return merges, freq


def test_bpe_train_matches_reference_exactly(spark):
    docs = spark.createDataFrame(CORPUS, "doc_id BIGINT, text STRING")
    got = [
        (r["left"], r["right"], r["merged"], r["pair_count"])
        for r in bpe_train(docs, n_merges=8).orderBy("rank").collect()
    ]
    want, _ = _ref_train([t for _, t in CORPUS], 8)
    assert got == want


def test_bpe_train_early_stop_on_unique_pairs(spark):
    # every adjacent pair occurs once — nothing reaches the ≥2 floor
    docs = spark.createDataFrame([(1, "abc xyz")], "doc_id BIGINT, text STRING")
    assert bpe_train(docs, n_merges=5).count() == 0


def test_bpe_encode_consistent_with_training_state(spark):
    """Replaying the merge table (greedy lowest-rank-first) reproduces
    the trainer's final symbolization of every corpus word, and the
    concatenation of a doc's BPE tokens is its whitespace-stripped
    text — no characters invented or lost."""
    docs = spark.createDataFrame(CORPUS, "doc_id BIGINT, text STRING")
    merges = bpe_train(docs, n_merges=8)
    enc = {
        r["doc_id"]: r["bpe_tokens"]
        for r in bpe_encode(docs, merges).collect()
    }
    _, final_freq = _ref_train([t for _, t in CORPUS], 8)
    final_syms = {"".join(sym): list(sym) for sym in final_freq}
    for doc_id, text in CORPUS:
        toks = enc[doc_id]
        assert "".join(toks) == text.replace(" ", "")
        # per-word segmentation matches the trainer's final state
        i = 0
        for w in text.split():
            seg = []
            while "".join(seg) != w:
                seg.append(toks[i])
                i += 1
            assert seg == final_syms[w], (w, seg, final_syms[w])
        assert i == len(toks)
