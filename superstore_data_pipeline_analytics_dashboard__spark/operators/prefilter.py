"""Bloom-filter semi-join reduction: shrink a fact BEFORE its shuffle.

A join ``fact ⋈ dim_subset`` shuffles every fact row that survives the
scan — even rows whose key can't possibly match. Catalyst's own runtime
bloom filter (`spark.sql.optimizer.runtime.bloomFilter.enabled`, on in
`session.get_spark`) injects this automatically, but only above size
thresholds tuned for clusters (10 MB creation side / 10 GB scan side);
this operator is the explicit form — usable at any size, and the shape
to reach for when the plan shows a full-fact Exchange feeding a selective
join.

Mechanics, all JVM-side:

1. bit positions for every build-side key: ``pmod(xxhash64(key, seed_i),
   n_bits)`` for k seeds (one narrow projection);
2. positions fold into 64-bit words with ``bit_or`` (one small shuffle on
   the word index — ≤ n_bits/64 groups);
3. the word array is collected (bounded: n_bits/64 longs, e.g. 16 KiB for
   2^20 bits) and embedded as ONE array literal — a single
   ``Literal(ArrayType)``, not a 16k-child ``CreateArray``, so codegen
   sees one constant;
4. the probe side filters with ``(element_at(words, pos>>6 + 1) >> (pos &
   63)) & 1`` per seed, ANDed — runs inside WholeStageCodegen in the scan
   stage, before any Exchange.

False positives pass through (the exact join afterwards removes them);
false negatives cannot occur — so composing ``bloom_prefilter`` with the
real join is semantics-preserving, which is what makes it safe to apply
mechanically. Sizing: ~10 bits/key + k=5 ≈ 1% FPR; ``n_bits`` is rounded
up to a power of two of that estimate unless given.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: distinct seeds make the k hash functions independent (xxhash64's seed
#: parameter, not k slices of one hash — slices correlate on short keys)
_SEEDS = (0x9E3779B9, 0x85EBCA6B, 0xC2B2AE35, 0x27D4EB2F, 0x165667B1, 0xFF51AFD7)


def _positions(key: Column, n_bits: int, k: int) -> list[Column]:
    return [
        F.pmod(F.xxhash64(key, F.lit(seed)), F.lit(n_bits)) for seed in _SEEDS[:k]
    ]


def build_bloom_words(keys: DataFrame, key_col: str, n_bits: int, k: int = 5) -> list[int]:
    """Distributed build: the dense word array (length n_bits/64) of the
    Bloom filter over ``keys[key_col]``. Collect is bounded by the filter
    size, never by the key count."""
    if n_bits % 64:
        raise ValueError("n_bits must be a multiple of 64")
    pos = keys.select(
        F.explode(F.array(*_positions(F.col(key_col), n_bits, k))).alias("pos")
    )
    # F.shiftleft/shiftright only take a literal int count from Python;
    # call_function reaches the SQL builtin that accepts a column count
    words = (
        pos.select(
            F.shiftright("pos", 6).alias("w"),
            F.call_function(
                "shiftleft", F.lit(1).cast("long"), F.pmod("pos", F.lit(64)).cast("int")
            ).alias("bit"),
        )
        .groupBy("w")
        .agg(F.expr("bit_or(bit)").alias("word"))
        .collect()
    )
    dense = [0] * (n_bits // 64)
    for r in words:
        dense[r["w"]] = r["word"]
    return dense


def bloom_contains(key: Column, words: list[int], k: int = 5) -> Column:
    """Membership test against a built word array — pure codegen-able
    expression (shift/AND on one array literal)."""
    n_bits = len(words) * 64
    arr = F.lit(words)
    cond = None
    for pos in _positions(key, n_bits, k):
        word = F.element_at(arr, F.shiftright(pos, 6).cast("int") + F.lit(1))
        shifted = F.call_function("shiftright", word, F.pmod(pos, F.lit(64)).cast("int"))
        bit = shifted.bitwiseAND(F.lit(1)) == F.lit(1)
        cond = bit if cond is None else (cond & bit)
    return cond


def bloom_prefilter(
    fact: DataFrame,
    fact_key: str,
    keys: DataFrame,
    key_col: str,
    n_bits: int | None = None,
    k: int = 5,
) -> DataFrame:
    """Drop fact rows whose key is provably absent from ``keys`` — a
    superset of the exact semi-join, cheap enough to run in the scan
    stage. Follow with the real join; results are identical to joining
    without the prefilter."""
    if n_bits is None:
        n_keys = keys.select(key_col).count()
        n_bits = 1024
        while n_bits < 10 * max(n_keys, 1):
            n_bits *= 2
    words = build_bloom_words(keys, key_col, n_bits, k)
    return fact.filter(bloom_contains(F.col(fact_key), words, k))
