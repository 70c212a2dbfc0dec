"""Per-batch Bloom summaries over the manifest sink: point-lookup
pruning that still works on RANDOM layouts.

The zone-map manifest (``sources/manifest.py``) prunes range reads and
targeted erasure via per-batch [min, max] envelopes — which is exactly
right on range-clustered layouts and provably useless on random ones:
every batch's envelope spans the key space, so a point lookup (or an
opt-out-list erasure) degrades to scanning/rewriting everything. A
Bloom summary has the opposite trade: it knows nothing about ranges
but answers "can this batch contain key x?" probabilistically with NO
false negatives, independent of layout. Lakehouse formats ship the
same tier (Parquet bloom filters, Delta's BLOOMFILTER index); for the
plain-parquet manifest sink this module materializes it as one row per
batch — ``(batch, bloom_pos)`` where ``bloom_pos`` is the sorted set
of set bit positions, bounded by ``n_bits``.

Positions use the Kirsch-Mitzenmacher construction (two xxhash64
seeds, position_i = (h1 + i*h2) mod n_bits — the same double-hashing
the MinHash family uses in ``operators/dedup.py``). xxhash64 is
Spark-only, which is fine HERE: bloom positions are engine-internal
pruning state, never oracle-compared (the portable-hashing boundary
rule) — gate queries compare the exact row counts and guarantee
booleans the pruning produces, not the positions.

Scale shape: collection is ONE narrow scan of the key column
(explode k positions per row, ``collect_set`` partial-aggregates
map-side; the result is #batches rows, each at most ``n_bits``
ints). Candidate selection is an inverted-index equi-join on
position — the exploded batch summaries against the BROADCAST
exploded key positions (opt-out / lookup lists are key-sized) —
then an all-k-positions count per (batch, key): linear in total
summary size, never #batches × #keys pairwise array scans.

Sizing: false-positive rate per key per batch is roughly
``(n_distinct*k/n_bits)^k``; keep ``n_bits`` an order of magnitude
above ``n_distinct*k`` per batch. A saturated bloom (n_bits too
small) never lies about presence — it just prunes nothing, the same
honest degradation the envelope tier has on random layouts.

NULL keys are not representable (a point lookup for NULL identifies
nothing — the same policy as ``retention.erase_rows``): collection
skips NULL values and candidate keys drop NULLs; callers wanting
NULL-keyed rows should filter by predicate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "bloom_positions",
    "collect_batch_blooms",
    "bloom_candidates",
    "read_bloom_pruned",
    "load_bloom_store",
]


def bloom_positions(
    col: Column | str, n_bits: int = 1 << 18, n_hashes: int = 3
) -> Column:
    """Array of the ``n_hashes`` (deduplicated) bit positions for a key
    — Kirsch-Mitzenmacher double hashing, overflow-safe under ANSI mode
    (both hashes are reduced mod ``n_bits`` before the small multiply-
    add, so no long multiply can overflow)."""
    c = F.col(col) if isinstance(col, str) else col
    h1 = F.pmod(F.xxhash64(c, F.lit(1)), F.lit(n_bits))
    h2 = F.pmod(F.xxhash64(c, F.lit(2)), F.lit(n_bits))
    return F.array_distinct(
        F.array(
            *(F.pmod(h1 + F.lit(i) * h2, F.lit(n_bits)) for i in range(n_hashes))
        )
    )


def collect_batch_blooms(
    spark: SparkSession,
    sink_path: str,
    col: str,
    n_bits: int = 1 << 18,
    n_hashes: int = 3,
) -> DataFrame:
    """One row per ``batch=<id>`` partition of the sink:
    ``(batch, bloom_pos)`` — the sorted distinct bit positions of every
    non-NULL key in the batch. One narrow scan of ``col``."""
    src = spark.read.option("basePath", sink_path).parquet(sink_path)
    return (
        src.filter(F.col(col).isNotNull())
        .select(
            F.col("batch").cast("long").alias("batch"),
            F.explode(bloom_positions(col, n_bits, n_hashes)).alias("pos"),
        )
        .groupBy("batch")
        .agg(F.sort_array(F.collect_set("pos")).alias("bloom_pos"))
    )


def bloom_candidates(
    blooms: DataFrame,
    keys: DataFrame,
    col: str,
    n_bits: int = 1 << 18,
    n_hashes: int = 3,
) -> DataFrame:
    """(batch, key) pairs whose batch bloom MAY contain the key — a
    superset of the true containments (no false negatives, guaranteed
    by construction: a present key's every position is set). ``n_bits``
    and ``n_hashes`` must match the ``collect_batch_blooms`` call that
    built ``blooms``.

    Inverted-index shape: explode the batch summaries to (batch, pos)
    rows, equi-join the broadcast exploded key positions, keep pairs
    where ALL of the key's (deduplicated) positions matched. Output
    column ``col`` carries the key value.

    ``keys[col]`` must carry EXACTLY the type the summaries were
    collected from — xxhash64 is type-sensitive (an int32 and an int64
    of the same value hash differently), so a widened key column would
    silently produce false negatives. ``read_bloom_pruned`` casts via
    the sink footer for exactly this reason."""
    kp = (
        keys.select(col)
        .filter(F.col(col).isNotNull())
        .distinct()
        .select(
            F.col(col),
            bloom_positions(col, n_bits, n_hashes).alias("k_pos"),
        )
        .select(
            F.col(col),
            F.size("k_pos").alias("n_pos"),
            F.explode("k_pos").alias("pos"),
        )
    )
    bp = blooms.select("batch", F.explode("bloom_pos").alias("pos"))
    return (
        bp.join(F.broadcast(kp), "pos")
        .groupBy("batch", col, "n_pos")
        .agg(F.count("*").alias("n_hit"))
        .filter(F.col("n_hit") == F.col("n_pos"))
        .select("batch", col)
    )


def load_bloom_store(
    spark: SparkSession, bloom_path: str, col: str
) -> DataFrame:
    """Read one column's per-batch summaries back from a streaming-
    maintained bloom store
    (:func:`streaming.incremental.start_append_with_manifest` with
    ``bloom_cols=``): ``(batch, bloom_pos)`` rows in the shape
    ``bloom_candidates`` / ``read_bloom_pruned`` / ``erase_rows``
    consume. Raises if the store never bloomed ``col`` — a typo'd
    column would otherwise prune everything (zero candidate batches
    reads as "key nowhere" — for the erasure consumer that is the
    silent-no-op failure mode the NULL policy exists to prevent)."""
    store = spark.read.parquet(bloom_path).filter(F.col("key_col") == col)
    out = store.select(
        F.col("batch").cast("long").alias("batch"), "bloom_pos"
    )
    if not out.limit(1).count():
        raise ValueError(
            f"load_bloom_store: no summaries for column {col!r} in "
            f"{bloom_path} — was it in bloom_cols when the sink landed?"
        )
    return out


def read_bloom_pruned(
    spark: SparkSession,
    sink_path: str,
    blooms: DataFrame,
    col: str,
    values,
    n_bits: int = 1 << 18,
    n_hashes: int = 3,
) -> DataFrame:
    """Read only the batch partitions whose bloom may contain any of
    ``values`` (a Python sequence), with the exact ``isin`` residual
    filter still applied — the point-lookup twin of
    ``manifest.read_pruned``, for the random layouts where range
    envelopes admit everything. An empty candidate set returns an
    empty frame with the sink's schema (footer read only). The bloom
    must be CURRENT: built (or rebuilt) after the last append — blooms
    stay safe across row DELETIONS (over-approximation survives), but
    an append after collection can silently hide new rows."""
    vals = list(values)
    if not vals:
        # the documented empty-frame return must not depend on inferring
        # a schema from an empty probe list (createDataFrame would raise)
        return spark.read.parquet(sink_path).filter(F.lit(False))
    # xxhash64 is TYPE-sensitive (int32 and int64 hash differently), so
    # the probe keys must carry exactly the sink column's type or the
    # positions won't match the collected ones — cast via the footer
    key_type = spark.read.parquet(sink_path).schema[col].dataType
    keys = (
        spark.createDataFrame([(v,) for v in vals])
        .toDF(col)
        .select(F.col(col).cast(key_type))
    )
    batches = [
        int(r["batch"])
        for r in bloom_candidates(blooms, keys, col, n_bits, n_hashes)
        .select("batch")
        .distinct()
        .collect()
    ]
    if not batches:
        return spark.read.parquet(sink_path).filter(F.lit(False))
    src = spark.read.option("basePath", sink_path).parquet(
        *(f"{sink_path}/batch={b}" for b in sorted(batches))
    )
    return src.filter(F.col(col).isin(vals))
