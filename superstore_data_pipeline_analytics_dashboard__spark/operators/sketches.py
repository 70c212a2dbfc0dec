"""Mergeable-sketch operators: the sublinear-state path for quantiles,
distinct counts, and heavy hitters at 100 TB.

Exact forms of these answers need either a full sort (quantiles), a
shuffle of every distinct key (count distinct), or a full per-key count
(heavy hitters). The sketch forms keep a KB-sized mergeable summary per
partition and combine summaries associatively — constant driver memory,
one map-side pass, no key shuffle — which is why they are the only
practical shapes at corpus scale:

* **KLL** (`kll_sketch_agg_*` / `kll_sketch_get_quantile_*`) — quantile
  sketch with provable rank error; the scale path behind q37's
  `percentile_approx` (GK) with the added property that partial sketches
  merge across days/partitions/tables.
* **Theta** (`theta_sketch_agg` / `theta_sketch_estimate`) — distinct
  counting that, unlike HLL (q35), supports set algebra on the sketches
  themselves; per-group cardinalities here.
* **Count-min** — heavy-hitter frequency estimates with one-sided error
  (est ≥ true; est ≤ true + (e/width)·N w.p. ≥ 1−exp(−depth)). Built
  HERE as a plain depth×width counting aggregation over engine-portable
  md5 hashes (PySpark doesn't expose the JVM `stat.countMinSketch`, and
  rolling our own buys determinism): the "sketch" is a depth·width-row
  table — bounded state, mergeable by addition, probe = min over depth
  counters. Fully deterministic in ANY engine, so unlike KLL/theta the
  CMS catalog query is value-checked against the DuckDB oracle.

KLL and theta return approximate values with engine-specific internals,
so their catalog queries are rows-only; the tests pin accuracy against
exact answers instead.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def kll_quantiles(
    df: DataFrame,
    value_col: str,
    quantiles: Sequence[float] = (0.25, 0.5, 0.75, 0.9, 0.99),
    k: int = 200,
) -> DataFrame:
    """One row: the requested quantiles of ``value_col`` from a single
    KLL(k) sketch aggregation (one map-side pass, mergeable state)."""
    sk = F.kll_sketch_agg_double(F.col(value_col).cast("double"), F.lit(k))
    agg = df.agg(sk.alias("__sk"))
    return agg.select(
        F.kll_sketch_get_n_double("__sk").alias("n"),
        *[
            F.kll_sketch_get_quantile_double("__sk", F.lit(q)).alias(
                f"q{round(q * 100):02d}"
            )
            for q in quantiles
        ],
    )


def theta_distinct_per_group(
    df: DataFrame,
    group_col: str,
    value_col: str,
) -> DataFrame:
    """Per-group estimated distinct count of ``value_col`` via theta
    sketches. Same partial-aggregation plan as a SUM — the sketch IS the
    map-side state — vs exact countDistinct's expand-and-reshuffle."""
    return (
        df.groupBy(group_col)
        .agg(F.theta_sketch_agg(value_col).alias("__sk"))
        .select(
            group_col,
            F.theta_sketch_estimate("__sk").alias("est_distinct"),
        )
    )


def _cms_bucket(key: Column, row: int, width: int) -> Column:
    """Hash row ``row``'s bucket for ``key``: md5-derived 60-bit integer
    mod width — identical construction in DuckDB (see hashing module)."""
    from ..functions.hashing import md5_prefix_long

    return (
        md5_prefix_long(F.concat(F.lit(f"cms{row}:"), key.cast("string")))
        % F.lit(width)
    ).cast("int")


def cms_table(
    df: DataFrame,
    key_col: str,
    width: int = 2048,
    depth: int = 4,
) -> DataFrame:
    """The count-min sketch as a (row, bucket, cnt) table of at most
    depth·width rows. Each input row increments one bucket per hash row;
    the build is a single stacked aggregation (inline explode of the
    depth hash expressions — shuffle carries depth smallint/int pairs per
    row, map-side combined). Sketches of two corpora merge by unioning
    and re-summing — the mergeability that matters for incremental loads.
    """
    key = F.col(key_col)
    stacked = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("row"),
                        _cms_bucket(key, d, width).alias("bucket"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("rb")
    ).select("rb.row", "rb.bucket")
    return stacked.groupBy("row", "bucket").agg(F.count("*").alias("cnt"))


def cms_probe(
    sketch: DataFrame,
    probes: DataFrame,
    key_col: str,
    width: int = 2048,
    depth: int = 4,
) -> DataFrame:
    """Estimate each probe key's frequency: min over the depth counters.
    The sketch side is ≤ depth·width rows — always broadcast."""
    key = F.col(key_col)
    probe_rows = probes.select(
        key.alias("probe_key"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("row"),
                        _cms_bucket(key, d, width).alias("bucket"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("rb"),
    ).select("probe_key", "rb.row", "rb.bucket")
    joined = probe_rows.join(F.broadcast(sketch), ["row", "bucket"], "left").fillna(
        0, subset=["cnt"]
    )
    return joined.groupBy("probe_key").agg(F.min("cnt").alias("est_count"))


def hll_join_overlap(
    left: DataFrame,
    right: DataFrame,
    key: str,
    lgk: int = 14,
) -> DataFrame:
    """Estimate the distinct-key overlap between two join sides without
    joining them: |A∩B| = |A| + |B| − |A∪B| by inclusion-exclusion over
    HLL sketches. One map-side sketch pass per side, a union of two
    1-sketch rows — sublinear state end-to-end. This is the planning
    primitive behind "will this join explode / is a bloom filter worth
    building": at 100 TB you answer it from KB of sketch, not a dry-run
    join. Returns one row: est_left, est_right, est_union, est_overlap.
    """
    ls = left.select(F.col(key).alias("k")).agg(
        F.hll_sketch_agg("k", F.lit(lgk)).alias("sk")
    )
    rs = right.select(F.col(key).alias("k")).agg(
        F.hll_sketch_agg("k", F.lit(lgk)).alias("sk")
    )
    both = ls.unionByName(rs)
    merged = both.agg(
        F.hll_union_agg("sk").alias("u"),
    )
    singles = ls.select(F.hll_sketch_estimate("sk").alias("est_left")).crossJoin(
        rs.select(F.hll_sketch_estimate("sk").alias("est_right"))
    )
    return singles.crossJoin(
        merged.select(F.hll_sketch_estimate("u").alias("est_union"))
    ).select(
        "est_left",
        "est_right",
        "est_union",
        (F.col("est_left") + F.col("est_right") - F.col("est_union")).alias(
            "est_overlap"
        ),
    )
