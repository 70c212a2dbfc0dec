"""Sequence packing for LLM pretraining (concat-and-chunk).

The reference pipeline (SQLproject1.sql) stops at analytics; packing is
part of the large-scale training-data extension set. The shape is the
standard GPT-style packer: order documents deterministically, lay their
token streams end-to-end, and cut fixed-length training sequences every
``budget`` tokens. Each document then owns a half-open token-offset span
``[stream_begin, stream_end)`` inside its shard's stream, and sequence
``k`` of a shard owns offsets ``[k*budget, (k+1)*budget)`` — enough to
drive the actual tensor materialization without ever moving text through
a shuffle.

Scale design (the part that must survive 100 TB):

* One GLOBAL stream would mean one global sort + one running sum over
  every document — a single-partition window. Instead documents are
  sharded by a content-derived md5 bucket (``functions.sampling
  .hash_bucket`` — engine-portable, reproducible on any cluster size),
  and the running offset is a window partitioned BY SHARD: ``n_shards``
  independent single-pass cumulative sums. Sequence identity is the
  (shard, chunk) pair, disjoint across shards by construction.
* Only ``(doc_id, n_tokens)`` flows through the shuffle — ~16 bytes per
  document; the text column stays in the source files until a downstream
  join fetches it by doc_id.
* The window body is an integer running SUM — whole-stage codegen,
  no UDF anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.sampling import hash_bucket


def pack_concat_chunk(
    docs: DataFrame,
    n_tokens: Column | str,
    budget: int = 2048,
    n_shards: int = 16,
    doc_id: str = "doc_id",
) -> DataFrame:
    """Assign every document its packed-sequence span.

    Returns one row per input document:

    ``doc_id`` · ``n_tokens`` · ``shard`` · ``stream_begin`` (token offset
    of the doc inside its shard's concatenated stream) · ``first_seq`` /
    ``last_seq`` (the budget-sized sequences the doc's span touches,
    shard-local) · ``n_seqs`` (how many sequences the doc straddles).

    Zero-token documents contribute nothing to the stream; they report
    the sequence the cut point falls in and ``n_seqs = 0``.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    tok = (F.col(n_tokens) if isinstance(n_tokens, str) else n_tokens).cast("bigint")
    w = (
        Window.partitionBy("shard")
        .orderBy(doc_id)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    staged = docs.select(
        F.col(doc_id),
        tok.alias("n_tokens"),
        hash_bucket(F.col(doc_id), n_shards).alias("shard"),
    )
    spanned = staged.select(
        doc_id,
        "n_tokens",
        "shard",
        (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias("stream_begin"),
    )
    # integer `div`, never `/`: float division of 64-bit offsets loses
    # precision past 2^53 (a real stream position at 100 TB) and would
    # diverge from the oracle's integer `//`
    b = int(budget)
    first = F.expr(f"stream_begin div {b}")
    last = F.expr(f"(stream_begin + n_tokens - 1) div {b}")
    return spanned.select(
        doc_id,
        "n_tokens",
        "shard",
        "stream_begin",
        first.alias("first_seq"),
        F.when(F.col("n_tokens") > 0, last).otherwise(first).alias("last_seq"),
        F.when(F.col("n_tokens") > 0, last - first + 1)
        .otherwise(F.lit(0).cast("bigint"))
        .alias("n_seqs"),
    )
