"""Hashing expressions (SURVEY.md §2.3 F15, §2.10 step 2).

MD5/SHA2 return lowercase hex strings in both Spark and DuckDB, so hash
columns hash-compare cleanly against the oracle. ``xxhash64`` is Spark-only
(used for MinHash/LSH internals that have no SQL oracle).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


def _cols(cols: Sequence[Column | str]) -> list[Column]:
    return [F.col(c) if isinstance(c, str) else c for c in cols]


def geo_hash_key(*cols: Column | str) -> Column:
    """Geography ``HASHBYTES('MD5', CONCAT(UPPER(...),'|',...))`` persisted
    key — SQLproject1.sql:323-325. NULLs coalesce to '' as the reference's
    CONCAT does."""
    parts = [F.upper(F.coalesce(c, F.lit(""))) for c in _cols(cols)]
    return F.md5(F.concat_ws("|", *parts))


def scd2_hash_diff(*cols: Column | str) -> Column:
    """SCD2 change-detection hash: ``SHA2_256(UPPER(ISNULL(a,''))+'|'+...)``
    — SQLproject1.sql:468-470,533-535."""
    parts = [F.upper(F.coalesce(c.cast("string"), F.lit(""))) for c in _cols(cols)]
    return F.sha2(F.concat_ws("|", *parts), 256)


def md5_prefix_long(col: Column | str, hex_chars: int = 15) -> Column:
    """Deterministic 60-bit integer from md5 hex — portable to DuckDB via
    the same ``conv(substr(md5(x),1,15),16,10)`` construction. Used for
    fingerprints that must hash-compare with the oracle."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, hex_chars), 16, 10).cast("bigint")
