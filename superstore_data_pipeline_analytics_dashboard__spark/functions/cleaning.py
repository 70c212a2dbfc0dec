"""Cleaning / typing scalar expressions (SURVEY.md §2.2-§2.3, P1-P11, F1-F8).

All JVM-side built-ins — no Python UDFs. Each helper mirrors a reference
construct; citations point at the reference implementation it re-expresses.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def trim_nullif(col: Column | str) -> Column:
    """``NULLIF(LTRIM(RTRIM(col)), '')`` — SQLproject1.sql:172-187 (P1)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.nullif(F.trim(c), F.lit(""))


def strip_spaces(col: Column | str) -> Column:
    """``REPLACE(col, ' ', '')`` — SQLproject1.sql:182,610 (P2)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.replace(c, F.lit(" "), F.lit(""))


def clean_control_chars(col: Column | str) -> Column:
    """Power Query ``Text.Clean`` — Section1.m step "Cleaned Text" (F17)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, r"[\p{Cntrl}]", "")


def try_date(col: Column | str, fmt: str = "M/d/yyyy") -> Column:
    """``TRY_CONVERT(date, col)`` with the intended US format —
    SQLproject1.sql:173-174 (P3). ``to_date`` would throw under ANSI mode on
    bad input, so route through try_to_timestamp."""
    c = F.col(col) if isinstance(col, str) else col
    return F.try_to_timestamp(c, F.lit(fmt)).cast("date")


def try_decimal(col: Column | str, precision: int = 18, scale: int = 2) -> Column:
    """``TRY_CONVERT(decimal(p,s), col)`` — SQLproject1.sql:188-191 (P4)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.try_cast(f"decimal({precision},{scale})")


def try_int(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.try_cast("int")


def strip_trailing_semicolon(col: Column | str) -> Column:
    """Remove the messy-CSV trailing ``;`` that lands inside Profit
    (SURVEY.md §1.2; values like ``41.9136;``)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, r";+\s*$", "")


def zero_pad_postal(col: Column | str, width: int = 5) -> Column:
    """``RIGHT('00000' + code, max(5, LEN(code)))`` zero-pad after
    space-strip — SQLproject1.sql:430-435 (P9/F5). Codes already ≥ width
    chars pass through UNCHANGED (lpad alone would truncate a ZIP+4 to its
    first 5 chars, diverging from the reference). NULL-safe."""
    c = F.col(col) if isinstance(col, str) else col
    cleaned = F.nullif(strip_spaces(c), F.lit(""))
    return F.when(cleaned.isNull(), F.lit(None).cast("string")).otherwise(
        F.when(F.length(cleaned) >= width, cleaned).otherwise(
            F.lpad(cleaned, width, "0")
        )
    )


def division_guard(num: Column, den: Column) -> Column:
    """``num / NULLIF(den, 0)`` — SQLproject1.sql:694,714 (P11).
    Required under ANSI mode where x/0 raises."""
    return num / F.nullif(den, F.lit(0))
