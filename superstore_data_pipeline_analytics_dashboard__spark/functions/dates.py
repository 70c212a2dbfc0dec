"""Date expressions (SURVEY.md §2.3 F7-F14, §2.9 R1 derived columns).

``weekofyear`` note (F9): T-SQL ``DATEPART(WEEK)`` is US-Sunday-week-1-based;
Spark/DuckDB ``weekofyear`` is ISO-8601. We expose both: ``week_of_year``
(ISO, the engine default, matches the DuckDB oracle) and ``us_week``
(T-SQL-compatible emulation) for byte-parity use cases.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def date_key(col: Column | str) -> Column:
    """``CONVERT(INT, FORMAT(d,'yyyyMMdd'))`` — SQLproject1.sql:273 (F7/F8)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(c, "yyyyMMdd").cast("int")


def month_name(col: Column | str) -> Column:
    """``DATENAME(MONTH, d)`` — SQLproject1.sql:279 (F10)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(c, "MMMM")


def day_name(col: Column | str) -> Column:
    """``DATENAME(WEEKDAY, d)`` — SQLproject1.sql:282 (F10)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(c, "EEEE")


def quarter_name(col: Column | str) -> Column:
    """``'Q' + CAST(DATEPART(QUARTER,d) AS VARCHAR)`` — SQLproject1.sql:277."""
    c = F.col(col) if isinstance(col, str) else col
    return F.concat(F.lit("Q"), F.quarter(c).cast("string"))


def is_weekend(col: Column | str) -> Column:
    """``CASE WHEN DATENAME(WEEKDAY,d) IN ('Saturday','Sunday')`` —
    SQLproject1.sql:282 (P9). dayofweek: 1=Sunday, 7=Saturday."""
    c = F.col(col) if isinstance(col, str) else col
    return F.dayofweek(c).isin(1, 7)


def us_week(col: Column | str) -> Column:
    """Emulate T-SQL ``DATEPART(WEEK, d)`` (``DATEFIRST 7`` default):
    week = floor((dayofyear + dow(jan1) - 2) / 7) + 1 where dow is
    1=Sunday..7=Saturday. Jan 1 is always week 1; weeks break on Sunday."""
    c = F.col(col) if isinstance(col, str) else col
    jan1 = F.trunc(c, "year")
    return (
        F.floor((F.dayofyear(c) + F.dayofweek(jan1) - F.lit(2)) / F.lit(7)) + F.lit(1)
    ).cast("int")


def months_between_whole(start: Column | str, end: Column | str) -> Column:
    """``DATEDIFF(MONTH, a, b)`` — SQLproject1.sql:669 (F12). T-SQL counts
    month-boundary crossings, NOT 30-day spans — compute via year*12+month so
    the DuckDB oracle (`(year(b)*12+month(b)) - (year(a)*12+month(a))`)
    agrees exactly."""
    a = F.col(start) if isinstance(start, str) else start
    b = F.col(end) if isinstance(end, str) else end
    return (
        (F.year(b) * F.lit(12) + F.month(b)) - (F.year(a) * F.lit(12) + F.month(a))
    ).cast("int")
