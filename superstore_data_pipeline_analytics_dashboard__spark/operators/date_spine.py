"""Date-dimension spine (SURVEY.md §2.9 R1, §7 step 4).

The reference generates one row per day with a recursive CTE
(``SQLproject1.sql:262-284``, its only recursive construct). Spark has no
recursive CTE — and doesn't need one: ``sequence(lo, hi, interval 1 day)``
+ ``explode`` builds the spine in a single narrow stage with no shuffle,
and scales to any range (the reference needs 1,464 rows).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import dates as D


def date_spine(spark: SparkSession, start: dt.date | str, end: dt.date | str) -> DataFrame:
    """One row per day in [start, end] — `explode(sequence(...))`."""
    return spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit(str(start)).cast("date"),
                F.lit(str(end)).cast("date"),
                F.expr("interval 1 day"),
            )
        ).alias("Date")
    )


def build_date_dim(spark: SparkSession, start, end) -> DataFrame:
    """dim.Date per SQLproject1.sql:248-286: DateKey yyyyMMdd, calendar
    parts, MonthName, QuarterName 'Qn', ISO WeekOfYear, IsWeekend.

    WeekOfYear uses ISO-8601 (`weekofyear`); T-SQL's US week is available
    as `functions.dates.us_week` (documented deviation, SURVEY.md §4.2)."""
    d = F.col("Date")
    return date_spine(spark, start, end).select(
        D.date_key(d).alias("DateKey"),
        d.alias("Date"),
        F.year(d).alias("Year"),
        F.quarter(d).alias("Quarter"),
        F.month(d).alias("Month"),
        F.dayofmonth(d).alias("Day"),
        D.month_name(d).alias("MonthName"),
        D.quarter_name(d).alias("QuarterName"),
        F.weekofyear(d).alias("WeekOfYear"),
        D.is_weekend(d).alias("IsWeekend"),
    )
