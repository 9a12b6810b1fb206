"""Date-dimension generation (SURVEY §2.9 M3; reference datespopulation.py:16-43).

Reference mechanism: ``SELECT 1 FROM stl_scan LIMIT 731`` (a serial
system-table scan hack) + ``ROW_NUMBER() OVER (ORDER BY 1)`` to make
1..N, then ``'2023-01-01'::DATE + n - 1`` and six EXTRACTs.

Spark-first mechanism: ``spark.range(n)`` — a parallel, input-free row
generator (S8) with no single-partition window bottleneck. At 100 TB
scale a calendar dim is tiny, but the same generator pattern serves any
row-synthesis need without touching a table.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.datefns import weekday_redshift

DEFAULT_START = dt.date(2023, 1, 1)  # datespopulation.py:21
DEFAULT_DAYS = 731  # datespopulation.py:23 (2023-01-01 .. 2024-12-31)


def generate_dim_dates(
    spark: SparkSession,
    start: dt.date = DEFAULT_START,
    n_days: int = DEFAULT_DAYS,
) -> DataFrame:
    """M3: n_days consecutive dates from ``start`` with derived calendar parts.

    Columns mirror dim_dates (datespopulation.py:27-37 + StarSchema.jpg):
    DateKey (yyyymmdd int, the fact FK target), Date, Year, Quarter,
    Month, Day, Weekday (0=Sunday, Redshift numbering), Week (ISO).
    """
    d = F.date_add(F.lit(str(start)).cast("date"), F.col("id").cast("int"))
    return spark.range(n_days).select(
        F.date_format(d, "yyyyMMdd").cast("int").alias("DateKey"),
        d.alias("Date"),
        F.year(d).alias("Year"),
        F.quarter(d).alias("Quarter"),
        F.month(d).alias("Month"),
        F.dayofmonth(d).alias("Day"),
        weekday_redshift(d).alias("Weekday"),
        F.weekofyear(d).alias("Week"),
    )
