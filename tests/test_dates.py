"""M3 date dimension: boundary semantics that pin F5/F6 (FIXTURES §A3)."""

from __future__ import annotations

import datetime as dt

from glue_jobs_for_data_pipeline_spark.operators.dates_dim import generate_dim_dates


def test_dim_dates_default_range(spark):
    df = generate_dim_dates(spark)
    rows = {r["Date"]: r for r in df.collect()}
    assert len(rows) == 731
    assert min(rows) == dt.date(2023, 1, 1)
    assert max(rows) == dt.date(2024, 12, 31)


def test_redshift_weekday_and_iso_week(spark):
    rows = {r["Date"]: r for r in generate_dim_dates(spark).collect()}
    jan1 = rows[dt.date(2023, 1, 1)]  # a Sunday
    assert jan1["Weekday"] == 0  # Redshift DOW: 0=Sunday
    assert jan1["Week"] == 52  # ISO week of the *prior* year
    assert jan1["DateKey"] == 20230101
    assert (jan1["Year"], jan1["Quarter"], jan1["Month"], jan1["Day"]) == (
        2023,
        1,
        1,
        1,
    )
    # leap day present
    assert dt.date(2024, 2, 29) in rows
    # monday-start ISO check: 2024-01-01 is a Monday -> ISO week 1
    assert rows[dt.date(2024, 1, 1)]["Weekday"] == 1
    assert rows[dt.date(2024, 1, 1)]["Week"] == 1
