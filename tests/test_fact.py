"""M2 fact population on a hand-built mini star (J1+J2+P2 semantics)."""

from __future__ import annotations

import datetime as dt
from decimal import Decimal

import pytest

from glue_jobs_for_data_pipeline_spark.operators.fact import (
    build_staging_fact,
    populate_fact,
)
from glue_jobs_for_data_pipeline_spark.operators.scd2 import scd2_upsert
from glue_jobs_for_data_pipeline_spark.operators.dates_dim import generate_dim_dates

D0 = dt.date(2023, 1, 1)


@pytest.fixture(scope="module")
def star(spark):
    orders = spark.createDataFrame(
        [
            (100, 1, 7, dt.date(2023, 1, 5)),
            (101, 2, 7, dt.date(2023, 2, 5)),
            (102, 9, 7, dt.date(2023, 1, 6)),  # customer 9 not in dim
        ],
        "OrderID int, CustomerID int, StoreID int, OrderDate date",
    )
    details = spark.createDataFrame(
        [
            (100, 11, 2, Decimal("10.50")),
            (100, 12, 1, Decimal("3.00")),
            (101, 11, 4, Decimal("10.50")),
            (102, 11, 1, Decimal("1.00")),
        ],
        "OrderID int, ProductID int, Quantity int, UnitPrice decimal(12,2)",
    )
    dim_c = scd2_upsert(
        None,
        spark.createDataFrame([(1, "ann"), (2, "bob")], "CustomerID int, Name string"),
        "CustomerID",
        ["CustomerID", "Name"],
        "CustomerKey",
        run_date=D0,
    )
    dim_s = scd2_upsert(
        None,
        spark.createDataFrame([(7, "main st")], "StoreID int, StoreName string"),
        "StoreID",
        ["StoreID", "StoreName"],
        "StoreKey",
        run_date=D0,
    )
    dim_p = scd2_upsert(
        None,
        spark.createDataFrame(
            [(11, "widget"), (12, "gadget")], "ProductID int, ProductName string"
        ),
        "ProductID",
        ["ProductID", "ProductName"],
        "ProductKey",
        run_date=D0,
    )
    return orders, details, dim_c, dim_s, dim_p


def test_staging_join_and_measures(spark, star):
    orders, details, *_ = star
    staging = build_staging_fact(orders, details).collect()
    assert len(staging) == 4  # inner join keeps all detail lines
    r = next(x for x in staging if x["OrderID"] == 100 and x["ProductID"] == 11)
    assert r["TotalPrice"] == Decimal("21.00")  # 10.50 * 2
    assert r["CustomerID"] == 1 and r["StoreID"] == 7


def test_star_join_resolves_surrogates_and_drops_unmatched(spark, star):
    orders, details, dim_c, dim_s, dim_p = star
    dim_dates = generate_dim_dates(spark)
    fact = populate_fact(
        build_staging_fact(orders, details), dim_c, dim_s, dim_p, dim_dates
    ).collect()
    # order 102 (customer 9, not in dim) drops out: inner-join FK resolution
    assert sorted({r["OrderID"] for r in fact}) == [100, 101]
    r = next(x for x in fact if x["OrderID"] == 101)
    assert r["CustomerKey"] == 2  # surrogate, not business key
    assert r["OrderDateKey"] == 20230205
    assert r["TotalPrice"] == Decimal("42.00")


def test_expired_dim_rows_not_joinable(spark, star):
    """Only current dim rows resolve FKs (populate_fact.py:124)."""
    orders, details, dim_c, dim_s, dim_p = star
    # re-version customer 1 on a later run date -> old row expired
    batch = spark.createDataFrame([(1, "ann2")], "CustomerID int, Name string")
    dim_c2 = scd2_upsert(
        dim_c, batch, "CustomerID", ["CustomerID", "Name"], "CustomerKey",
        run_date=dt.date(2023, 6, 1),
    )
    fact = populate_fact(
        build_staging_fact(orders, details),
        dim_c2,
        dim_s,
        dim_p,
        generate_dim_dates(spark),
    ).collect()
    keys = {r["OrderID"]: r["CustomerKey"] for r in fact}
    # customer 1 resolves to the NEW surrogate key (3), not the expired row
    assert keys[100] == 3
