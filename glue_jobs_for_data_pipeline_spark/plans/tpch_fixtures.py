"""Map the driver's TPC-H-ish testdata onto the reference's star-schema roles.

FIXTURES.md §B: customers<-customer, products<-part, stores<-supplier,
orders<-orders, orderdetails<-lineitem. Pure renames/casts (pass-through
values) so the DuckDB oracle can state the same mapping in SQL.

Fixed run dates (1995-01-01 initial load, 1995-06-01 second batch) stand
in for the reference's wall-clock ``current_date`` (SURVEY F8/F10
determinism rule).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.readers import load_table

INITIAL_LOAD_DATE = dt.date(1995, 1, 1)
SECOND_BATCH_DATE = dt.date(1995, 6, 1)

CUSTOMER_COLS = ("CustomerID", "Name", "NationKey", "AcctBal", "MktSegment")
PRODUCT_COLS = ("ProductID", "ProductName", "Brand", "PType", "Size", "Price")
STORE_COLS = ("StoreID", "StoreName", "NationKey", "AcctBal")

# dim_dates fixture range: covers o_orderdate 1995-01-01 .. 2001-08-01
DATES_START = dt.date(1995, 1, 1)
DATES_DAYS = 2405


def ref_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        F.col("c_custkey").alias("CustomerID"),
        F.col("c_name").alias("Name"),
        F.col("c_nationkey").alias("NationKey"),
        F.col("c_acctbal").alias("AcctBal"),
        F.col("c_mktsegment").alias("MktSegment"),
    )


def ref_products(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.select(
        F.col("p_partkey").alias("ProductID"),
        F.col("p_name").alias("ProductName"),
        F.col("p_brand").alias("Brand"),
        F.col("p_type").alias("PType"),
        F.col("p_size").alias("Size"),
        F.col("p_retailprice").cast("decimal(12,2)").alias("Price"),
    )


def ref_stores(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier")
    return s.select(
        F.col("s_suppkey").alias("StoreID"),
        F.col("s_name").alias("StoreName"),
        F.col("s_nationkey").alias("NationKey"),
        F.col("s_acctbal").alias("AcctBal"),
    )


def ref_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        F.col("o_orderkey").alias("OrderID"),
        F.col("o_custkey").alias("CustomerID"),
        F.col("o_orderdate").cast("date").alias("OrderDate"),
    )


def ref_orderdetails(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem as orderdetails; StoreID rides at line grain (s_suppkey role)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        F.col("l_orderkey").alias("OrderID"),
        F.col("l_partkey").alias("ProductID"),
        F.col("l_suppkey").alias("StoreID"),
        F.col("l_quantity").cast("int").alias("Quantity"),
        F.col("l_extendedprice").cast("decimal(12,2)").alias("UnitPrice"),
    )


# Matching SQL fragments for the DuckDB oracle (same renames, ANSI SQL).
SQL_CUSTOMERS = (
    "SELECT c_custkey AS CustomerID, c_name AS Name, c_nationkey AS NationKey, "
    "c_acctbal AS AcctBal, c_mktsegment AS MktSegment FROM customer"
)
SQL_PRODUCTS = (
    "SELECT p_partkey AS ProductID, p_name AS ProductName, p_brand AS Brand, "
    "p_type AS PType, p_size AS Size, CAST(p_retailprice AS DECIMAL(12,2)) AS Price "
    "FROM part"
)
SQL_STORES = (
    "SELECT s_suppkey AS StoreID, s_name AS StoreName, s_nationkey AS NationKey, "
    "s_acctbal AS AcctBal FROM supplier"
)
SQL_ORDERS = (
    "SELECT o_orderkey AS OrderID, o_custkey AS CustomerID, "
    "CAST(o_orderdate AS DATE) AS OrderDate FROM orders"
)
SQL_ORDERDETAILS = (
    "SELECT l_orderkey AS OrderID, l_partkey AS ProductID, l_suppkey AS StoreID, "
    "CAST(l_quantity AS INTEGER) AS Quantity, "
    "CAST(l_extendedprice AS DECIMAL(12,2)) AS UnitPrice FROM lineitem"
)
