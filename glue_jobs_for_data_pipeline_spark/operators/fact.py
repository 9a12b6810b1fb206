"""Fact-table population (SURVEY §2.9 M2; reference populate_fact.py:89-136).

Two stages, collapsed into lazy DataFrame expressions (no physical
staging table, S4/S7 removed):

  1. staging_fact_orders: Orders JOIN OrderDetails on OrderID with the
     derived measures UnitPrice = od.Price and
     TotalPrice = od.Price * od.Quantity  (populate_fact.py:109-112, J1+P2)
  2. fact_orders: resolve business keys -> surrogate keys through the
     4-dimension star join restricted to current dim rows
     (EndDate = '9999-12-31') and OrderDate -> DateKey
     (populate_fact.py:117-124, J2+P4+P5)

Scale posture: the fact side is the 100TB table; the catalog-bounded
dims (stores, products, the 731-row date calendar) are broadcast-
hinted, so those star legs are map-side-only with NO shuffle of the
fact. The SF-proportional customer dim is left to AQE (see
populate_fact) — at fixture scale it still broadcasts, at 100 TB it
degrades to a key-only shuffled join instead of a forced driver-side
hash-relation build. The current-row filter is applied to each dim
BEFORE the broadcast so only current rows ship. Output is
partitionable by OrderDateKey for downstream partition pruning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..schemas import CURRENT_ROW_SENTINEL, SCD2_END


def build_staging_fact(orders: DataFrame, orderdetails: DataFrame) -> DataFrame:
    """Stage 1 (J1+P2): order lines with derived measures.

    ``SELECT o.OrderID, o.CustomerID, o.StoreID, od.ProductID,
    od.Quantity, od.Price, od.Price*od.Quantity, o.OrderDate
    FROM Orders o JOIN OrderDetails od ON o.OrderID = od.OrderID``
    (populate_fact.py:109-112). TotalPrice keeps DECIMAL semantics (F11).
    """
    return (
        orderdetails.join(orders, on="OrderID", how="inner")
        .select(
            "OrderID",
            "CustomerID",
            "StoreID",
            "ProductID",
            "Quantity",
            "UnitPrice",
            (F.col("UnitPrice") * F.col("Quantity"))
            .cast("decimal(18,2)")
            .alias("TotalPrice"),
            "OrderDate",
        )
    )


def current_rows(dim: DataFrame) -> DataFrame:
    """P4: the current-version filter (EndDate = '9999-12-31',
    populate_fact.py:124)."""
    return dim.filter(F.col(SCD2_END) == F.lit(CURRENT_ROW_SENTINEL).cast("date"))


def populate_fact(
    staging: DataFrame,
    dim_customers: DataFrame,
    dim_stores: DataFrame,
    dim_products: DataFrame,
    dim_dates: DataFrame,
) -> DataFrame:
    """Stage 2 (J2): business->surrogate key resolution via the star join.

    ``INSERT INTO fact_orders SELECT s.OrderID, dc.CustomerKey,
    ds.StoreKey, dp.ProductKey, s.Quantity, s.UnitPrice, s.TotalPrice,
    dd.DateKey FROM staging s JOIN dim_customers dc ON ... JOIN
    dim_stores ... JOIN dim_products ... JOIN dim_dates dd ON
    s.OrderDate = dd.Date WHERE <current-row filters>``
    (populate_fact.py:117-124). Current-row filters are pushed below the
    broadcast, not left as residual WHERE predicates.

    Broadcast policy (size-gated, r11): only the CATALOG-BOUNDED dims
    carry an explicit broadcast hint — stores and products are catalog
    tables, dim_dates is the generated 731-row calendar (S8). The
    customer dim is SF-PROPORTIONAL (it grows with the business, like
    TPC-H customer: ~SF x 150k current rows), and F.broadcast bypasses
    autoBroadcastJoinThreshold, so forcing it would mandate a
    driver-side build of a multi-GB hash relation at 100 TB — the same
    hazard removed from x_validate_fk_cascade in r10
    (plans/metrics_pack.py: only region/nation hinted). AQE decides for
    customers instead: below the threshold it still broadcasts (the
    plan test pins BHJ at fixture scale), past it it degrades to a
    shuffled hash join of two key columns, never a driver collapse.
    """
    dc = current_rows(dim_customers).select("CustomerID", "CustomerKey")
    ds = F.broadcast(current_rows(dim_stores).select("StoreID", "StoreKey"))
    dp = F.broadcast(current_rows(dim_products).select("ProductID", "ProductKey"))
    dd = F.broadcast(dim_dates.select(F.col("Date").alias("OrderDate"), "DateKey"))
    return (
        staging.join(dc, "CustomerID", "inner")
        .join(ds, "StoreID", "inner")
        .join(dp, "ProductID", "inner")
        .join(dd, "OrderDate", "inner")
        .select(
            "OrderID",
            "CustomerKey",
            "StoreKey",
            "ProductKey",
            "Quantity",
            "UnitPrice",
            "TotalPrice",
            F.col("DateKey").alias("OrderDateKey"),
        )
    )
