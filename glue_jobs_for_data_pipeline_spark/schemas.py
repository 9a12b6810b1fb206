"""Schema registry + dict-driven table configs.

The reference drives generic DDL/DML off python dicts of column names
(reference: dynamic_upsert.py:9-26, validate_data.py:49-55). Here the
same genericity is a registry of typed StructTypes plus a ``TableConfig``
per table (business key, compared columns, dimension shape) that the
generic operators (validation, SCD2 upsert, fact load) consume.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import types as T

# --------------------------------------------------------------------------
# Reference source-table schemas (reference: dynamic_upsert.py:9-15,
# validate_data.py:49-55; orderdetails.UnitPrice per Dataflow.jpg +
# populate_fact.py:110 — see SURVEY §2.9 M2).
# --------------------------------------------------------------------------

CUSTOMERS = T.StructType(
    [
        T.StructField("CustomerID", T.IntegerType(), False),
        T.StructField("FirstName", T.StringType(), False),
        T.StructField("LastName", T.StringType(), False),
        T.StructField("Email", T.StringType(), False),
        T.StructField("Address", T.StringType(), False),
        T.StructField("City", T.StringType(), False),
        T.StructField("State", T.StringType(), False),
        T.StructField("ZipCode", T.StringType(), False),
    ]
)

PRODUCTS = T.StructType(
    [
        T.StructField("ProductID", T.IntegerType(), False),
        T.StructField("ProductName", T.StringType(), False),
        T.StructField("Category", T.StringType(), False),
        T.StructField("Description", T.StringType(), False),
        T.StructField("Price", T.DecimalType(8, 2), False),
    ]
)

STORES = T.StructType(
    [
        T.StructField("StoreID", T.IntegerType(), False),
        T.StructField("StoreName", T.StringType(), False),
        T.StructField("Address", T.StringType(), False),
        T.StructField("City", T.StringType(), False),
        T.StructField("State", T.StringType(), False),
        T.StructField("ZipCode", T.StringType(), False),
    ]
)

ORDERS = T.StructType(
    [
        T.StructField("OrderID", T.IntegerType(), False),
        T.StructField("CustomerID", T.IntegerType(), False),
        T.StructField("StoreID", T.IntegerType(), False),
        T.StructField("OrderDate", T.DateType(), False),
    ]
)

ORDERDETAILS = T.StructType(
    [
        T.StructField("OrderID", T.IntegerType(), False),
        T.StructField("ProductID", T.IntegerType(), False),
        T.StructField("Quantity", T.IntegerType(), False),
        T.StructField("UnitPrice", T.DecimalType(8, 2), False),
    ]
)

SOURCE_SCHEMAS: dict[str, T.StructType] = {
    "customers": CUSTOMERS,
    "products": PRODUCTS,
    "stores": STORES,
    "orders": ORDERS,
    "orderdetails": ORDERDETAILS,
}


# --------------------------------------------------------------------------
# Table configs: the analog of the reference's relational_columns /
# dimensional_columns dicts (dynamic_upsert.py:9-26).
# --------------------------------------------------------------------------


@dataclass(frozen=True)
class TableConfig:
    """Dict-driven genericity: one config drives validate/upsert/fact ops."""

    name: str
    business_key: str
    columns: tuple[str, ...]  # source attribute columns (incl. business key)
    surrogate_key: str | None = None  # set for dimension-backed tables
    not_null: tuple[str, ...] = ()  # columns the validator asserts NOT NULL

    @property
    def dim_name(self) -> str:
        return f"dim_{self.name}"

    @property
    def is_dimension(self) -> bool:
        return self.surrogate_key is not None


def _cfg(name: str, schema: T.StructType, surrogate: str | None) -> TableConfig:
    cols = tuple(f.name for f in schema.fields)
    return TableConfig(
        name=name,
        business_key=cols[0],  # first-column PK rule (validate_data.py:63)
        columns=cols,
        surrogate_key=surrogate,
        not_null=cols,
    )


TABLES: dict[str, TableConfig] = {
    "customers": _cfg("customers", CUSTOMERS, "CustomerKey"),
    "products": _cfg("products", PRODUCTS, "ProductKey"),
    "stores": _cfg("stores", STORES, "StoreKey"),
    "orders": _cfg("orders", ORDERS, None),
    "orderdetails": _cfg("orderdetails", ORDERDETAILS, None),
}

# SCD-2 audit columns (dynamic_upsert.py:16-20): surrogate key + validity window.
SCD2_START = "StartDate"
SCD2_END = "EndDate"
CURRENT_ROW_SENTINEL = "9999-12-31"  # dynamic_upsert.py:131,138

# --------------------------------------------------------------------------
# Driver testdata registry (TPC-H-ish; /root/repo/TESTDATA.md).
# --------------------------------------------------------------------------

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# --------------------------------------------------------------------------
# Declared VARCHAR lengths from the warehouse DDL (reference:
# dynamic_upsert.py:17-25 — every string column is VARCHAR(50) except
# ZipCode VARCHAR(10)). Spark's StringType carries no length, so the
# bound lives here as data and operators/validation.py::varchar_enforce
# applies it explicitly (SURVEY §1.2's optional enforcement residue).
# --------------------------------------------------------------------------

VARCHAR_LIMITS: dict[str, dict[str, int]] = {
    "customers": {
        "FirstName": 50, "LastName": 50, "Email": 50, "Address": 50,
        "City": 50, "State": 50, "ZipCode": 10,
    },
    "products": {"ProductName": 50, "Category": 50, "Description": 50},
    "stores": {
        "StoreName": 50, "Address": 50, "City": 50, "State": 50,
        "ZipCode": 10,
    },
}
