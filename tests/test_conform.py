"""conform_schema: rename/fill/widen/reject policy."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from glue_jobs_for_data_pipeline_spark.sources.conform import conform_schema


def _target():
    return T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("name", T.StringType()),
            T.StructField("price", T.DoubleType()),
            T.StructField("note", T.StringType()),
        ]
    )


def test_rename_fill_widen_and_order(spark):
    df = spark.createDataFrame(
        [(1, "a", 1.5, "x")],
        "k int, legacy_name string, price float, extra string",
    )
    out = conform_schema(df, _target(), renames={"legacy_name": "name"})
    assert [f.name for f in out.schema.fields] == ["k", "name", "price", "note"]
    assert out.schema["k"].dataType == T.LongType()
    assert out.schema["price"].dataType == T.DoubleType()
    row = out.collect()[0]
    assert (row["k"], row["name"], row["note"]) == (1, "a", None)
    assert "extra" not in out.columns  # feed extras dropped


def test_narrowing_rejected_with_column_name(spark):
    df = spark.createDataFrame([(1,)], "k string")
    with pytest.raises(ValueError, match="'k' is string.*bigint"):
        conform_schema(df, T.StructType([T.StructField("k", T.LongType())]))
    df2 = spark.createDataFrame([(1,)], "k bigint")
    with pytest.raises(ValueError, match="not a safe widening"):
        conform_schema(df2, T.StructType([T.StructField("k", T.IntegerType())]))


def test_decimal_widening_rules(spark):
    from decimal import Decimal

    df = spark.createDataFrame([(Decimal("1.00"),)], "v decimal(10,2)")
    ok = conform_schema(
        df, T.StructType([T.StructField("v", T.DecimalType(18, 4))])
    )
    assert ok.schema["v"].dataType == T.DecimalType(18, 4)
    with pytest.raises(ValueError):  # integer digits would shrink
        conform_schema(
            df, T.StructType([T.StructField("v", T.DecimalType(10, 4))])
        )


def test_missing_rename_source_rejected(spark):
    df = spark.createDataFrame([(1,)], "k bigint")
    with pytest.raises(ValueError, match="rename sources absent"):
        conform_schema(
            df,
            T.StructType([T.StructField("k", T.LongType())]),
            renames={"nope": "k"},
        )


def test_case_insensitive_resolution_and_ambiguity(spark):
    """Spark resolves names case-insensitively by default; conformance
    must too (a case-variant feed column passes through under the
    target's spelling, not silently nulled), and source columns
    differing only by case are rejected as ambiguous."""
    df = spark.createDataFrame([(1, "a")], "K int, NAME string")
    out = conform_schema(
        df,
        T.StructType(
            [
                T.StructField("k", T.LongType()),
                T.StructField("name", T.StringType()),
            ]
        ),
    )
    assert out.columns == ["k", "name"]
    assert out.collect()[0]["k"] == 1  # widened + re-spelled, NOT nulled
    dup = spark.createDataFrame([(1, 2)], "k int, K int")
    with pytest.raises(ValueError, match="differ only by case"):
        conform_schema(
            dup, T.StructType([T.StructField("k", T.LongType())])
        )
