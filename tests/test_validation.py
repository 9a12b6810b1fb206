"""V1-V4 unit tests on hand-built rows (FIXTURES.md §A3 edge cases)."""

from __future__ import annotations

import pytest

from glue_jobs_for_data_pipeline_spark.operators.validation import (
    ValidationError,
    null_counts,
    pk_duplicates,
    validate_or_raise,
    validation_report,
)


@pytest.fixture(scope="module")
def dirty(spark):
    rows = [
        (1, "a", None),
        (2, None, 10.0),
        (2, "c", 20.0),  # duplicate PK 2
        (3, "d", None),
    ]
    return spark.createDataFrame(rows, "id int, name string, score double")


def test_null_counts_single_pass(dirty):
    row = null_counts(dirty).collect()[0]
    assert row["id"] == 0
    assert row["name"] == 1
    assert row["score"] == 2


def test_pk_duplicates(dirty):
    dups = pk_duplicates(dirty, "id").collect()
    assert [(r["id"], r["dup_count"]) for r in dups] == [(2, 2)]


def test_pk_duplicates_composite(spark):
    df = spark.createDataFrame(
        [(1, 1), (1, 2), (1, 2)], "a int, b int"
    )
    dups = pk_duplicates(df, ["a", "b"]).collect()
    assert [(r["a"], r["b"], r["dup_count"]) for r in dups] == [(1, 2, 2)]


def test_validation_report_shape(dirty):
    rows = validation_report(dirty, "t", "id").collect()
    checks = {r["check_name"]: r["violation_count"] for r in rows}
    assert checks == {
        "not_null_id": 0,
        "not_null_name": 1,
        "not_null_score": 2,
        "pk_unique_id": 1,
    }
    assert all(r["table_name"] == "t" for r in rows)


def test_validate_or_raise(dirty, spark):
    with pytest.raises(ValidationError, match="not_null_name=1"):
        validate_or_raise(dirty, "t", "id")
    clean = spark.createDataFrame([(1, "x"), (2, "y")], "id int, name string")
    validate_or_raise(clean, "t", "id")  # no raise
