"""merge_into: three-clause MERGE semantics on plain DataFrames."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from glue_jobs_for_data_pipeline_spark.operators.merge import merge_into


def _target(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "k long, name string, bal double",
    )


def test_merge_update_delete_insert_unchanged(spark):
    src = spark.createDataFrame(
        [(1, "U", "a2", 11.0), (2, "D", "b", 0.0), (9, "I", "new", 1.0)],
        "k long, op string, name string, bal double",
    )
    out = {
        r["k"]: (r["name"], r["bal"])
        for r in merge_into(
            _target(spark), src, "k",
            update_set={"name": F.col("src.name"), "bal": F.col("src.bal")},
            update_cond=F.col("src.op") == "U",
            delete_cond=F.col("src.op") == "D",
        ).collect()
    }
    assert out == {
        1: ("a2", 11.0),   # updated
        3: ("c", 30.0),    # untouched target row
        9: ("new", 1.0),   # inserted (op column dropped)
    }


def test_merge_delete_wins_over_update(spark):
    # both clause conditions true for the row -> delete first (Delta
    # first-matching-clause order as documented)
    src = spark.createDataFrame(
        [(1, "X", "z", 0.0)], "k long, op string, name string, bal double"
    )
    out = merge_into(
        _target(spark), src, "k",
        update_set={"name": F.col("src.name")},
        update_cond=F.col("src.op") == "X",
        delete_cond=F.col("src.op") == "X",
    ).collect()
    assert sorted(r["k"] for r in out) == [2, 3]


def test_merge_no_insert_flag(spark):
    src = spark.createDataFrame(
        [(9, "I", "new", 1.0)], "k long, op string, name string, bal double"
    )
    out = merge_into(
        _target(spark), src, "k",
        update_set={}, insert=False,
    ).collect()
    assert sorted(r["k"] for r in out) == [1, 2, 3]


def test_merge_missing_insert_cols_become_null(spark):
    src = spark.createDataFrame([(9,)], "k long")  # no name/bal cols
    out = {r["k"]: (r["name"], r["bal"]) for r in merge_into(
        _target(spark), src, "k", update_set={},
    ).collect()}
    assert out[9] == (None, None)


def test_merge_null_clause_condition_leaves_row_unchanged(spark):
    """A NULL clause condition means 'clause not satisfied', never
    delete/update — the three-valued-logic trap ADVICE r06 flagged:
    `~(matched & NULL)` is NULL, which filter() would drop."""
    src = spark.createDataFrame(
        [(1, None, "z", 99.0), (2, "D", "b", 0.0)],
        "k long, op string, name string, bal double",
    )
    out = {
        r["k"]: (r["name"], r["bal"])
        for r in merge_into(
            _target(spark), src, "k",
            update_set={"name": F.col("src.name"), "bal": F.col("src.bal")},
            update_cond=F.col("src.op") == "U",   # NULL op -> NULL cond
            delete_cond=F.col("src.op") == "D",   # NULL op -> NULL cond
        ).collect()
    }
    # row 1: NULL op satisfies neither clause -> untouched, NOT deleted
    assert out == {1: ("a", 10.0), 3: ("c", 30.0)}


def test_merge_duplicate_source_keys_raise(spark):
    src = spark.createDataFrame(
        [(1, "U", "x", 1.0), (1, "U", "y", 2.0)],
        "k long, op string, name string, bal double",
    )
    with pytest.raises(ValueError, match="duplicate keys"):
        merge_into(
            _target(spark), src, "k",
            update_set={"name": F.col("src.name")},
        )
