"""Snapshot diff: classification correctness, fingerprint-vs-exact
agreement, schema-evolution column handling."""

from __future__ import annotations

from pyspark.sql import functions as F

from glue_jobs_for_data_pipeline_spark.operators.snapshot import snapshot_diff


def _frames(spark):
    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0), (4, None, 40.0)],
        "id long, s string, v double",
    )
    new = spark.createDataFrame(
        [
            (1, "a", 10.0),  # unchanged
            (2, "B", 20.0),  # s changed
            (4, "d", 40.0),  # NULL -> value
            (5, "e", 50.0),  # inserted
        ],  # 3 deleted
        "id long, s string, v double",
    )
    return old, new


def test_diff_classifies_all_change_types(spark):
    old, new = _frames(spark)
    got = {
        r["id"]: r["change_type"]
        for r in snapshot_diff(old, new, keys=["id"]).collect()
    }
    assert got == {2: "update", 3: "delete", 4: "update", 5: "insert"}


def test_exact_and_fingerprint_modes_agree(spark):
    old, new = _frames(spark)
    fp = {
        (r["id"], r["change_type"])
        for r in snapshot_diff(old, new, keys=["id"]).collect()
    }
    ex = {
        (r["id"], r["change_type"])
        for r in snapshot_diff(old, new, keys=["id"], exact=True).collect()
    }
    assert fp == ex


def test_diff_ignores_one_sided_columns(spark):
    """Schema evolution: a column only the new snapshot has must not
    flag every row as updated."""
    old = spark.createDataFrame([(1, 10.0)], "id long, v double")
    new = spark.createDataFrame(
        [(1, 10.0, "extra")], "id long, v double, note string"
    )
    assert snapshot_diff(old, new, keys=["id"]).count() == 0
    # ...unless explicitly requested (then it reads as a change)
    got = snapshot_diff(
        old,
        new.withColumn("v", F.col("v") + 1),
        keys=["id"],
        compare_cols=["v"],
    ).collect()
    assert [(r["id"], r["change_type"]) for r in got] == [(1, "update")]


def test_fingerprint_distinguishes_null_position_swap(spark):
    """xxhash64 skips NULL inputs, so without the interleaved null
    flags (NULL, 'x') -> ('x', NULL) would hash identically and the
    swap would be silently classified unchanged."""
    old = spark.createDataFrame([(1, None, "x")], "id long, a string, b string")
    new = spark.createDataFrame([(1, "x", None)], "id long, a string, b string")
    got = snapshot_diff(old, new, keys=["id"]).collect()
    assert [(r["id"], r["change_type"]) for r in got] == [(1, "update")]


def test_null_transitions_are_updates(spark):
    old = spark.createDataFrame([(1, None), (2, "x")], "id long, s string")
    new = spark.createDataFrame([(1, "y"), (2, None)], "id long, s string")
    got = {
        r["id"]: r["change_type"]
        for r in snapshot_diff(old, new, keys=["id"], exact=True).collect()
    }
    assert got == {1: "update", 2: "update"}


def test_pure_link_table_presence_only(spark):
    """Every shared column is a key (membership table): classification
    is presence-only — insert/delete, never update, and the fingerprint
    path must not call xxhash64 with zero args (ADVICE r09)."""
    old = spark.createDataFrame([(1, 10), (2, 20)], "a long, b long")
    new = spark.createDataFrame([(2, 20), (3, 30)], "a long, b long")
    for exact in (False, True):
        got = {
            (r["a"], r["b"]): r["change_type"]
            for r in snapshot_diff(
                old, new, keys=["a", "b"], exact=exact
            ).collect()
        }
        assert got == {(1, 10): "delete", (3, 30): "insert"}


def test_changed_payloads_returns_delta_wide_rows(spark):
    from glue_jobs_for_data_pipeline_spark.operators.snapshot import (
        changed_payloads,
    )

    old = spark.createDataFrame(
        [(1, 10.0, "a"), (2, 20.0, "b"), (3, 30.0, "c")],
        "id long, v double, w string",
    )
    new = spark.createDataFrame(
        [(1, 10.0, "a"), (2, 21.0, "b"), (4, 40.0, "d")],
        "id long, v double, w string",
    )
    manifest = snapshot_diff(old, new, keys=["id"], exact=True)
    got = {
        (r["id"], r["v"], r["w"])
        for r in changed_payloads(new, manifest, keys=["id"]).collect()
    }
    # update (2) and insert (4) payloads from NEW; delete (3) has no
    # new-side payload; unchanged (1) excluded
    assert got == {(2, 21.0, "b"), (4, 40.0, "d")}
    dels = changed_payloads(
        new, manifest, keys=["id"], change_types=("delete",)
    ).count()
    assert dels == 0
