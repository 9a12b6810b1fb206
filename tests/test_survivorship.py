"""golden_record: column-level survivorship fusion semantics."""

from __future__ import annotations

import pytest

from glue_jobs_for_data_pipeline_spark.operators.survivorship import (
    golden_record,
)


def _stack(spark):
    # cluster 1: three members across two "loads"; cluster 2: singleton
    return spark.createDataFrame(
        [
            (1, 101, "ann", 5.0, "1995-01-01"),
            (1, 102, "annette", None, "1995-06-01"),
            (1, 103, None, 3.0, "1995-07-01"),
            (2, 201, "bo", None, "1995-01-01"),
        ],
        "cluster long, rid long, name string, bal double, load string",
    ).selectExpr("cluster", "rid", "name", "bal", "CAST(load AS DATE) AS load")


def test_rules_fuse_independently(spark):
    out = golden_record(
        _stack(spark),
        "cluster",
        "rid",
        {"name": "longest", "bal": "non_null_latest"},
        recency_col="load",
    ).collect()
    rows = {r["cluster"]: (r["n_members"], r["name"], r["bal"]) for r in out}
    # name: longest non-null ('annette', not the newest member's NULL);
    # bal: newest NON-NULL (3.0 from the 07-01 member, not 06-01's NULL)
    # -> the golden row fuses fields from DIFFERENT members
    assert rows == {1: (3, "annette", 3.0), 2: (1, "bo", None)}


def test_latest_earliest_max_min(spark):
    out = golden_record(
        _stack(spark),
        "cluster",
        "rid",
        {"name": "latest", "bal": "max"},
        recency_col="load",
    ).collect()
    rows = {r["cluster"]: (r["name"], r["bal"]) for r in out}
    # latest carries the newest member's value EVEN IF NULL (contract);
    # max ignores nulls
    assert rows == {1: (None, 5.0), 2: ("bo", None)}
    out2 = golden_record(
        _stack(spark),
        "cluster",
        "rid",
        {"name": "earliest", "bal": "min"},
        recency_col="load",
    ).collect()
    rows2 = {r["cluster"]: (r["name"], r["bal"]) for r in out2}
    assert rows2 == {1: ("ann", 3.0), 2: ("bo", None)}


def test_partition_invariance(spark):
    df = _stack(spark)
    a = golden_record(
        df, "cluster", "rid",
        {"name": "longest", "bal": "min"}, recency_col="load",
    ).collect()
    b = golden_record(
        df.repartition(7), "cluster", "rid",
        {"name": "longest", "bal": "min"}, recency_col="load",
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_bad_rule_and_missing_recency_raise(spark):
    df = _stack(spark)
    with pytest.raises(ValueError, match="unknown survivorship rule"):
        golden_record(df, "cluster", "rid", {"name": "best"})
    with pytest.raises(ValueError, match="needs recency_col"):
        golden_record(df, "cluster", "rid", {"name": "latest"})


# --------------------------------------------------------------------------
# Property test: fusion agrees with a pure-Python reference on random
# clusters (nulls, ties, singletons included)
# --------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_rows = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=4),            # cluster
        st.one_of(st.none(), st.sampled_from(["a", "bb", "ccc", "bb"])),
        st.one_of(st.none(), st.integers(min_value=0, max_value=9)),
        st.integers(min_value=1, max_value=31),           # day of month
    ),
    min_size=1,
    max_size=12,
)


def _ref(rows, rule, col_i):
    """Pure-Python survivorship for one rule over (cluster, name,
    val, day) rows with rid = index."""
    out = {}
    by_cluster: dict = {}
    for rid, r in enumerate(rows):
        by_cluster.setdefault(r[0], []).append((rid, r))
    for c, members in by_cluster.items():
        if rule == "latest":
            k = max(members, key=lambda m: (m[1][3], m[0]))
            out[c] = k[1][col_i]
        elif rule == "non_null_latest":
            k = max(
                members,
                key=lambda m: (m[1][col_i] is not None, m[1][3], m[0]),
            )
            out[c] = k[1][col_i]
        elif rule == "max":
            k = max(
                members,
                key=lambda m: (
                    m[1][col_i] is not None,
                    m[1][col_i] if m[1][col_i] is not None else 0,
                    m[0],
                ),
            )
            out[c] = k[1][col_i]
        elif rule == "longest":
            k = max(
                members,
                key=lambda m: (
                    m[1][col_i] is not None,
                    len(m[1][col_i]) if m[1][col_i] is not None else 0,
                    m[1][col_i] if m[1][col_i] is not None else "",
                    m[0],
                ),
            )
            out[c] = k[1][col_i]
    return out


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=_rows)
def test_golden_record_agrees_with_python_reference(spark, rows):
    df = spark.createDataFrame(
        [(c, i, n, v, f"1995-01-{d:02d}") for i, (c, n, v, d) in enumerate(rows)],
        "cluster long, rid long, name string, val long, load string",
    ).selectExpr("cluster", "rid", "name", "val", "CAST(load AS DATE) AS load")
    got = {
        r["cluster"]: (r["name"], r["val"])
        for r in golden_record(
            df,
            "cluster",
            "rid",
            {"name": "longest", "val": "non_null_latest"},
            recency_col="load",
        ).collect()
    }
    want_name = _ref(rows, "longest", 1)
    want_val = _ref(rows, "non_null_latest", 2)
    assert got == {
        c: (want_name[c], want_val[c]) for c in want_name
    }
