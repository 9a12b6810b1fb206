"""Property-based SCD-2 invariants (SURVEY §5): for ANY sequence of naive
upserts — exactly one current row per ever-seen key, validity intervals
ordered, surrogate keys unique, and version counts equal to the number
of batches mentioning the key (the naive re-versioning semantics,
dynamic_upsert.py:128-139)."""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from glue_jobs_for_data_pipeline_spark.operators.scd2 import scd2_upsert

SENTINEL = dt.date(9999, 12, 31)
COLS = ["CustomerID", "Name"]

batch_strategy = st.lists(
    st.tuples(st.integers(min_value=1, max_value=6), st.sampled_from("abc")),
    min_size=1,
    max_size=6,
    unique_by=lambda kv: kv[0],  # one row per key per batch
)


@settings(
    max_examples=8,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(batches=st.lists(batch_strategy, min_size=1, max_size=3))
def test_scd2_invariants_hold_for_any_upsert_sequence(spark, batches):
    dim = None
    for i, rows in enumerate(batches):
        src = spark.createDataFrame(rows, "CustomerID int, Name string")
        dim = scd2_upsert(
            dim, src, "CustomerID", COLS, "CustomerKey",
            run_date=dt.date(2024, 1, 1) + dt.timedelta(days=31 * i),
        )
        dim = spark.createDataFrame(dim.collect(), dim.schema)  # pin state

    out = dim.collect()
    seen_keys = {k for rows in batches for k, _ in rows}
    by_key: dict[int, list] = {}
    for r in out:
        by_key.setdefault(r["CustomerID"], []).append(r)

    assert set(by_key) == seen_keys
    surrogates = [r["CustomerKey"] for r in out]
    assert len(set(surrogates)) == len(surrogates), "surrogate keys not unique"
    for key, versions in by_key.items():
        current = [r for r in versions if r["EndDate"] == SENTINEL]
        assert len(current) == 1, f"key {key}: {len(current)} current rows"
        # naive mode: one version per batch that mentioned the key
        mentions = sum(1 for rows in batches if any(k == key for k, _ in rows))
        assert len(versions) == mentions
        for r in versions:
            assert r["StartDate"] <= r["EndDate"]
        ordered = sorted(versions, key=lambda r: r["StartDate"])
        for a, b in zip(ordered, ordered[1:]):
            assert a["EndDate"] <= b["StartDate"], f"key {key} overlap"
