"""Incremental aggregate maintenance: merge == full recompute, batch
order irrelevance, bootstrap, and atomic versioning."""

from __future__ import annotations

from pyspark.sql import functions as F

from glue_jobs_for_data_pipeline_spark.operators import incremental
from glue_jobs_for_data_pipeline_spark.sources import txn
from glue_jobs_for_data_pipeline_spark.sources.readers import load_table


def _final(df):
    return sorted(
        (r["o_orderstatus"], r["n_rows"], str(r["sum_price"]))
        for r in df.collect()
    )


def test_incremental_equals_full_recompute_any_batch_order(spark, sf_dir, tmp_path):
    o = load_table(spark, sf_dir, "orders")
    keys, sums = ["o_orderstatus"], {"o_totalprice": "sum_price"}
    batches = [o.filter(F.col("o_orderkey") % 3 == i) for i in range(3)]

    full = incremental.partial_aggs(o, keys, sums)

    d1 = str(tmp_path / "r1")
    for b in batches:
        incremental.refresh_rollup(spark, d1, b, keys, sums)
    d2 = str(tmp_path / "r2")
    for b in reversed(batches):
        incremental.refresh_rollup(spark, d2, b, keys, sums)

    assert (
        _final(txn.read_committed(spark, d1))
        == _final(txn.read_committed(spark, d2))
        == _final(full)
    )
    # one committed version per refresh: every merge was an atomic commit
    assert txn.current_version(d1) == 3


def test_merge_passes_through_one_sided_keys(spark):
    keys, measures = ["k"], ["s"]
    a = spark.createDataFrame(
        [("x", 2, 10.0), ("y", 1, 5.0)], "k string, n_rows long, s double"
    )
    b = spark.createDataFrame([("z", 4, 7.0)], "k string, n_rows long, s double")
    out = {
        r["k"]: (r["n_rows"], r["s"])
        for r in incremental.merge_aggs(a, b, keys, measures).collect()
    }
    assert out == {"x": (2, 10.0), "y": (1, 5.0), "z": (4, 7.0)}
