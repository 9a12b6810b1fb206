"""Z-order clustering keys: interleave correctness and box tightness."""

from __future__ import annotations

from glue_jobs_for_data_pipeline_spark.operators.zorder import (
    zorder_keys,
    zvalue_sql,
)


def _morton(x: int, y: int, bits: int) -> int:
    out = 0
    for i in range(bits):
        out |= ((x >> i) & 1) << (2 * i)
        out |= ((y >> i) & 1) << (2 * i + 1)
    return out


def test_zvalue_matches_reference_morton(spark):
    """The expression equals the classic bit-interleave on the full
    4-bit x 4-bit grid (bounds injected so levels are the raw values)."""
    rows = [(x, y) for x in range(16) for y in range(16)]
    df = spark.createDataFrame(rows, "a long, b long")
    out = zorder_keys(
        df, ["a", "b"], bits=4, bounds={"a": (0, 15), "b": (0, 15)}
    ).collect()
    for r in out:
        assert r["zkey"] == _morton(r["a"], r["b"], 4), (r["a"], r["b"])


def test_zvalue_sql_text_matches_expression(spark):
    """The oracle-side SQL text computes the same key as the Column
    expression (evaluated by Spark itself here — pure arithmetic)."""
    rows = [(x, y) for x in range(0, 64, 7) for y in range(0, 64, 5)]
    df = spark.createDataFrame(rows, "a long, b long")
    got = zorder_keys(
        df, ["a", "b"], bits=6, bounds={"a": (0, 63), "b": (0, 63)}
    )
    sql = zvalue_sql({"a": "a", "b": "b"}, 6)
    both = got.selectExpr("a", "b", "zkey", f"{sql} AS zkey_sql").collect()
    assert all(r["zkey"] == r["zkey_sql"] for r in both)


def test_zorder_boxes_tighter_than_single_sort(spark):
    """The property the layout exists for: bucketing by z-key high
    bits yields file boxes whose SECOND-column spans are far tighter
    than a single-column sort's (which scatters the second column over
    its whole domain)."""
    from pyspark.sql import functions as F

    rows = [(x, y) for x in range(64) for y in range(64)]
    df = spark.createDataFrame(rows, "a long, b long")
    z = zorder_keys(df, ["a", "b"], bits=6, bounds={"a": (0, 63), "b": (0, 63)})
    # 16 "files" by z prefix vs 16 files by plain a-ranges
    zspan = (
        z.groupBy(F.shiftright("zkey", 8).alias("f"))
        .agg((F.max("b") - F.min("b")).alias("bspan"))
        .agg(F.avg("bspan"))
        .first()[0]
    )
    aspan = (
        df.groupBy(F.floor(F.col("a") / 4).alias("f"))
        .agg((F.max("b") - F.min("b")).alias("bspan"))
        .agg(F.avg("bspan"))
        .first()[0]
    )
    assert zspan <= aspan / 3  # 16x16 boxes vs full-domain stripes
