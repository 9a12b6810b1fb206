"""Bucketed co-located joins: persisting both sides bucketed on the join
key removes both shuffle Exchanges from the sort-merge join — the
one-time-write-vs-recurring-shuffle trade SCALE.md describes."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from glue_jobs_for_data_pipeline_spark.sources.readers import (
    load_table,
    write_bucketed,
)


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ path
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"), "l_quantity"
    )
    write_bucketed(orders, "b_orders", "o_orderkey", 8, sort_col="o_orderkey")
    write_bucketed(li, "b_lineitem", "o_orderkey", 8, sort_col="o_orderkey")
    yield spark.table("b_orders"), spark.table("b_lineitem")
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_has_no_shuffle(spark, sf_dir, bucketed_tables):
    b_orders, b_li = bucketed_tables
    joined = b_orders.join(b_li, "o_orderkey")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan[:500]}"
    # and it returns the same rows as the plain-path join
    plain = (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey")
        .join(
            load_table(spark, sf_dir, "lineitem").select(
                F.col("l_orderkey").alias("o_orderkey")
            ),
            "o_orderkey",
        )
        .count()
    )
    assert joined.count() == plain


def test_catalog_bucketed_join_query_is_exchange_free(spark, sf_dir):
    """The registered x_storage_bucketed_join (r14): the SMJ both
    Exchanges AND both explicit Sorts eliminated by the bucketed+sorted
    layout, end to end through the catalog query itself."""
    from glue_jobs_for_data_pipeline_spark.plans import catalog_ext  # noqa: F401
    from glue_jobs_for_data_pipeline_spark.plans.catalog import QUERIES

    df = QUERIES["x_storage_bucketed_join"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan, plan[:800]
    # the join input side must carry no shuffle; the only allowed
    # Exchange is the one feeding the final groupBy aggregation
    join_part = plan.split("SortMergeJoin", 1)[1]
    assert "Exchange" not in join_part, f"bucketed join shuffled:\n{join_part[:800]}"
    rows = {r["c_mktsegment"]: r["n_orders"] for r in df.collect()}
    assert sum(rows.values()) == load_table(spark, sf_dir, "orders").count()
