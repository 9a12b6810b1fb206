"""Plan + semantics audits for the TPC-H completion pack
(plans/tpch_pack.py). The value-level correctness of every query is
covered by the DuckDB differential sweep (tools/oracle_check.py, all 16
keys oracle-checked); these tests pin the SCALE properties the sweep
cannot see — broadcast choices, pushdown, shuffle counts — plus the two
semantic corners that are easy to silently regress (Q13's zero bucket,
Q15's exact-decimal MAX tie).
"""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from glue_jobs_for_data_pipeline_spark.plans import tpch_pack as tp


def _plan(df) -> str:
    # formatted mode prints PushedFilters un-truncated (plain
    # executedPlan().toString() cuts each field at 100 chars, which
    # silently breaks column-name assertions on wide filter lists)
    qe = df._jdf.queryExecution()
    mode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode
    return qe.explainString(mode.fromString("formatted"))


def _pushed(plan: str) -> list[str]:
    return re.findall(r"PushedFilters: \[[^\]]*\]", plan)


def test_q6_is_pure_scan_agg(spark, sf_dir):
    plan = _plan(tp.x_olap_q6_style(spark, sf_dir))
    # no join of any kind; the only exchange is the single-partition
    # global partial-agg (no keyed shuffle at all)
    assert "Join" not in plan
    assert "Exchange hashpartitioning" not in plan
    assert "SinglePartition" in plan
    # date + quantity predicates reach the parquet scan
    assert any("l_quantity" in p for p in _pushed(plan)), _pushed(plan)


def test_q9_all_dims_broadcast_fact_shuffles_once(spark, sf_dir):
    plan = _plan(tp.x_olap_q9_style(spark, sf_dir))
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    assert "BroadcastHashJoin" in plan
    # the LIKE filter prunes part BEFORE its broadcast ships
    assert any("p_name" in p for p in _pushed(plan)), _pushed(plan)
    # fact side: exactly one keyed shuffle (the nation×year groupBy;
    # AQE may add a coalesce read but not a second hashpartitioning)
    assert plan.count("Exchange hashpartitioning") <= 1


def test_q19_pushdown_and_broadcast(spark, sf_dir):
    plan = _plan(tp.x_olap_q19_style(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # the factored-out single-table conjuncts reach both scans: the
    # quantity hull on lineitem, the brand/size union on part
    assert any("l_quantity" in p for p in _pushed(plan)), _pushed(plan)
    assert any("p_brand" in p for p in _pushed(plan)), _pushed(plan)


def test_q4_semi_join_no_duplication(spark, sf_dir):
    df = tp.x_olap_q4_style(spark, sf_dir)
    plan = _plan(df)
    # EXISTS must stay a semi join at the physical level — an inner
    # join would double-count orders with several late lines
    assert "LeftSemi" in plan, plan
    total = df.agg(F.sum("order_count")).collect()[0][0]
    # semi-join cardinality can never exceed the filtered orders count
    from glue_jobs_for_data_pipeline_spark.sources.readers import load_table

    n_orders = (
        load_table(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
        )
        .count()
    )
    assert total <= n_orders


def test_q13_customers_with_zero_orders_are_counted(spark, sf_dir):
    """The LEFT OUTER + filter-inside-join-condition contract: every
    customer appears in exactly one bucket, so custdist sums to the
    full customer count even when some customers match no orders."""
    from glue_jobs_for_data_pipeline_spark.sources.readers import load_table

    df = tp.x_olap_q13_style(spark, sf_dir)
    total_custs = df.agg(F.sum("custdist")).collect()[0][0]
    assert total_custs == load_table(spark, sf_dir, "customer").count()


def test_q15_returns_exactly_the_argmax_suppliers(spark, sf_dir):
    rows = tp.x_olap_q15_style(spark, sf_dir).collect()
    assert len(rows) >= 1
    revs = {r["total_rev"] for r in rows}
    assert len(revs) == 1  # all returned suppliers share the max revenue


def test_q21_single_conditional_agg_over_fact(spark, sf_dir):
    plan = _plan(tp.x_olap_q21_style(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the decorrelated shape: the F-order status filter reaches the
    # orders scan; the nation filter reaches the nation scan
    assert any("o_orderstatus" in p for p in _pushed(plan)), _pushed(plan)


def test_q22_anti_join_and_date_pruned_orders(spark, sf_dir):
    plan = _plan(tp.x_olap_q22_style(spark, sf_dir))
    assert "LeftAnti" in plan, plan
    # 'no RECENT order' — the date bound prunes the orders scan before
    # the anti join, so the anti side is a fraction of the table
    assert any("o_orderdate" in p for p in _pushed(plan)), _pushed(plan)


def test_q2_min_is_per_part_not_global(spark, sf_dir):
    """Every returned (part, supplier) row carries that PART's min
    balance — two parts with different mins must both survive."""
    rows = tp.x_olap_q2_style(spark, sf_dir).collect()
    if len(rows) >= 2:
        by_part = {}
        for r in rows:
            by_part.setdefault(r["p_partkey"], set()).add(r["acctbal"])
        # one min value per part
        assert all(len(v) == 1 for v in by_part.values())
