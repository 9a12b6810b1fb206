"""End-to-end pipeline run at sf0.001 (the Glue-workflow analog, §2.12)."""

from __future__ import annotations

import shutil

import pytest

from glue_jobs_for_data_pipeline_spark.operators.validation import ValidationError
from glue_jobs_for_data_pipeline_spark.plans import tpch_fixtures as fx
from glue_jobs_for_data_pipeline_spark.plans.pipeline import (
    DimSpec,
    Pipeline,
    PipelineContext,
)

WAREHOUSE = "/tmp/spark_graft_io/test_warehouse"


def _pipeline(**kw):
    return Pipeline(
        sources={
            "customers": fx.ref_customers,
            "products": fx.ref_products,
            "stores": fx.ref_stores,
            "orders": fx.ref_orders,
            "orderdetails": fx.ref_orderdetails,
        },
        dims=[
            DimSpec("customers", "CustomerID", fx.CUSTOMER_COLS, "CustomerKey"),
            DimSpec("products", "ProductID", fx.PRODUCT_COLS, "ProductKey"),
            DimSpec("stores", "StoreID", fx.STORE_COLS, "StoreKey"),
        ],
        source_pks={"orderdetails": ["OrderID", "ProductID", "StoreID"]},
        **kw,
    )


def test_pipeline_end_to_end(spark, sf_dir):
    shutil.rmtree(WAREHOUSE, ignore_errors=True)
    ctx = PipelineContext(
        sf_dir=sf_dir,
        warehouse_dir=WAREHOUSE,
        run_date=fx.INITIAL_LOAD_DATE,
        dates_start=fx.DATES_START,
        dates_days=fx.DATES_DAYS,
    )
    res = _pipeline(lenient_sources={"orderdetails"}).run(spark, ctx)
    assert res["fact_orders"].count() > 0
    assert res["dim_dates"].count() == fx.DATES_DAYS
    # every fact FK resolves against a current dim row
    fact = res["fact_orders"]
    dimc = res["dim_customers"]
    unresolved = fact.join(
        dimc.select("CustomerKey"), "CustomerKey", "left_anti"
    ).count()
    assert unresolved == 0
    # violation report was recorded for the lenient source
    report = {
        r["check_name"]: r["violation_count"]
        for r in res["validation_orderdetails"].collect()
    }
    assert "pk_unique_OrderID_ProductID_StoreID" in report


def test_pipeline_failure_rolls_back_committed_warehouse(spark, sf_dir):
    """A run that dies mid-transaction (e.g. in the fact build) must leave
    every table's committed version exactly as the previous run left it —
    the reference's ROLLBACK (dynamic_upsert.py:159-161)."""
    from glue_jobs_for_data_pipeline_spark.sources import txn

    wh = "/tmp/spark_graft_io/test_warehouse_rollback"
    shutil.rmtree(wh, ignore_errors=True)
    ctx = PipelineContext(
        sf_dir=sf_dir, warehouse_dir=wh, run_date=fx.INITIAL_LOAD_DATE,
        dates_start=fx.DATES_START, dates_days=fx.DATES_DAYS,
    )
    p = _pipeline(lenient_sources={"orderdetails"})
    p.run(spark, ctx)
    cat = txn.Catalog(wh)
    before_head = cat.head()
    before = cat.manifest()
    fact_rows = cat.read(spark, "fact_orders").count()

    # second run dies AFTER the dims staged, before the manifest commits
    broken = _pipeline(lenient_sources={"orderdetails"})
    orig = broken.fact_orders_source
    broken.fact_orders_source = "no_such_source"
    ctx2 = PipelineContext(
        sf_dir=sf_dir, warehouse_dir=wh, run_date=fx.SECOND_BATCH_DATE,
        dates_start=fx.DATES_START, dates_days=fx.DATES_DAYS,
    )
    with pytest.raises(KeyError):
        broken.run(spark, ctx2)
    # the HEAD never moved: every table still reads as the previous run
    assert cat.head() == before_head
    assert cat.manifest() == before
    assert cat.read(spark, "fact_orders").count() == fact_rows
    broken.fact_orders_source = orig


def test_pipeline_strict_mode_aborts(spark, sf_dir):
    ctx = PipelineContext(
        sf_dir=sf_dir,
        warehouse_dir=WAREHOUSE + "_strict",
        run_date=fx.INITIAL_LOAD_DATE,
        dates_start=fx.DATES_START,
        dates_days=2,
    )
    with pytest.raises(ValidationError):
        _pipeline().run(spark, ctx)


def test_pipeline_hash_keys_and_compaction_match_rownum(spark, sf_dir):
    """The at-scale configuration (hash surrogate keys + post-commit
    compaction) must produce the same dims and fact as the reference
    rownum configuration modulo surrogate key VALUES: same row counts,
    same business columns, same fact measures per order line, and the
    fact keeps its OrderDateKey partition layout through compaction."""
    import os

    from glue_jobs_for_data_pipeline_spark.sources import txn

    wh_a = "/tmp/spark_graft_io/test_warehouse_rownum"
    wh_b = "/tmp/spark_graft_io/test_warehouse_hash"
    for wh in (wh_a, wh_b):
        shutil.rmtree(wh, ignore_errors=True)
    base = dict(
        sf_dir=sf_dir, run_date=fx.INITIAL_LOAD_DATE,
        dates_start=fx.DATES_START, dates_days=fx.DATES_DAYS,
    )
    res_a = _pipeline(lenient_sources={"orderdetails"}).run(
        spark, PipelineContext(warehouse_dir=wh_a, **base)
    )
    res_b = _pipeline(lenient_sources={"orderdetails"}).run(
        spark,
        PipelineContext(
            warehouse_dir=wh_b,
            scd2_key_mode="hash",
            compact_target_bytes=128 << 20,
            **base,
        ),
    )

    # dims: identical business content, keys differ only in value
    for dim in ("dim_customers", "dim_products", "dim_stores"):
        cols = [c for c in res_a[dim].columns if not c.endswith("Key")]
        a = sorted(map(tuple, res_a[dim].select(*cols).collect()))
        b = sorted(map(tuple, res_b[dim].select(*cols).collect()))
        assert a == b, dim

    # fact: same measures at the order-line grain (keys remapped)
    measures = ["OrderID", "ProductKey", "Quantity", "UnitPrice", "TotalPrice"]
    fa = res_a["fact_orders"]
    fb = res_b["fact_orders"]
    assert fa.count() == fb.count()
    a = sorted(
        (r["OrderID"], r["Quantity"], r["TotalPrice"], r["OrderDateKey"])
        for r in fa.collect()
    )
    b = sorted(
        (r["OrderID"], r["Quantity"], r["TotalPrice"], r["OrderDateKey"])
        for r in fb.collect()
    )
    assert a == b

    # compaction ran (fact at version 2 in the committed manifest) and
    # preserved the date partition layout
    cat_b = txn.Catalog(wh_b)
    assert cat_b.manifest()["fact_orders"] == 2
    vdir = f"{wh_b}/fact_orders/v=2"
    assert any(d.startswith("OrderDateKey=") for d in os.listdir(vdir))
    # hash keys joined consistently: every fact FK resolves
    unresolved = fb.join(
        res_b["dim_customers"].select("CustomerKey"), "CustomerKey", "left_anti"
    ).count()
    assert unresolved == 0
