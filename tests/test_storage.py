"""Storage-layout behaviors the 100 TB posture depends on: partition
pruning reaches the scan, and filters/projections push into parquet."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from glue_jobs_for_data_pipeline_spark.sources.readers import load_table


@pytest.fixture(scope="module")
def partitioned_dir(spark, sf_dir, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("part") / "orders_by_year")
    o = load_table(spark, sf_dir, "orders").withColumn(
        "order_year", F.year(F.col("o_orderdate").cast("date"))
    )
    o.repartition("order_year").write.partitionBy("order_year").parquet(d)
    return d


def test_partition_filter_prunes_scan(spark, partitioned_dir):
    df = spark.read.parquet(partitioned_dir).filter(F.col("order_year") == 1995)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the year predicate must be a PartitionFilter on the scan node, not
    # a post-scan Filter over all partitions
    assert "PartitionFilters" in plan
    assert "order_year" in plan.split("PartitionFilters")[1].split("]")[0]
    years = {r["order_year"] for r in df.select("order_year").distinct().collect()}
    assert years == {1995}


def test_predicate_and_projection_pushdown(spark, sf_dir):
    df = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") > 45)
        .select("l_orderkey", "l_quantity")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    pushed = plan.split("PushedFilters: [")[1].split("]")[0]
    assert "l_quantity" in pushed  # predicate reaches the parquet reader
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    # column pruning: only the two selected columns are read
    assert "l_orderkey" in read_schema and "l_quantity" in read_schema
    assert "l_extendedprice" not in read_schema


def _scan_metrics(df) -> dict:
    """Executed-scan metrics (numFiles / numPartitions / ...) of the
    first leaf, from ONE execution. NOTE: df.inputFiles() is the WRONG
    probe for pruning — it lists the relation's full file index before
    partition filters apply; only the executed FileSourceScan's metrics
    show what was actually read."""
    df.collect()
    scan = df._jdf.queryExecution().executedPlan().collectLeaves().apply(0)
    m = scan.metrics()
    out, it = {}, m.keys().iterator()
    while it.hasNext():
        k = it.next()
        out[k] = m.apply(k).value()
    return out


def test_partition_pruning_reads_only_matching_dirs(spark, partitioned_dir):
    """Stronger than the plan-string check: the executed scan must have
    touched exactly ONE partition directory (zero I/O elsewhere) — the
    property x_storage_partition_pruning's docstring claims."""
    pruned = _scan_metrics(
        spark.read.parquet(partitioned_dir).filter(F.col("order_year") == 1995)
    )
    full = _scan_metrics(spark.read.parquet(partitioned_dir))
    assert pruned["numPartitions"] == 1, pruned
    assert full["numPartitions"] > 1, full
    assert 0 < pruned["numFiles"] < full["numFiles"], (pruned, full)


def test_dynamic_partition_pruning_from_dim_filter(spark, partitioned_dir):
    """The 100 TB fact-scan killer feature: a filter on the DIM side must
    prune FACT partitions at runtime (DPP), not after a full scan — the
    partition predicate is only known after the dim filter runs, so it
    appears as a dynamicpruning subquery in the fact's PartitionFilters."""
    fact = spark.read.parquet(partitioned_dir)
    years = spark.range(1990, 2000).select(
        F.col("id").cast("int").alias("y"),
        (F.col("id") % 2).alias("flag"),
    )
    joined = fact.join(
        years.filter(F.col("flag") == 1), fact["order_year"] == years["y"]
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:2000]
    # and the result only contains odd years (the dim filter applied)
    got = {r["order_year"] for r in joined.select("order_year").distinct().collect()}
    assert got and all(y % 2 == 1 for y in got)


def test_runtime_bloom_filter_prunes_fact_scan(spark, sf_dir, tmp_path):
    """Runtime (AQE-era) bloom-filter join pruning: a selective dim
    filter should inject a bloom_filter_might_contain predicate on the
    fact side of a shuffle join, cutting the probe rows before the
    exchange — the third pruning tier next to static pushdown and
    dynamic partition pruning. Default thresholds target cluster-scale
    tables (application side >= 10GB), so the test lowers them to
    demonstrate the mechanism on fixture data."""
    fact_dir = str(tmp_path / "li")
    dim_dir = str(tmp_path / "od")
    load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity"
    ).write.parquet(fact_dir)
    load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    ).write.parquet(dim_dir)

    conf = spark.conf
    saved = {
        k: conf.get(k, None)
        for k in (
            "spark.sql.optimizer.runtime.bloomFilter.enabled",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        conf.set(
            "spark.sql.optimizer.runtime.bloomFilter."
            "applicationSideScanSizeThreshold",
            "0",
        )
        conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
            "100MB",
        )
        # force a shuffle join: bloom filters only help non-broadcast
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

        fact = spark.read.parquet(fact_dir)
        dim = spark.read.parquet(dim_dir).filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        joined = fact.join(dim, fact["l_orderkey"] == dim["o_orderkey"])
        plan = joined._jdf.queryExecution().optimizedPlan().toString()
        # Spark 4 prints the runtime filter as might_contain(...) probing
        # a bloom_filter_agg-built scalar subquery on the fact side
        assert "might_contain" in plan and "bloom_filter_agg" in plan, (
            plan[:2000]
        )
        # result is unchanged by the filter (no false negatives)
        expected = (
            load_table(spark, sf_dir, "lineitem")
            .join(
                load_table(spark, sf_dir, "orders").filter(
                    F.col("o_orderpriority") == "1-URGENT"
                ),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .count()
        )
        assert joined.count() == expected
    finally:
        for k, v in saved.items():
            if v is None:
                conf.unset(k)
            else:
                conf.set(k, v)


def test_hash_skip_index_prunes_files_and_is_exact(spark, sf_dir, tmp_path):
    from glue_jobs_for_data_pipeline_spark.sources.skipindex import (
        build_hash_bucket_index,
        candidate_files,
        indexed_equality_scan,
    )

    d = str(tmp_path / "orders_clustered")
    od = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    od.repartitionByRange(8, "o_custkey").write.parquet(d)
    idx = build_hash_bucket_index(spark, d, "o_custkey")
    n_files = idx.count()
    assert n_files >= 2

    key = od.select("o_custkey").first()["o_custkey"]
    cands = candidate_files(idx, key, "bigint", 4096)
    # pruning: clustered layout must cut the candidate list well below
    # the full file set
    assert 1 <= len(cands) < n_files

    # no false negatives: candidates cover every file actually holding
    # the key
    actual = {
        r["f"]
        for r in spark.read.parquet(d)
        .filter(F.col("o_custkey") == key)
        .select(F.input_file_name().alias("f"))
        .distinct()
        .collect()
    }
    assert actual <= set(cands)

    # exactness end-to-end
    got = sorted(
        r["o_orderkey"]
        for r in indexed_equality_scan(spark, idx, key, "o_custkey").collect()
    )
    expect = sorted(
        r["o_orderkey"]
        for r in od.filter(F.col("o_custkey") == key).collect()
    )
    assert got == expect


def test_hash_skip_index_empty_on_absent_key(spark, sf_dir, tmp_path):
    from glue_jobs_for_data_pipeline_spark.sources.skipindex import (
        build_hash_bucket_index,
        indexed_equality_scan,
    )

    d = str(tmp_path / "orders_small")
    load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    ).repartitionByRange(4, "o_custkey").write.parquet(d)
    idx = build_hash_bucket_index(spark, d, "o_custkey")
    out = indexed_equality_scan(spark, idx, -999_999_999, "o_custkey")
    assert out.count() == 0
    assert set(out.columns) == {"o_orderkey", "o_custkey"}


def test_hash_skip_index_int_column_no_false_negatives(spark, sf_dir, tmp_path):
    """Build/probe type contract: the index records the column dtype
    (here int, not the probe default bigint) and the probe hashes at
    that recorded type — a width mismatch would silently hash to a
    different bucket and return zero candidates for a present key."""
    from glue_jobs_for_data_pipeline_spark.sources.skipindex import (
        build_hash_bucket_index,
        indexed_equality_scan,
    )

    d = str(tmp_path / "orders_int")
    load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_custkey").cast("int").alias("o_custkey")
    ).repartitionByRange(4, "o_custkey").write.parquet(d)
    idx = build_hash_bucket_index(spark, d, "o_custkey")
    assert idx.select("dtype").first()["dtype"] == "int"
    key = int(
        spark.read.parquet(d).select("o_custkey").first()["o_custkey"]
    )
    # default col_dtype="bigint" is deliberately wrong; the recorded
    # dtype must win
    got = indexed_equality_scan(spark, idx, key, "o_custkey").count()
    expect = (
        spark.read.parquet(d).filter(F.col("o_custkey") == key).count()
    )
    assert got == expect > 0


def test_hash_skip_index_empty_index(spark, sf_dir, tmp_path):
    """Empty index: ValueError without a schema source, empty frame of
    the table's shape with table_path= supplied."""
    import pytest

    from glue_jobs_for_data_pipeline_spark.sources.skipindex import (
        build_hash_bucket_index,
        indexed_equality_scan,
    )

    d = str(tmp_path / "orders_for_empty")
    load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    ).limit(100).write.parquet(d)
    empty_idx = build_hash_bucket_index(spark, d, "o_custkey").filter(
        F.lit(False)
    )
    with pytest.raises(ValueError, match="empty"):
        indexed_equality_scan(spark, empty_idx, 1, "o_custkey")
    out = indexed_equality_scan(
        spark, empty_idx, 1, "o_custkey", table_path=d
    )
    assert out.count() == 0
    assert set(out.columns) == {"o_orderkey", "o_custkey"}


def test_dynamic_partition_pruning_fires(spark, sf_dir):
    """x_storage_dynamic_partition_pruning (r14): the executed plan's
    PartitionFilters must carry a dynamicpruning subquery — the fact
    scan is pruned by the dim join's runtime result, not a literal."""
    from glue_jobs_for_data_pipeline_spark.plans import catalog_ext  # noqa: F401
    from glue_jobs_for_data_pipeline_spark.plans.catalog import QUERIES

    df = QUERIES["x_storage_dynamic_partition_pruning"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:800]
    assert df.count() > 0


def test_runtime_bloom_filter_injected_and_confs_restored(spark, sf_dir):
    """x_storage_runtime_bloom_filter: the query itself asserts
    bloom_filter_agg in the executed plan (it raises otherwise); here
    we additionally pin that the conf bracket restores every session
    value and the result matches the plain static join."""
    from pyspark.sql import functions as F

    from glue_jobs_for_data_pipeline_spark.plans.catalog_ext import (
        x_storage_runtime_bloom_filter,
    )
    from glue_jobs_for_data_pipeline_spark.sources.readers import load_table

    keys = [
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
        "spark.sql.autoBroadcastJoinThreshold",
    ]
    before = {k: spark.conf.get(k) for k in keys}
    got = {
        r["l_returnflag"]: (r["cnt"], r["sum_qty"])
        for r in x_storage_runtime_bloom_filter(spark, sf_dir).collect()
    }
    after = {k: spark.conf.get(k) for k in keys}
    assert before == after

    li = load_table(spark, sf_dir, "lineitem")
    urgent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    ).select("o_orderkey")
    want = {
        r["l_returnflag"]: (r["cnt"], r["sum_qty"])
        for r in li.join(urgent, li["l_orderkey"] == urgent["o_orderkey"])
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_qty"),
        )
        .collect()
    }
    assert got == want
