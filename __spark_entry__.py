"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)    -- flagship query (M2 fact population) on sf0.001.
queries()       -- one callable per implemented SURVEY §2 operator.
oracle_sql()    -- matching ANSI SQL for the DuckDB oracle.

The real implementations live in glue_jobs_for_data_pipeline_spark/;
this module is a thin adapter the driver imports.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from glue_jobs_for_data_pipeline_spark.plans.catalog import ORACLE, QUERIES
from glue_jobs_for_data_pipeline_spark.plans import catalog_ext  # noqa: F401  (registers x_* queries)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the fact-population star join (SURVEY §2.9 M2) at sf0.001."""
    return QUERIES["m2_j2_fact_population"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLE)
