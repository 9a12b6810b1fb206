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


# The driver's correctness gate consumes exactly the FIRST 50 keys of
# queries(), so registration order is the coverage knob. Rounds 1-2
# driver-checked the 46 parity entries plus 8 extensions; 32 extension
# queries had never produced a driver row. Round 3 front-loads ALL 32
# never-checked entries (changed-since-last-check modules first:
# similarity, skew, streaming, simhash) plus m5 (txn.py changed this
# round) and as many parity entries as fit. Entries rotated OUT of the
# window keep a regression check via tools/oracle_check.py over ALL
# keys — run pre-commit, full sweep committed per round as
# ORACLE_SWEEP_r{N}.json. Update _WINDOW_FIRST each round from the
# still-unchecked set in CORRECTNESS_r{N}.json.
_WINDOW_FIRST = [
    # new in r04 — first driver check
    "x_corpus_build_full",
    "x_decontam_report",
    "x_decontam_filter",
    "x_text_repetition",
    "x_sample_domain_mix",
    "x_sample_shard_positions",
    "x_text_quality_ntile",
    "x_olap_cube",
    "x_olap_correlated_scalar",
    "x_olap_range_frame",
    "x_sim_pq_topk",
    "x_stream_stream_join",
    "x_olap_q5_style",
    "x_olap_q18_style",
    "x_olap_unpivot",
    "x_ingest_incremental_agg",
    "x_sim_ivfpq_topk",
    # registered after the r03 rotation — never in a driver window
    "x_olap_grouping_sets",
    "x_olap_q3_style",
    "x_olap_moving_agg",
    "x_stream_static_join",
    # outside the r03 window, last driver-checked r01/r02
    "x_text_stats",
    "x_text_quality",
    "x_text_lang_id",
    "x_text_fingerprint",
    "x_dedup_exact",
    "x_dedup_ngram_jaccard",
    "x_corpus_prep",
    "x_olap_q1_style",
    # modified this round (operators/similarity.py shared helpers)
    "x_sim_bruteforce_topk",
    "x_sim_lsh_topk",
    "x_sim_ivf_topk",
    "x_sim_ivf_kmeans_topk",
]


def _ordered_keys() -> list[str]:
    first = [k for k in _WINDOW_FIRST if k in QUERIES]
    placed = set(first)
    parity = [k for k in QUERIES if not k.startswith("x_") and k not in placed]
    rest = [k for k in QUERIES if k.startswith("x_") and k not in placed]
    ordered = first + parity + rest
    assert sorted(ordered) == sorted(QUERIES), "ordering dropped/duplicated keys"
    return ordered


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {k: QUERIES[k] for k in _ordered_keys()}


def oracle_sql() -> dict[str, str]:
    return dict(ORACLE)
