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
# queries(), so registration order is the coverage knob. Round 7
# (VERDICT r06 items 1-2): lead with the queries whose behavior changed
# this round — the scalarized freq-items sketch, the three streaming
# drains converted from rows-only to oracle-checked (their first-ever
# shot at a hash green), MERGE INTO after the NULL-clause fix, and
# n-gram Jaccard after the uncapped-_df restructure — then the 37
# oracle-able keys whose last driver green is r04 (the oldest evidence
# in any committed CORRECTNESS file), then headline bench queries
# last green r05. Entries rotated OUT keep a regression check via
# tools/oracle_check.py over ALL keys — run pre-commit, full sweep
# committed per round as ORACLE_SWEEP_r{N}.json.
_WINDOW_FIRST = [
    # changed this round (7)
    "x_olap_freq_items",
    "x_stream_sessionize",
    "x_stream_dedup",
    "x_stream_static_join",
    "x_stream_watermark_append",
    "x_merge_into",
    "x_dedup_ngram_jaccard",
    # oracle-able, last driver green r04 — oldest evidence (34)
    "s1_csv_bulk_load",
    "s1b_json_roundtrip",
    "s1c_orc_roundtrip",
    "s2_truncate_and_load",
    "s3_table_scan",
    "s4_s7_staging_lifecycle",
    "s5_ctas_cached",
    "s6_insert_select_append",
    "p1_projection",
    "p4_equality_filter",
    "p5_conjunction",
    "p7_in_subquery_semi",
    "p8_f12_table_dispatch",
    "x_text_stats",
    "x_text_quality",
    "x_text_lang_id",
    "x_text_fingerprint",
    "x_text_repetition",
    "x_text_quality_ntile",
    "x_dedup_exact",
    "x_sim_bruteforce_topk",
    "x_olap_q1_style",
    "x_olap_q3_style",
    "x_olap_q5_style",
    "x_olap_q18_style",
    "x_olap_cube",
    "x_olap_moving_agg",
    "x_corpus_prep",
    "x_decontam_report",
    "x_decontam_filter",
    "x_sample_domain_mix",
    "x_sample_shard_positions",
    "x_stream_stream_join",
    "x_ingest_incremental_agg",
    # new this round — no driver evidence yet (5); s8/p3/p2 rotated out
    # (trivial, very stable, sweep-covered) to make room
    "x_text_tfidf",
    "x_text_bigram_lm",
    "x_validate_profile",
    "x_events_anomaly_zscore",
    "x_corpus_dedup_quality_keep",
    # headline bench queries, last green r05 (4)
    "m1_scd2_upsert",
    "m2_j2_fact_population",
    "m3_dim_dates",
    "j1_inner_equijoin",
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
