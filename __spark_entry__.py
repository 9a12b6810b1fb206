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
# queries(), so registration order is the coverage knob. Round 5
# closes the driver-evidence gap for good (VERDICT r04 item 2): the
# 28 oracle-backed queries that have never appeared in any committed
# CORRECTNESS file, plus the re-greened x_olap_grouping_sets (r04's
# one red row, now DOUBLE-pinned), m5 (sources/txn.py drifted +116
# lines since its r02 green), the three queries added after the r04
# sweep (window_nav / freq_items / time_travel — ADVICE), the new
# x_stream_scd2_apply, and x_dedup_ngram_jaccard (posting-list code
# changes this round). Remaining slots: M/V/J/A/W parity re-checks.
# Entries rotated OUT keep a regression check via
# tools/oracle_check.py over ALL keys — run pre-commit, full sweep
# committed per round as ORACLE_SWEEP_r{N}.json.
_WINDOW_FIRST = [
    # never driver-checked (28, VERDICT r04 item 2)
    "x_olap_rollup",
    "x_olap_pivot",
    "x_olap_set_ops",
    "x_olap_percentiles",
    "x_olap_count_distinct",
    "x_olap_left_outer_join",
    "x_olap_anti_join",
    "x_olap_analytic_window",
    "x_olap_topk_per_group",
    "x_ts_asof_join",
    "x_ts_range_join",
    "x_ts_sessionize_batch",
    "x_skew_salted_agg",
    "x_mm_decode_metadata",
    "x_mm_frame_sample",
    "x_text_pii_redact",
    "x_text_chunking",
    "x_text_vocab_topk",
    "x_dedup_substring_spans",
    "x_dedup_embedding_cosine",
    "x_emb_centroid_elements",
    "x_emb_quantize_int8",
    "x_sample_hash",
    "x_sample_stratified",
    "x_ingest_latest_by_key",
    "x_json_extract",
    "x_corpus_stats",
    "x_stream_window_agg",
    # r04's red row, decimal-pinned this round — must re-green
    "x_olap_grouping_sets",
    # driver green predates +116 lines in sources/txn.py
    "m5_transactional_pipeline",
    # added after the r04 sweep — no differential evidence yet (ADVICE)
    "x_olap_window_nav",
    "x_olap_freq_items",
    "x_storage_time_travel",
    # new this round
    "x_stream_scd2_apply",
    # posting-list pruning changed this round — re-check
    "x_dedup_ngram_jaccard",
    # parity re-checks (fill to 50): mutation, validation, join, agg, window
    "m1_scd2_upsert",
    "m1b_scd2_delta_upsert",
    "m2_j2_fact_population",
    "m3_dim_dates",
    "m4_update_where",
    "v1_null_counts",
    "v2_pk_duplicates",
    "v3_registry_membership",
    "v4_validation_report",
    "j1_inner_equijoin",
    "j3_left_semi_join",
    "w1_row_number",
    "a2_groupby_count",
    "a3_having",
    "a4_distinct",
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
