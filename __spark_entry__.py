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
from glue_jobs_for_data_pipeline_spark.plans import tpch_pack  # noqa: F401  (registers x_olap_q*_style pack)
from glue_jobs_for_data_pipeline_spark.plans import scale_pack  # noqa: F401  (registers skew-join/SQL-frontend/stream-topk)
from glue_jobs_for_data_pipeline_spark.plans import analytics_pack  # noqa: F401  (registers funnel/retention/corr)
from glue_jobs_for_data_pipeline_spark.plans import mining_pack  # noqa: F401  (registers graph/regression/skyline/asof-forward)
from glue_jobs_for_data_pipeline_spark.plans import metrics_pack  # noqa: F401  (registers gini/diversity/fk-cascade/percentiles/phash-cc)
from glue_jobs_for_data_pipeline_spark.plans import curation_pack  # noqa: F401  (registers winnowing/url-dedup/temperature-mix/matryoshka/compaction)
from glue_jobs_for_data_pipeline_spark.plans import media_pack  # noqa: F401  (registers audio-frame/VAD-segment/scene-cut)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the fact-population star join (SURVEY §2.9 M2) at sf0.001."""
    return QUERIES["m2_j2_fact_population"](spark, "/root/testdata/sf0.001")


# The driver's correctness gate consumes exactly the FIRST 50 keys of
# queries(), so registration order is the coverage knob. Round 13
# priority order (the r12 verdict's task #1): (a) the only two
# oracle-able keys that have NEVER had a driver CORRECTNESS row
# (x_validate_dq_scorecard, x_mm_audio_resample) plus the two keys
# oracle-GRADUATED this round (x_sim_pq_topk, x_sim_ivfpq_topk —
# deterministic init-only codebooks restated in SQL), also never
# driver-checked; (b) keys whose PLAN changed this round:
# x_olap_rfm_scores (rebuilt on the one-pass distributed_ntile_multi
# kernel) — plus the always-on m1/m2 core; (c) the full 13-key
# r06-evidence carry list named in the r11/r12 verdicts — the oldest
# driver evidence in the catalog; (d) 31 slots of the r07-evidence
# cohort (46 keys; the remaining 15 — the 11 stream/scd/frontend keys
# listed in the section comment plus x_ts_gap_fill,
# x_ts_sessionize_native, x_validate_profile, x_text_bigram_lm —
# carry to r14, all sweep-green at both SFs this round).
# x_olap_freq_items stays OUT permanently — rows-only by design
# (sketch output; superset property tested in tests/test_plans.py).
# Entries rotated OUT keep a regression check via
# tools/oracle_check.py over ALL keys — run pre-commit with
# --pandas-oracle, full sweep committed per round as
# ORACLE_SWEEP_r{N}.json.
_WINDOW_FIRST = [
    # (a) never driver-checked: the two r11-new oracle keys, the two
    # r13 oracle graduations, and the r13-new resize stage
    "x_validate_dq_scorecard",
    "x_mm_audio_resample",
    "x_sim_pq_topk",
    "x_sim_ivfpq_topk",
    "x_mm_resize",
    # (b) plan changed in r13 + always-on core
    "x_olap_rfm_scores",
    "m1_scd2_upsert",
    "m2_j2_fact_population",
    # (c) the r06-evidence carry list, seated in full (13)
    "x_ts_range_join",
    "x_ts_sessionize_batch",
    "x_ts_asof_join",
    "x_json_extract",
    "x_olap_unpivot",
    "x_olap_range_frame",
    "x_emb_quantize_int8",
    "x_ingest_latest_by_key",
    "x_ingest_schema_evolution",
    "x_olap_correlated_scalar",
    "x_olap_percentiles",
    "x_sample_token_budget",
    "x_ingest_incremental_dedup",
    # (d) r07-evidence cohort, oldest remaining (30 of 46; the 16
    # carried to r14: x_scd2_point_in_time, x_skew_salted_join,
    # x_sql_frontend, x_stream_dedup, x_stream_sessionize,
    # x_stream_static_join, x_stream_stream_full_join,
    # x_stream_stream_left_join, x_stream_topk,
    # x_stream_watermark_append, x_text_bigram_lm, x_ts_gap_fill,
    # x_ts_sessionize_native, x_validate_profile, x_merge_into,
    # x_olap_q22_style — displaced by the r13-new x_mm_resize)
    "x_corpus_dedup_quality_keep",
    "x_dedup_exact",
    "x_dedup_minhash_md5",
    "x_dedup_ngram_jaccard",
    "x_dedup_simhash_md5",
    "x_events_anomaly_zscore",
    "x_events_funnel",
    "x_events_retention",
    "x_ingest_incremental_join",
    "x_olap_corr",
    "x_olap_equidepth_histogram",
    "x_olap_histogram",
    "x_olap_q1_style",
    "x_olap_q2_style",
    "x_olap_q4_style",
    "x_olap_q6_style",
    "x_olap_q7_style",
    "x_olap_q8_style",
    "x_olap_q9_style",
    "x_olap_q10_style",
    "x_olap_q11_style",
    "x_olap_q13_style",
    "x_olap_q14_style",
    "x_olap_q15_style",
    "x_olap_q16_style",
    "x_olap_q17_style",
    "x_olap_q19_style",
    "x_olap_q20_style",
    "x_olap_q21_style",
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
