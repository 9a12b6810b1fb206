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


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the fact-population star join (SURVEY §2.9 M2) at sf0.001."""
    return QUERIES["m2_j2_fact_population"](spark, "/root/testdata/sf0.001")


# The driver's correctness gate consumes exactly the FIRST 50 keys of
# queries(), so registration order is the coverage knob. Round 9
# priority order: (a) the 20 late-round-8 oracle-able keys that landed
# after the r08 window filled — every one has NEVER been
# driver-hash-checked (sweep-green at two SFs only); two of them
# (x_events_attribution — exact-microsecond session gap fix,
# x_storage_hash_skip_index — dtype-carrying index) also CHANGED this
# round. Then (b) the §2 parity cohort rotated out in r08
# (j3/a3/a4/w1/v3/v4/m1b/m4, r05 evidence; s1/p8+f12, r07), then (c)
# the r06 §2 cohort (f1–f11 function pack, a1, p6, l1) so no §2 key's
# driver evidence ages past 3 rounds, then (d) the round-9 additions
# that have never seen a driver check — x_graph_kcore (newly GRADUATED
# from rows-only to a recursive-CTE oracle) and the 4 new oracle-able
# metrics-pack queries (incl. the snapshot-diff delta manifest).
# The r04 cohort (21 keys incl. both bonus-source roundtrips)
# re-seats in r10.
# x_olap_freq_items stays OUT permanently — rows-only by design
# (sketch output; superset property tested in tests/test_plans.py).
# Entries rotated OUT keep a regression check via
# tools/oracle_check.py over ALL keys — run pre-commit, full sweep
# committed per round as ORACLE_SWEEP_r{N}.json.
_WINDOW_FIRST = [
    # (a) late-r08 oracle-able, never driver-checked (20)
    "x_events_attribution",
    "x_storage_hash_skip_index",
    "x_text_array_kernels",
    "x_olap_date_kernels",
    "x_ts_bounce_rate",
    "x_olap_latency_hist",
    "x_text_lm_coverage",
    "x_validate_fd_profile",
    "x_olap_benford",
    "x_olap_window_frames",
    "x_text_pmi_collocations",
    "x_validate_drift_chisq",
    "x_ts_autocorr",
    "x_validate_skew_report",
    "x_events_cumulative_users",
    "x_validate_join_planner",
    "x_olap_windowed_distinct",
    "x_ts_interpolate",
    "x_validate_join_cardinality",
    "x_validate_table_checksum",
    # (b) §2 cohort rotated out in r08 (10)
    "j3_left_semi_join",
    "a3_having",
    "a4_distinct",
    "w1_row_number",
    "v3_registry_membership",
    "v4_validation_report",
    "m1b_scd2_delta_upsert",
    "m4_update_where",
    "s1_csv_bulk_load",
    "p8_f12_table_dispatch",
    # (c) r06 §2 cohort — functions + a1/p6/l1 (14)
    "f1_extract_year",
    "f2_extract_quarter",
    "f3_extract_month",
    "f4_extract_day",
    "f5_extract_dow",
    "f6_extract_week",
    "f7_date_plus_int",
    "f8_yesterday",
    "f9_cast_string_date",
    "f10_load_date_default",
    "f11_decimal_multiply",
    "a1_count_star",
    "p6_null_predicate",
    "l1_limit",
    # (d) never-driver-checked r09 additions (6)
    "x_graph_kcore",
    "x_olap_gini",
    "x_events_transition_diversity",
    "x_validate_fk_cascade",
    "x_events_interarrival_disc",
    "x_storage_snapshot_diff",
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
