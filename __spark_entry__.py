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
# queries(), so registration order is the coverage knob. Round 10
# priority order: (a) the queries that are NEW or GRADUATED from
# rows-only to oracle-checked this round (coreness h-index CTE; phash
# dedup + clusters via the BIGINT signature CTE; the snapshot-payloads
# companion; the exact-rank kernel's raw ranking) — never
# driver-hash-checked; (b) the 3 oracle-able keys
# whose PLAN changed this round (gini + revenue_concentration moved to
# the distributed exact-rank kernel; fk_cascade dropped the forced
# broadcasts on SF-proportional parents); (c) the r04-evidence cohort
# (21 keys incl. both bonus-source roundtrips) — the oldest driver
# evidence in the catalog, scheduled for r10 since last round; (d) 21
# of the 23 r05-evidence keys (x_text_vocab_topk and x_text_pii_redact
# carry to r11) so
# nothing oracle-able keeps pre-r05 driver evidence.
# x_olap_freq_items stays OUT permanently — rows-only by design
# (sketch output; superset property tested in tests/test_plans.py).
# Entries rotated OUT keep a regression check via
# tools/oracle_check.py over ALL keys — run pre-commit, full sweep
# committed per round as ORACLE_SWEEP_r{N}.json.
_WINDOW_FIRST = [
    # (a) new/graduated oracle-checked in r10, never driver-checked (5)
    "x_graph_coreness",
    "x_mm_phash_dedup",
    "x_mm_phash_clusters",
    "x_storage_snapshot_payloads",
    "x_olap_global_rank",
    # (b) plan changed in r10 (3)
    "x_olap_gini",
    "x_olap_revenue_concentration",
    "x_validate_fk_cascade",
    # (c) r04-evidence cohort (21)
    "s1b_json_roundtrip",
    "s1c_orc_roundtrip",
    "x_corpus_prep",
    "x_decontam_filter",
    "x_decontam_report",
    "x_ingest_incremental_agg",
    "x_olap_cube",
    "x_olap_moving_agg",
    "x_olap_q18_style",
    "x_olap_q3_style",
    "x_olap_q5_style",
    "x_sample_domain_mix",
    "x_sample_shard_positions",
    "x_sim_bruteforce_topk",
    "x_stream_stream_join",
    "x_text_fingerprint",
    "x_text_lang_id",
    "x_text_quality",
    "x_text_quality_ntile",
    "x_text_repetition",
    "x_text_stats",
    # (d) r05-evidence cohort, 21 of 23. Carrying to the r11 window
    # (all both-SF sweep-green this round, never driver-hash-checked):
    # x_text_vocab_topk, x_text_pii_redact (rotated r05 keys), the
    # late-r10 additions x_corpus_epoch_shuffle, x_pack_length_buckets,
    # x_storage_checksum_ranges, x_validate_quarantine,
    # x_scd2_late_arriving, the Kimball snapshot-fact pair
    # x_fact_accumulating_snapshot + x_fact_periodic_snapshot, the SCD
    # taxonomy completions x_scd1_overwrite + x_scd3_prev_value, the
    # survivorship merge x_dedup_golden_record, the Z-order layout
    # x_storage_zorder_layout, the drift-repair + CRM pair
    # x_ingest_conform_schema + x_olap_rfm_scores, the dimensional-
    # pattern trio x_dim_junk + x_fact_order_part_bridge +
    # x_olap_role_playing_dates, the drill-across report
    # x_olap_drill_across, and the
    # three late-r10 ANN oracle graduations x_sim_lsh_topk,
    # x_sim_ivf_topk, x_dedup_embedding_cosine_lsh.
    "x_corpus_stats",
    "x_dedup_embedding_cosine",
    "x_dedup_substring_spans",
    "x_emb_centroid_elements",
    "x_mm_decode_metadata",
    "x_mm_frame_sample",
    "x_olap_analytic_window",
    "x_olap_anti_join",
    "x_olap_count_distinct",
    "x_olap_grouping_sets",
    "x_olap_left_outer_join",
    "x_olap_pivot",
    "x_olap_rollup",
    "x_olap_set_ops",
    "x_olap_topk_per_group",
    "x_olap_window_nav",
    "x_sample_hash",
    "x_sample_stratified",
    "x_storage_time_travel",
    "x_stream_scd2_apply",
    "x_text_chunking",
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
