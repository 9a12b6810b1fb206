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
# queries(), so registration order is the coverage knob. Round 17
# priority order (the r16 verdict's task #1 — 50 explicit entries
# below = the full window, ALL oracle-able, target 50/50 hash-green
# with zero no_oracle rows):
# (a) keys NEW or plan-changed in r17: x_stream_exactly_once (new —
#     catalog exactly-once streaming sink via add-files appends),
#     x_storage_schema_evolution (new — metadata-only ALTER with
#     snapshot-aware replay), x_stream_incremental_mv (new —
#     raw+view+ledger in one manifest per micro-batch),
#     x_corpus_stream_ingest_dedup (new — cross-batch dedup intake),
#     x_storage_snapshot_diff (new — CDC between two manifests),
#     x_storage_mor_upsert (new — Hudi-MOR delta upsert + compaction),
#     x_storage_commit_log (first driver row — was sweep-only in r16;
#     log entries gained schema_changed),
#     x_storage_deletion_vectors (plan changed — read_merged now pins
#     one manifest snapshot for base+dv, ADVICE r16 high),
#     x_dedup_pairs_stage (producer now dispatches through the
#     tiered candidate-mass switch; output-identical by construction);
# (b) always-on m1/m2 core + m5 (txn.py commit/read-path rework r17);
# (c) the 18 OLDEST-evidence parity keys (f1..f11, v1..v4, m3, m1b,
#     m4 — last driver-green r08/r09; the verdict's named tranche
#     plus the equally-old v-keys);
# (d) the first 20 of the r15-seated/r08-origin x_* cohort in their
#     r15 window order (driver evidence r15), refreshing the oldest
#     x_* rows that fit.
# Carried to r18 (sweep-green at both SFs every round): the rest of
# the r15 cohort (x_text_boilerplate_removal, x_text_string_kernels,
# x_ts_asof_forward, x_ts_ohlc — yielded their tranche slots to the
# four late-r17 keys in (a) — plus x_ts_twap, x_dedup_cc_clusters,
# x_corpus_dedup_cc,
# x_corpus_dedup_quality_keep, x_split_neardup_leakage,
# x_dedup_semantic_semdedup, x_corpus_cluster_balance,
# x_sim_ivf_kmeans_topk, x_olap_grid_quantile_sketch,
# x_market_basket_lift, x_graph_pagerank, x_text_dsir_weights,
# x_emb_cluster_quality, x_olap_countmin_sketch,
# x_emb_scatter_matrix, x_split_group_kfold,
# x_storage_branch_isolation, x_emb_centroids_stage), the parity keys
# s1..p5 (r14 evidence) and p6..l1 (r16 evidence), and the r16-seated
# x_* cohort (r16 evidence).
# Permanently rows-only by design (weaker driver check only; each got
# its one seated driver row in r15): x_dedup_minhash_lsh,
# x_dedup_simhash, x_olap_approx_distinct, x_corpus_prep_neardup,
# x_olap_freq_items, x_olap_approx_percentiles,
# x_olap_hll_partial_merge — kept OUT; their exact twins stay
# hash-gated.
_WINDOW_ROWS_ONLY_OK: set[str] = set()  # r17: no rows-only keys seated

_WINDOW_FIRST = [
    # (a) new or plan-changed in r17 (9)
    "x_stream_exactly_once",
    "x_storage_schema_evolution",
    "x_stream_incremental_mv",
    "x_corpus_stream_ingest_dedup",
    "x_storage_snapshot_diff",
    "x_storage_mor_upsert",
    "x_storage_commit_log",
    "x_storage_deletion_vectors",
    "x_dedup_pairs_stage",
    # (b) always-on core + r17-reworked commit/read path (3)
    "m1_scd2_upsert",
    "m2_j2_fact_population",
    "m5_transactional_pipeline",
    # (c) oldest-evidence parity tranche, last driver-green r08/r09 (18)
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
    "v1_null_counts",
    "v2_pk_duplicates",
    "v3_registry_membership",
    "v4_validation_report",
    "m3_dim_dates",
    "m1b_scd2_delta_upsert",
    "m4_update_where",
    # (d) r15-cohort refresh, r15 window order (20)
    "x_dedup_fuzzy_match",
    "x_events_anomaly_mad",
    "x_events_funnel_windowed",
    "x_events_top_paths",
    "x_events_transitions",
    "x_events_wau",
    "x_events_winsorize",
    "x_olap_conditional_kernels",
    "x_olap_distribution_window",
    "x_olap_full_outer_join",
    "x_olap_mode",
    "x_olap_mom_growth",
    "x_olap_q12_style",
    "x_olap_regression",
    "x_olap_skyline",
    "x_sample_weighted",
    "x_scd2_hash_keys",
    "x_skew_salted_agg",
    "x_storage_partition_pruning",
    "x_storage_zorder_roundtrip",
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
