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
# queries(), so registration order is the coverage knob. Round 15
# priority order (the r14 verdict's tasks #1 and #6 — 50 explicit
# entries below = the full window):
# (a) the COMPLETE 25-key r08-evidence cohort — the oldest driver
#     evidence left, retired in one edit;
# (b) the two keys that never had ANY driver row (rows-only by design;
#     the driver records the weaker rows-only check once):
#     x_olap_approx_percentiles, x_olap_hll_partial_merge;
# (c) keys whose PLAN or ORACLE changed in r15: the two NEW stage
#     queries (x_dedup_pairs_stage — near-dup pair table staged once —
#     and x_emb_centroids_stage — both k-means trainings staged once),
#     their seven consumers (x_dedup_cc_clusters, x_corpus_dedup_cc,
#     x_corpus_dedup_quality_keep, x_split_neardup_leakage,
#     x_dedup_semantic_semdedup, x_corpus_cluster_balance,
#     x_sim_ivf_kmeans_topk), x_olap_grid_quantile_sketch (bin width
#     fixed to the documented $100 grid — ADVICE r14 medium),
#     x_market_basket_lift (distinct basket set checkpointed),
#     x_graph_pagerank (oracle nodes CTE now unions dst);
# (d) always-on m1/m2 core + m5 (stale-lock reclamation added r15).
# No parity auto-fill this round (all 46 parity keys driver-green r14
# and sweep-green both SFs every round).
# Carried to r16 (sweep-green at both SFs every round; newest driver
# evidence r14): x_mm_binary_ingest, x_graph_edges_stage,
# x_mm_ingest_pipeline, x_storage_bucketed_join,
# x_storage_dynamic_partition_pruning, x_validate_observed_load,
# x_graph_triangles, x_graph_degree_hist, x_graph_kcore,
# x_graph_coreness, the r07-cohort (r14 evidence), and the parity keys
# past slot 50.
# Permanently rows-only by design (weaker driver check only):
# x_dedup_minhash_lsh, x_dedup_simhash, x_olap_approx_distinct,
# x_corpus_prep_neardup, x_olap_freq_items (plus (b) above, seated
# once this round so every one of the catalog keys has a driver row).
# Entries rotated OUT keep a regression check via
# tools/oracle_check.py over ALL keys — run pre-commit with
# --pandas-oracle, full sweep committed per round as
# ORACLE_SWEEP_r{N}.json.
# Rows-only keys DELIBERATELY consuming window slots this round: the
# r14 verdict's task #6 — each gets its one (weaker, rows-only) driver
# row so every catalog key has driver evidence at least once. Rotate
# them back out in r16.
_WINDOW_ROWS_ONLY_OK = {
    "x_olap_approx_percentiles",
    "x_olap_hll_partial_merge",
}

_WINDOW_FIRST = [
    # (a) the complete r08-evidence cohort, seated in full (25)
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
    "x_text_boilerplate_removal",
    "x_text_string_kernels",
    "x_ts_asof_forward",
    "x_ts_ohlc",
    "x_ts_twap",
    # (b) never driver-checked, rows-only by design (2)
    "x_olap_approx_percentiles",
    "x_olap_hll_partial_merge",
    # (c) plan/oracle changed in r15 (12)
    "x_dedup_pairs_stage",
    "x_emb_centroids_stage",
    "x_dedup_cc_clusters",
    "x_corpus_dedup_cc",
    "x_corpus_dedup_quality_keep",
    "x_split_neardup_leakage",
    "x_dedup_semantic_semdedup",
    "x_corpus_cluster_balance",
    "x_sim_ivf_kmeans_topk",
    "x_olap_grid_quantile_sketch",
    "x_market_basket_lift",
    "x_graph_pagerank",
    # (c2) NEW in r15, seated for first driver evidence (8):
    # VARCHAR enforcement (SURVEY §1.2 residue closed), DSIR importance
    # weights, staged-model cluster quality, count-min sketch, PCA
    # scatter moments, group-aware k-fold split, runtime bloom-filter
    # join pruning, catalog branch isolation + fast-forward merge
    "x_validate_varchar_len",
    "x_text_dsir_weights",
    "x_emb_cluster_quality",
    "x_olap_countmin_sketch",
    "x_emb_scatter_matrix",
    "x_split_group_kfold",
    "x_storage_runtime_bloom_filter",
    "x_storage_branch_isolation",
    # (d) always-on core + commit path (3)
    "m1_scd2_upsert",
    "m2_j2_fact_population",
    "m5_transactional_pipeline",
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
