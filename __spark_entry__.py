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
# queries(), so registration order is the coverage knob. Round 14
# priority order (the r13 verdict's task #1 + the ADVICE bookkeeping
# fix — ONE canonical arithmetic: 36 explicit entries below + the
# first 14 parity keys that _ordered_keys auto-appends = 50):
# (a) oracle-able keys with NO driver row ever: x_mm_binary_ingest
#     (landed post-freeze in r13) plus the seven NEW/GRADUATED r14
#     keys (x_graph_edges_stage, x_mm_ingest_pipeline,
#     x_sim_ivf_kmeans_topk — integer-grid Lloyd graduation —
#     x_graph_pagerank — integer-grid power iteration —
#     x_corpus_cluster_balance — cluster-balanced sampling —
#     x_storage_bucketed_join — zero-exchange co-located SMJ —
#     x_olap_grid_quantile_sketch — deterministic mergeable quantiles —
#     x_dedup_semantic_semdedup — within-cell semantic dedup —
#     x_storage_dynamic_partition_pruning — runtime partition filter —
#     and x_validate_observed_load — in-flight observe() metrics);
# (b) keys whose PLAN changed in r14 (staged co-purchase edge table):
#     x_graph_triangles, x_graph_degree_hist, x_graph_kcore,
#     x_graph_coreness, x_market_basket_lift;
# (c) always-on m1/m2 core + m5 (commit path hardened in r14);
# (d) the COMPLETE 17-key r07-evidence cohort — the oldest driver
#     evidence left (the r13 comment said 16; the recount is 17,
#     x_text_tfidf was the miscounted key).
# Slots 30-50 auto-fill with parity keys s1..a2 (registration order),
# which refreshes most of the r08-evidence parity tranche including
# the four scratch-path-changed roundtrips (s1/s2/s1b/s1c).
# Carried to r15 (sweep-green at both SFs this round, driver evidence
# r08): the 25 remaining r08-evidence x_* keys — x_dedup_fuzzy_match,
# x_events_anomaly_mad, x_events_funnel_windowed, x_events_top_paths,
# x_events_transitions, x_events_wau, x_events_winsorize,
# x_olap_conditional_kernels, x_olap_distribution_window,
# x_olap_full_outer_join, x_olap_mode, x_olap_mom_growth,
# x_olap_q12_style, x_olap_regression, x_olap_skyline,
# x_sample_weighted, x_scd2_hash_keys, x_skew_salted_agg,
# x_storage_partition_pruning, x_storage_zorder_roundtrip,
# x_text_boilerplate_removal, x_text_string_kernels, x_ts_asof_forward,
# x_ts_ohlc, x_ts_twap — plus the parity keys past slot 50.
# Permanently OUT (rows-only by design, weaker driver check only):
# x_dedup_minhash_lsh, x_dedup_simhash, x_olap_approx_percentiles,
# x_olap_approx_distinct, x_corpus_prep_neardup, x_olap_freq_items,
# x_olap_hll_partial_merge. (x_graph_pagerank left this list in r14 —
# integer-grid graduation.)
# Entries rotated OUT keep a regression check via
# tools/oracle_check.py over ALL keys — run pre-commit with
# --pandas-oracle, full sweep committed per round as
# ORACLE_SWEEP_r{N}.json.
_WINDOW_FIRST = [
    # (a) oracle-able, zero driver evidence (8)
    "x_mm_binary_ingest",
    "x_graph_edges_stage",
    "x_mm_ingest_pipeline",
    "x_sim_ivf_kmeans_topk",
    "x_graph_pagerank",
    "x_corpus_cluster_balance",
    "x_storage_bucketed_join",
    "x_olap_grid_quantile_sketch",
    "x_dedup_semantic_semdedup",
    "x_storage_dynamic_partition_pruning",
    "x_validate_observed_load",
    # (b) plan changed in r14: staged-edge consumers (5)
    "x_graph_triangles",
    "x_graph_degree_hist",
    "x_graph_kcore",
    "x_graph_coreness",
    "x_market_basket_lift",
    # (c) always-on core + r14-hardened commit path (3)
    "m1_scd2_upsert",
    "m2_j2_fact_population",
    "m5_transactional_pipeline",
    # (d) the complete r07-evidence cohort, seated in full (17)
    "x_merge_into",
    "x_olap_q22_style",
    "x_scd2_point_in_time",
    "x_skew_salted_join",
    "x_sql_frontend",
    "x_stream_dedup",
    "x_stream_sessionize",
    "x_stream_static_join",
    "x_stream_stream_full_join",
    "x_stream_stream_left_join",
    "x_stream_topk",
    "x_stream_watermark_append",
    "x_text_bigram_lm",
    "x_text_tfidf",
    "x_ts_gap_fill",
    "x_ts_sessionize_native",
    "x_validate_profile",
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
