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
# queries(), so registration order is the coverage knob. Round 18
# priority order (the r17 verdict's task #1: seat the carried r15
# cohort + the oldest parity tranche; all 50 oracle-able, target
# 50/50 hash-green with zero no_oracle rows):
# (a) keys NEW in r18: x_storage_positional_deletes ((file,row_index)
#     merge-on-read deletes, Iceberg v2 positional delete files),
#     x_storage_schema_widening (lossless type-promotion "widen" op),
#     x_storage_retention_policy (size-triggered fold of
#     delta/dv/ledger debt + base file compaction);
# (b) keys whose PLAN or GATE changed in r18:
#     x_storage_mor_upsert (upsert now purges its keys from the dv —
#     resurrection semantics, ADVICE r17 — and delete_where evaluates
#     over the merged logical state; oracle updated accordingly),
#     x_storage_deletion_vectors (delete_where merged-state read;
#     empty-side compaction guards),
#     x_olap_approx_distinct / x_olap_approx_percentiles /
#     x_olap_hll_partial_merge (upgraded from rows-only to
#     QUANTITATIVE hash gates: exact counts + deterministic
#     error/rank/merge-consistency booleans — VERDICT r17 task #5),
#     x_stream_exactly_once / x_stream_incremental_mv /
#     x_corpus_stream_ingest_dedup (replay test is now MAX-based so
#     the ledger can fold under retention),
#     x_dedup_minhash_lsh / x_dedup_simhash / x_corpus_prep_neardup
#     (late r18: upgraded from rows-only to quantitative contract
#     gates — exact-count anchors from the staged scored pair table
#     plus deterministic recall/completeness/consistency booleans;
#     x_dedup_pairs_stage itself now hash-checks (inter, jaccard)
#     scores too but is NOT re-seated, same carry rule as r17's
#     bound tightening);
# (c) always-on m1/m2 core + m5;
# (d) the carried r15 cohort (driver evidence r15 — the verdict's
#     named leftovers first, then the rest of the cohort in its r15
#     window order; x_storage_branch_isolation,
#     x_emb_centroids_stage and x_split_group_kfold yielded their
#     slots to the three late-r18 keys in (a), and
#     x_emb_cluster_quality, x_olap_countmin_sketch and
#     x_emb_scatter_matrix to the three upgraded sketch gates in
#     (b) — all six carry to r19);
# (e) the OLDEST parity tranche s1..p5 (driver evidence r14).
# Carried to r19 (sweep-green at both SFs every round): parity
# p6..l1 + f1..f11 + v1..v4 + m3/m1b/m4 (r17 evidence), the
# r16-seated x_* cohort (r16 evidence), and the r17-refreshed
# x_dedup_fuzzy_match..x_storage_zorder_roundtrip tranche (r17
# evidence). x_dedup_pairs_stage's candidate-mass bound tightened in
# r18 (per-doc ceil(len/2) sum) but the switch is output-identical
# and it was driver-seated r17 — carried, not re-seated.
# Rows-only keys: NONE as of late r18 — the last four
# (x_dedup_minhash_lsh, x_dedup_simhash, x_corpus_prep_neardup,
# x_olap_freq_items) all moved to quantitative hash gates, so every
# registered key is oracle-checked.
_WINDOW_ROWS_ONLY_OK: set[str] = set()  # r18: no rows-only keys seated

_WINDOW_FIRST = [
    # (a) new in r18 (6)
    "x_storage_positional_deletes",
    "x_storage_schema_widening",
    "x_storage_retention_policy",
    "x_storage_rollback_expire",
    "x_storage_check_constraints",
    "x_storage_partition_compaction",
    # (b) plan/gate changed in r18 (11)
    "x_storage_mor_upsert",
    "x_storage_deletion_vectors",
    "x_olap_approx_distinct",
    "x_olap_approx_percentiles",
    "x_olap_hll_partial_merge",
    "x_stream_exactly_once",
    "x_stream_incremental_mv",
    "x_corpus_stream_ingest_dedup",
    "x_dedup_minhash_lsh",
    "x_dedup_simhash",
    "x_corpus_prep_neardup",
    # (c) always-on core (3)
    "m1_scd2_upsert",
    "m2_j2_fact_population",
    "m5_transactional_pipeline",
    # (d) carried r15 cohort, r15 evidence (16)
    "x_text_boilerplate_removal",
    "x_text_string_kernels",
    "x_ts_asof_forward",
    "x_ts_ohlc",
    "x_ts_twap",
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
    "x_text_dsir_weights",
    # (e) oldest parity tranche, r14 evidence (14)
    "s1_csv_bulk_load",
    "s2_truncate_and_load",
    "s3_table_scan",
    "s4_s7_staging_lifecycle",
    "s5_ctas_cached",
    "s6_insert_select_append",
    "s1b_json_roundtrip",
    "s1c_orc_roundtrip",
    "s8_row_generator",
    "p1_projection",
    "p2_computed_column",
    "p3_literal_column",
    "p4_equality_filter",
    "p5_conjunction",
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
