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
# queries(), so registration order is the coverage knob. Round 11
# priority order: (a) the 21 r10-created/graduated keys that have NEVER
# been driver-hash-checked — the documented r10 carry list, led by
# x_olap_global_rank (the r10 red row: the rank kernel's pids depended
# on a cache surviving between jobs; rebuilt this round as literal
# boundary searchsorted — operators/rank.py) and including its kernel
# consumers x_olap_rfm_scores, x_corpus_epoch_shuffle,
# x_pack_length_buckets; (b) the last two keys with pre-r05 driver
# evidence (x_text_vocab_topk, x_text_pii_redact); (c) oracle-able keys
# whose PLAN changed this round: the remaining kernel consumers
# x_olap_gini + x_olap_revenue_concentration, and
# m2_j2_fact_population (size-gated dim broadcasts); (d) the r06-
# evidence cohort (19 keys) — the oldest driver evidence left in the
# catalog; (e) x_pack_sequences — oracle-GRADUATED this round (md5
# pack-group + recursive-CTE twin), never driver-hash-checked; (f)
# flex slots from the r07 cohort.
# x_olap_freq_items stays OUT permanently — rows-only by design
# (sketch output; superset property tested in tests/test_plans.py).
# Entries rotated OUT keep a regression check via
# tools/oracle_check.py over ALL keys — run pre-commit, full sweep
# committed per round as ORACLE_SWEEP_r{N}.json.
_WINDOW_FIRST = [
    # (a) never driver-hash-checked (21; r10 carry list)
    "x_olap_global_rank",
    "x_olap_rfm_scores",
    "x_corpus_epoch_shuffle",
    "x_pack_length_buckets",
    "x_scd1_overwrite",
    "x_scd3_prev_value",
    "x_scd2_late_arriving",
    "x_fact_accumulating_snapshot",
    "x_fact_periodic_snapshot",
    "x_dedup_golden_record",
    "x_dedup_embedding_cosine_lsh",
    "x_dim_junk",
    "x_fact_order_part_bridge",
    "x_olap_role_playing_dates",
    "x_olap_drill_across",
    "x_ingest_conform_schema",
    "x_sim_lsh_topk",
    "x_sim_ivf_topk",
    "x_storage_checksum_ranges",
    "x_storage_zorder_layout",
    "x_validate_quarantine",
    # (b) last pre-r05 driver evidence (2)
    "x_text_vocab_topk",
    "x_text_pii_redact",
    # (c) plan changed in r11 (4): gini + revenue_concentration ride the
    # rebuilt rank kernel; m2's dim broadcasts are size-gated; m1's
    # surrogate keys are size-gated between window and rank kernel
    "x_olap_gini",
    "x_olap_revenue_concentration",
    "m2_j2_fact_population",
    "m1_scd2_upsert",
    # (d) r06-evidence cohort (6 of 19; x_ts_range_join,
    # x_ts_sessionize_batch, x_ts_asof_join, x_json_extract,
    # x_olap_unpivot, x_olap_range_frame, x_emb_quantize_int8,
    # x_ingest_latest_by_key, x_ingest_schema_evolution,
    # x_olap_correlated_scalar, x_olap_percentiles,
    # x_sample_token_budget, x_ingest_incremental_dedup carry to r12 —
    # displaced by the never-checked r11-new cohort below, all
    # sweep-green at both SFs)
    "x_corpus_build_full",
    "x_corpus_dedup_cc",
    "x_dedup_cc_clusters",
    "x_ingest_cdc_apply",
    "x_split_neardup_leakage",
    "x_stream_window_agg",
    # (e) r11-NEW / oracle-graduated, never driver-hash-checked (17):
    # the rows-only graduation (pack_sequences), the curation pack
    # (winnowing fingerprints + decontam, normalized dedup, temperature
    # mixing, matryoshka truncation, compaction planning, BPE merges,
    # linkage patterns, subword segmentation), and the media pack
    # (audio frames, VAD segments, scene cuts)
    "x_pack_sequences",
    "x_text_winnow_stats",
    "x_decontam_winnow",
    "x_dedup_normalized_text",
    "x_corpus_temperature_mix",
    "x_emb_matryoshka",
    "x_storage_compaction_plan",
    "x_dedup_winnow_pairs",
    "x_corpus_curriculum_order",
    "x_text_quality_logit",
    "x_dedup_pair_features",
    "x_text_bpe_merges",
    "x_dedup_linkage_patterns",
    "x_mm_audio_features",
    "x_mm_audio_vad_segments",
    "x_mm_video_scene_cuts",
    "x_text_subword_encode",
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
