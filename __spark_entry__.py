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
# queries(), so registration order is the coverage knob. Rounds 1-2
# driver-checked the 46 parity entries plus 8 extensions; 32 extension
# queries had never produced a driver row. Round 3 front-loads ALL 32
# never-checked entries (changed-since-last-check modules first:
# similarity, skew, streaming, simhash) plus m5 (txn.py changed this
# round) and as many parity entries as fit. Entries rotated OUT of the
# window keep a regression check via tools/oracle_check.py over ALL
# keys — run pre-commit, full sweep committed per round as
# ORACLE_SWEEP_r{N}.json. Update _WINDOW_FIRST each round from the
# still-unchecked set in CORRECTNESS_r{N}.json.
_WINDOW_FIRST = [
    # new in r03 — first driver check
    "x_text_pii_redact",
    "x_dedup_substring_spans",
    "x_stream_dedup",
    "x_emb_centroid_elements",
    "x_text_vocab_topk",
    "x_text_chunking",
    "x_emb_quantize_int8",
    "x_sim_ivf_kmeans_topk",
    "x_pack_sequences",
    # modules modified after their last driver check
    "x_sim_lsh_topk",
    "x_sim_ivf_topk",
    "x_sim_bruteforce_topk",
    "x_skew_salted_agg",
    "x_stream_window_agg",
    "x_stream_sessionize",
    "x_stream_watermark_append",
    "x_dedup_simhash",
    "x_dedup_minhash_lsh",
    "x_dedup_embedding_cosine",
    "x_dedup_embedding_cosine_lsh",
    "x_mm_decode_metadata",
    "x_ts_range_join",
    "x_sample_hash",
    "x_sample_stratified",
    # never driver-checked, code stable since r01
    "x_olap_topk_per_group",
    "x_olap_rollup",
    "x_olap_left_outer_join",
    "x_olap_anti_join",
    "x_olap_set_ops",
    "x_olap_analytic_window",
    "x_olap_pivot",
    "x_olap_count_distinct",
    "x_olap_percentiles",
    "x_olap_approx_distinct",
    "x_json_extract",
    "x_mm_frame_sample",
    "x_ts_asof_join",
    "x_ts_sessionize_batch",
    "x_ingest_latest_by_key",
    "x_corpus_stats",
    "x_corpus_prep_neardup",
    # parity on changed code this round (sources/txn.py)
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
