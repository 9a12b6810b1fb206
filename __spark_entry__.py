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
# queries(), so registration order is the coverage knob. Round 6
# (VERDICT r05 item 5): lead with the 9 events-family queries broken
# or blocked by the r05 fixture dtype change (now fixed by the
# schema-branching reader) plus the 2 re-scalarized array-output
# queries, then the 15 keys that have never been green in ANY
# committed CORRECTNESS file, then the 13 whose last driver green is
# r01/r02 (oldest evidence first), then the VERDICT-named r04-last
# OLAP/corpus slots. Entries rotated OUT keep a regression check via
# tools/oracle_check.py over ALL keys — run pre-commit, full sweep
# committed per round as ORACLE_SWEEP_r{N}.json.
_WINDOW_FIRST = [
    # events family: red/wrong/blocked at r05 solely via load_events /
    # read_events_stream; re-green under the timestamp[us] fixture (9)
    "x_ts_asof_join",
    "x_ts_range_join",
    "x_ts_sessionize_batch",
    "x_ingest_latest_by_key",
    "x_json_extract",
    "x_olap_freq_items",
    "x_stream_window_agg",
    "p6_null_predicate",
    "x_olap_range_frame",
    # r05 red on array-typed outputs — scalarized this round (2)
    "x_olap_percentiles",
    "x_emb_quantize_int8",
    # never green in any committed CORRECTNESS file (15)
    "x_sim_lsh_topk",
    "x_sim_ivf_topk",
    "x_sim_ivf_kmeans_topk",
    "x_sim_pq_topk",
    "x_sim_ivfpq_topk",
    "x_dedup_minhash_lsh",
    "x_dedup_simhash",
    "x_dedup_embedding_cosine_lsh",
    "x_pack_sequences",
    "x_olap_approx_distinct",
    "x_corpus_prep_neardup",
    "x_stream_static_join",
    "x_stream_sessionize",
    "x_stream_dedup",
    "x_stream_watermark_append",
    # last driver green r01/r02 — oldest evidence (13)
    "a1_count_star",
    "l1_limit",
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
    # r04-last OLAP/corpus re-checks (VERDICT item 5 names; the four
    # TPC-H-style/cube slots it also named stay sweep-covered — driver
    # slots go to this round's NEW operators instead, which have no
    # driver evidence at all yet)
    "x_olap_unpivot",
    "x_olap_correlated_scalar",
    "x_corpus_build_full",
    "x_merge_into",
    # new this round (fill to 50): near-dup connected-component
    # clustering, cluster dedup, token-budget sampling, CDC apply,
    # schema evolution, incremental dedup, split-leakage audit
    "x_dedup_cc_clusters",
    "x_corpus_dedup_cc",
    "x_sample_token_budget",
    "x_ingest_cdc_apply",
    "x_ingest_schema_evolution",
    "x_ingest_incremental_dedup",
    "x_split_neardup_leakage",
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
