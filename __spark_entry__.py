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


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the fact-population star join (SURVEY §2.9 M2) at sf0.001."""
    return QUERIES["m2_j2_fact_population"](spark, "/root/testdata/sf0.001")


# The driver's correctness gate consumes exactly the FIRST 50 keys of
# queries(), so registration order is the coverage knob. Round 7
# priority order: (a) every oracle-able key that has NEVER been
# driver-hash-green in any committed CORRECTNESS file — 16 carried from
# earlier in the round (streaming-drain promotions, tfidf/bigram,
# q10/q14, histogram, gap-fill, minhash-md5, native sessionize,
# profile/anomaly/quality-keep) plus the 16-query TPC-H completion pack
# (plans/tpch_pack.py) — then (b) queries whose semantics changed this
# round (freq-items scalarization, MERGE NULL-clause fix, jaccard
# uncapped-_df restructure), then (c) the oldest r04-evidence core
# keys (only 4 fit after the packs took their slots — s1/p8/q1-style/
# dedup-exact; the rest of the r04 cohort rides the committed full
# sweep this round and rotates back in next round). Entries rotated
# OUT keep a regression check via
# tools/oracle_check.py over ALL keys — run pre-commit, full sweep
# committed per round as ORACLE_SWEEP_r{N}.json.
_WINDOW_FIRST = [
    # (a) never driver-green: carried-from-earlier-in-round (16)
    "x_stream_sessionize",
    "x_stream_dedup",
    "x_stream_static_join",
    "x_stream_watermark_append",
    "x_stream_stream_left_join",
    "x_text_tfidf",
    "x_text_bigram_lm",
    "x_validate_profile",
    "x_events_anomaly_zscore",
    "x_corpus_dedup_quality_keep",
    "x_dedup_minhash_md5",
    "x_olap_q10_style",
    "x_olap_q14_style",
    "x_olap_histogram",
    "x_ts_gap_fill",
    "x_ts_sessionize_native",
    # (a) never driver-green: TPC-H completion pack (16)
    "x_olap_q2_style",
    "x_olap_q4_style",
    "x_olap_q6_style",
    "x_olap_q7_style",
    "x_olap_q8_style",
    "x_olap_q9_style",
    "x_olap_q11_style",
    "x_olap_q12_style",
    "x_olap_q13_style",
    "x_olap_q15_style",
    "x_olap_q16_style",
    "x_olap_q17_style",
    "x_olap_q19_style",
    "x_olap_q20_style",
    "x_olap_q21_style",
    "x_olap_q22_style",
    # (a) never driver-green: scale-technique pack (3)
    "x_sql_frontend",
    "x_skew_salted_join",
    "x_stream_topk",
    # (a) never driver-green: analytics pack (3)
    "x_events_funnel",
    "x_events_retention",
    "x_olap_corr",
    # (a) never driver-green: simhash md5 twin + full-outer stream join (2)
    "x_dedup_simhash_md5",
    "x_stream_stream_full_join",
    # (a) never driver-green: IVM join / SCD2 as-of / equi-depth (3)
    "x_ingest_incremental_join",
    "x_scd2_point_in_time",
    "x_olap_equidepth_histogram",
    # (b) changed this round (3)
    "x_olap_freq_items",
    "x_merge_into",
    "x_dedup_ngram_jaccard",
    # (c) oldest driver evidence (r04) — core parity + headliners (4)
    "s1_csv_bulk_load",
    "p8_f12_table_dispatch",
    "x_olap_q1_style",
    "x_dedup_exact",
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
