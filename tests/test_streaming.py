"""Streaming surface: stream==batch equivalence and the stateful sessionizer."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from glue_jobs_for_data_pipeline_spark.sources.readers import load_events
from glue_jobs_for_data_pipeline_spark.streaming.events import (
    run_stream_to_batch,
    sessionize_stateful,
)


def test_stream_equals_batch(spark, sf_dir):
    streamed = run_stream_to_batch(spark, sf_dir, query_name="t_agg")
    batch = (
        load_events(spark, sf_dir)
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("total_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )
    s = sorted(map(tuple, streamed.collect()))
    b = sorted(map(tuple, batch.collect()))
    assert s == b


def test_sessionize_emits_valid_sessions(spark, sf_dir):
    sessions = sessionize_stateful(spark, sf_dir, gap_minutes=30).collect()
    assert len(sessions) > 0
    for s in sessions:
        assert s["session_start"] <= s["session_end"]
        assert s["n_events"] >= 1
    # sessions for one user don't overlap
    by_user = {}
    for s in sessions:
        by_user.setdefault(s["user_id"], []).append(s)
    for user, ss in by_user.items():
        ss.sort(key=lambda s: s["session_start"])
        for a, b in zip(ss, ss[1:]):
            assert a["session_end"] < b["session_start"], f"user {user} overlap"
