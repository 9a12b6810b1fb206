"""As-of and banded range joins: known-answer semantics + plan shape."""

from __future__ import annotations

import datetime as dt

import pytest

from glue_jobs_for_data_pipeline_spark.operators.timeseries import (
    asof_join_backward,
    range_join_count,
)

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _ts(minutes: float) -> dt.datetime:
    return T0 + dt.timedelta(minutes=minutes)


@pytest.fixture(scope="module")
def trades_quotes(spark):
    trades = spark.createDataFrame(
        [
            (1, 1, _ts(10)),   # quote at 5 is latest <= 10
            (2, 1, _ts(5)),    # exactly at a quote ts -> inclusive match
            (3, 1, _ts(-1)),   # before any quote -> NULL
            (4, 2, _ts(30)),   # other key: its own quote stream
        ],
        "trade_id long, sym long, ts timestamp",
    )
    quotes = spark.createDataFrame(
        [
            (1, _ts(0), 100.0),
            (1, _ts(5), 105.0),
            (1, _ts(20), 120.0),  # later than trade 1 -> never matched by it
            (2, _ts(29), 200.0),
        ],
        "sym long, ts timestamp, px double",
    )
    return trades, quotes


def test_asof_backward_known_answers(spark, trades_quotes):
    trades, quotes = trades_quotes
    out = asof_join_backward(
        trades, quotes, on="sym",
        right_cols={"ts": "q_ts", "px": "q_px"},
    ).collect()
    got = {r["trade_id"]: (r["q_ts"], r["q_px"]) for r in out}
    assert len(out) == 4  # left-join: every trade survives
    assert got[1] == (_ts(5), 105.0)   # latest at-or-before, not latest overall
    assert got[2] == (_ts(5), 105.0)   # inclusive at equal timestamps
    assert got[3] == (None, None)      # nothing earlier -> NULLs
    assert got[4] == (_ts(29), 200.0)  # keys don't leak across groups


def test_asof_plan_has_no_nested_loop(spark, trades_quotes):
    trades, quotes = trades_quotes
    plan = asof_join_backward(
        trades, quotes, on="sym", right_cols={"px": "q_px"}
    )._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan


def test_batch_sessions_known_answer(spark):
    events = spark.createDataFrame(
        [
            (1, _ts(0)), (1, _ts(10)), (1, _ts(20)),   # one session
            (1, _ts(60)),                              # gap 40 > 30 -> new
            (2, _ts(0)),                               # other user
        ],
        "user_id long, ts timestamp",
    )
    from glue_jobs_for_data_pipeline_spark.operators.timeseries import (
        sessionize_batch,
    )

    out = {
        (r["user_id"], r["session_id"]): (
            r["session_start"], r["session_end"], r["n_events"]
        )
        for r in sessionize_batch(events, gap_minutes=30).collect()
    }
    assert out == {
        (1, 1): (_ts(0), _ts(20), 3),
        (1, 2): (_ts(60), _ts(60), 1),
        (2, 1): (_ts(0), _ts(0), 1),
    }


def test_streaming_sessions_agree_with_batch(spark, sf_dir):
    """The stateful streaming sessionizer's emitted sessions must be a
    subset of (and bitwise agree with) the oracle-checked batch
    sessionization — the sessions it has NOT emitted are exactly the
    pending trailing ones the watermark never passed."""
    from glue_jobs_for_data_pipeline_spark.operators.timeseries import (
        sessionize_batch,
    )
    from glue_jobs_for_data_pipeline_spark.sources.readers import load_events
    from glue_jobs_for_data_pipeline_spark.streaming.events import (
        sessionize_stateful,
    )

    batch = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in sessionize_batch(
            load_events(spark, sf_dir).select("user_id", "ts"), gap_minutes=30
        ).collect()
    }
    streamed = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in sessionize_stateful(spark, sf_dir, gap_minutes=30).collect()
    }
    assert streamed, "timeout should flush at least some sessions"
    assert streamed <= batch
    # everything missing is a trailing session (latest session per user)
    last_start = {}
    for u, s, e, n in batch:
        last_start[u] = max(last_start.get(u, s), s)
    for u, s, e, n in batch - streamed:
        assert s == last_start[u], f"non-trailing session missing for user {u}"
    # ...and conversely every session the final watermark DID pass must
    # have been flushed — so streamed is EXACTLY the closable set, not
    # merely a subset (VERDICT r05 item 7: exact row sets, not counts).
    import datetime as dt

    max_ts = max(e for _, _, e, _ in batch)
    final_wm = max_ts - dt.timedelta(minutes=1)
    gap = dt.timedelta(minutes=30)
    must_flush = {s for s in batch if s[2] + gap < final_wm}
    assert must_flush <= streamed, (
        f"{len(must_flush - streamed)} closable sessions never flushed"
    )


def test_approx_distinct_tracks_exact(spark, sf_dir):
    from pyspark.sql import functions as F

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    exact = {
        r["o_orderpriority"]: r["n"]
        for r in orders.groupBy("o_orderpriority")
        .agg(F.countDistinct("o_custkey").alias("n"))
        .collect()
    }
    approx = {
        r["o_orderpriority"]: r["n"]
        for r in orders.groupBy("o_orderpriority")
        .agg(F.approx_count_distinct("o_custkey", rsd=0.02).alias("n"))
        .collect()
    }
    for k, n in exact.items():
        assert abs(approx[k] - n) <= max(3, 0.1 * n), (k, n, approx[k])


def test_range_join_count_window_edges(spark):
    probe = spark.createDataFrame(
        [(1, 10, _ts(10))], "k long, probe_id long, ts timestamp"
    )
    events = spark.createDataFrame(
        [
            (1, _ts(10)),                           # at probe ts: counted
            (1, _ts(5)),                            # inside window: counted
            (1, _ts(5) - dt.timedelta(seconds=1)),  # 5min1s before: outside
            (1, _ts(11)),                           # after probe: outside
            (2, _ts(9)),                            # other key: outside
        ],
        "k long, ts timestamp",
    )
    out = range_join_count(
        probe, events, on="k", window_seconds=300
    ).collect()
    assert len(out) == 1
    assert out[0]["n_in_range"] == 2


def test_range_join_no_double_count_across_bands(spark):
    # probe near a band boundary: its window spans two bands, but each
    # event must still be counted exactly once
    probe = spark.createDataFrame(
        [(1, 1, _ts(5.5))], "k long, probe_id long, ts timestamp"
    )
    events = spark.createDataFrame(
        [(1, _ts(4.9)), (1, _ts(5.1))], "k long, ts timestamp"
    )
    out = range_join_count(probe, events, on="k", window_seconds=300).collect()
    assert out[0]["n_in_range"] == 2


def test_range_join_zero_match_probe_rows_survive(spark):
    """A probe row with NO in-range events must appear with count 0 —
    the 'for each probe row' contract (left-join semantics)."""
    probe = spark.createDataFrame(
        [(1, 10, _ts(10)), (3, 30, _ts(10))],
        "k long, probe_id long, ts timestamp",
    )
    events = spark.createDataFrame(
        [(1, _ts(9)), (3, _ts(20))], "k long, ts timestamp"
    )
    out = {r["probe_id"]: r["n_in_range"] for r in range_join_count(
        probe, events, on="k", window_seconds=300
    ).collect()}
    assert out == {10: 1, 30: 0}


def test_approx_percentiles_track_exact(spark, sf_dir):
    from pyspark.sql import functions as F

    from glue_jobs_for_data_pipeline_spark.plans.catalog_ext import (
        x_olap_approx_percentiles,
        x_olap_percentiles,
    )

    # the r18 quantitative-gate output: every (group, q) rank check ok
    gated = x_olap_approx_percentiles(spark, sf_dir).collect()
    assert gated and all(r["rank_ok"] for r in gated), gated

    # value-level tracking (the pre-r18 assertion, now on the raw agg)
    exact = {
        (r["l_returnflag"], r["q"]): r["pct_value"]
        for r in x_olap_percentiles(spark, sf_dir).collect()
    }
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    qs = [0.25, 0.5, 0.9]
    approx = {}
    for r in (
        li.groupBy("l_returnflag")
        .agg(
            F.expr(
                "approx_percentile(l_extendedprice,"
                " array(0.25, 0.5, 0.9), 10000)"
            ).alias("pct")
        )
        .collect()
    ):
        for q, v in zip(qs, r["pct"]):
            approx[(r["l_returnflag"], q)] = v
    assert set(approx) == set(exact)
    for k, e in exact.items():
        assert abs(approx[k] - e) <= max(abs(e) * 0.02, 1.0), (k, e, approx[k])
