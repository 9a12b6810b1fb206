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
