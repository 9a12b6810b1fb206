"""Time-series joins Spark lacks as built-ins (SURVEY §7 extension set):
backward as-of join and banded range join, both expressed as compositions
of existing DataFrame ops — no UDFs, one shuffle each.

As-of join (the "most recent quote for each trade" join): naive SQL is a
correlated subquery / inequality join, which Spark plans as a
BroadcastNestedLoopJoin — quadratic. The scale-safe shape used here is
the tagged-union trick: union both sides, sort each key's rows by
(time, side) in ONE window pass, and carry the right side's payload
forward with last(ignorenulls) — every left row then holds the payload
of the most recent right row at-or-before it. One shuffle on the key,
linear work per key, no join explosion at any scale.

Range join ("all events within [t-w, t]"): equality-banded — bucket time
into width-w bands, explode the probe side into the (at most two) bands
its window overlaps, equi-join on (key, band), then filter the exact
range. The inequality never reaches the join operator, so the plan is an
ordinary shuffled equi-join with per-band fan-out bounded by band
population, not a nested loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: dict[str, str] | None = None,
) -> DataFrame:
    """For each left row, attach the right row with the greatest
    ``right_ts`` <= ``left_ts`` within the same key group (backward as-of,
    inclusive). Left rows with no earlier right row keep NULLs — left-join
    semantics, matching ``ASOF LEFT JOIN`` in engines that have it.

    ``right_cols`` maps right column -> output alias (e.g.
    ``{"ts": "matched_ts", "value": "matched_value"}``).

    Determinism: rows sort by (ts, side) with right-before-left at equal
    timestamps (inclusive match); if the right side can hold several rows
    at the same (key, ts), pre-aggregate it to one row per (key, ts) —
    otherwise "the" most recent row is not well-defined in ANY engine.
    """
    keys = [on] if isinstance(on, str) else list(on)
    right_cols = right_cols or {"value": "matched_value"}
    carried = [f"_r_{c}" for c in right_cols]

    r2 = right.select(
        *keys,
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        *[F.col(c).alias(f"_r_{c}") for c in right_cols],
    )
    left_payload = [c for c in left.columns if c not in keys and c != left_ts]
    l2 = left.select(
        *keys,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        *[F.col(c) for c in left_payload],
    )
    unioned = l2.unionByName(r2, allowMissingColumns=True)

    w = (
        Window.partitionBy(*keys)
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for c, alias in right_cols.items():
        unioned = unioned.withColumn(
            alias, F.last(f"_r_{c}", ignorenulls=True).over(w)
        )
    return unioned.filter(F.col("_side") == 1).select(
        *keys, *left_payload, F.col("_ts").alias(left_ts),
        *[alias for alias in right_cols.values()],
    )


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: dict[str, str] | None = None,
) -> DataFrame:
    """Mirror of :func:`asof_join_backward`: attach the right row with
    the SMALLEST ``right_ts`` >= ``left_ts`` per key (forward as-of,
    inclusive — "the next quote at or after each trade"). Same
    tagged-union shape, with the window walking time BACKWARD: sort by
    (ts DESC, side) with right-before-left at equal timestamps, carry
    the right payload with last(ignorenulls) — each left row then holds
    the nearest following right row. One shuffle, no inequality join,
    same determinism contract as the backward variant (pre-aggregate
    the right side if it can repeat a (key, ts)).
    """
    keys = [on] if isinstance(on, str) else list(on)
    right_cols = right_cols or {"value": "matched_value"}

    r2 = right.select(
        *keys,
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        *[F.col(c).alias(f"_r_{c}") for c in right_cols],
    )
    left_payload = [c for c in left.columns if c not in keys and c != left_ts]
    l2 = left.select(
        *keys,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        *[F.col(c) for c in left_payload],
    )
    unioned = l2.unionByName(r2, allowMissingColumns=True)

    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("_ts").desc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for c, alias in right_cols.items():
        unioned = unioned.withColumn(
            alias, F.last(f"_r_{c}", ignorenulls=True).over(w)
        )
    return unioned.filter(F.col("_side") == 1).select(
        *keys, *left_payload, F.col("_ts").alias(left_ts),
        *[alias for alias in right_cols.values()],
    )


def sessionize_batch(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
) -> DataFrame:
    """Gap-based sessionization as a pure batch plan: the lag-mark-cumsum
    idiom. A row starts a new session when it is its key's first event or
    follows a gap > ``gap_minutes``; the running sum of start-markers is
    the session id; one groupBy aggregates the bounds.

    Same semantics as streaming.sessionize_stateful, but SQL-expressible
    (LAG + SUM OVER + GROUP BY) so the differential oracle covers it —
    and it emits ALL sessions including each key's trailing one, which a
    correct streaming operator must keep pending. Two shuffles total
    (key window + group-by on the same key; the second collapses to a
    local aggregation since partitioning is unchanged).
    """
    w = Window.partitionBy(key_col).orderBy(ts_col)
    gap = F.make_dt_interval(mins=F.lit(gap_minutes))
    marked = events.select(
        key_col,
        ts_col,
        F.when(
            F.lag(ts_col).over(w).isNull()
            | (F.col(ts_col) - F.lag(ts_col).over(w) > gap),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("_new"),
    )
    w_run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sess = marked.select(
        key_col,
        ts_col,
        F.sum("_new").over(w_run).alias("session_id"),
    )
    return sess.groupBy(key_col, "session_id").agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    )


def range_join_count(
    probe: DataFrame,
    events: DataFrame,
    on: str | list[str],
    probe_ts: str = "ts",
    event_ts: str = "ts",
    window_seconds: int = 300,
    count_alias: str = "n_in_range",
) -> DataFrame:
    """For each probe row, count events of the same key with
    ``event_ts`` in ``[probe_ts - window, probe_ts]`` (inclusive both
    ends; a probe row that also exists in ``events`` counts itself).
    EVERY probe row is returned — a probe with no in-range events gets
    count 0 (left-join semantics, matching the docstring's "for each
    probe row" contract).

    Banded equi-join: band width == window length, so each probe interval
    overlaps at most 2 bands -> the probe side fans out x2, the event
    side not at all, and each event lands in exactly one band (no double
    counting). The join is a plain shuffled LEFT equi-join on
    (key, band); out-of-range and unmatched rows contribute 0 via a
    conditional sum, so zero-match probes survive to the output.
    """
    keys = [on] if isinstance(on, str) else list(on)
    band_us = F.lit(window_seconds * 1_000_000)
    p_us = F.unix_micros(F.col(probe_ts))
    e_us = F.unix_micros(F.col(event_ts))

    p2 = probe.withColumn(
        "_band",
        F.explode(
            F.array(F.floor(p_us / band_us) - 1, F.floor(p_us / band_us))
        ),
    )
    e2 = events.select(
        *keys,
        F.col(event_ts).alias("_ets"),
        F.floor(e_us / band_us).alias("_band"),
    )
    lo = F.col(probe_ts) - F.make_dt_interval(secs=F.lit(window_seconds))
    in_range = F.col("_ets").between(lo, F.col(probe_ts))
    return (
        p2.join(e2, [*keys, "_band"], "left")
        .groupBy(*keys, *[c for c in probe.columns if c not in keys])
        .agg(
            F.sum(F.when(in_range, 1).otherwise(0))
            .cast("bigint")
            .alias(count_alias)
        )
    )
