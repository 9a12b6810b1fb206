"""Semantic tests for plans/analytics_pack.py. The oracle sweep pins the
fixture values; these pin the ORDERING semantics (a funnel step only
counts events after the previous step) and the retention invariants
(week-0 row equals cohort size) on hand-built frames where the corner
cases are explicit.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from glue_jobs_for_data_pipeline_spark.plans import analytics_pack as ap


def _events(spark, rows):
    return spark.createDataFrame(
        [
            (i, dt.datetime(2024, 1, d, h), u, t, 1.0, "{}")
            for i, (u, t, d, h) in enumerate(rows)
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )


def test_funnel_requires_strict_order(spark, tmp_path, monkeypatch):
    # user 1: view(d1) -> click(d2) -> purchase(d3)  = converts fully
    # user 2: click(d1) -> view(d2)                  = click BEFORE view: step2 no
    # user 3: view(d1), purchase(d2) (no click)      = stops at step 1
    ev = _events(
        spark,
        [
            (1, "view", 1, 0), (1, "click", 2, 0), (1, "purchase", 3, 0),
            (2, "click", 1, 0), (2, "view", 2, 0),
            (3, "view", 1, 0), (3, "purchase", 2, 0),
        ],
    )
    monkeypatch.setattr(ap, "load_events", lambda spark, sf_dir: ev)
    row = ap.x_events_funnel(spark, "unused").collect()[0]
    assert row["n_view"] == 3
    assert row["n_click_after"] == 1  # only user 1
    assert row["n_purchase_after"] == 1


def test_funnel_same_timestamp_does_not_convert(spark, monkeypatch):
    # click exactly AT the view instant is not after it (strict >)
    ev = _events(spark, [(1, "view", 1, 5), (1, "click", 1, 5)])
    monkeypatch.setattr(ap, "load_events", lambda spark, sf_dir: ev)
    row = ap.x_events_funnel(spark, "unused").collect()[0]
    assert row["n_view"] == 1 and row["n_click_after"] == 0


def test_retention_week_zero_equals_cohort_size(spark, sf_dir):
    ret = ap.x_events_retention(spark, sf_dir)
    week0 = (
        ret.filter(F.col("week_offset") == 0)
        .agg(F.sum("n_users"))
        .collect()[0][0]
    )
    from glue_jobs_for_data_pipeline_spark.sources.readers import load_events

    n_users = (
        load_events(spark, sf_dir).select("user_id").distinct().count()
    )
    # every user is active in their own cohort week by construction
    assert week0 == n_users
    # no negative offsets, and each (cohort, offset) appears once
    assert ret.filter(F.col("week_offset") < 0).count() == 0
    assert ret.count() == ret.select("cohort_week", "week_offset").distinct().count()


def test_corr_matches_pure_python(spark, sf_dir):
    import math

    from glue_jobs_for_data_pipeline_spark.sources.readers import load_table

    got = {
        r["l_returnflag"]: (r["corr_qty_price"], r["cov_qty_price"])
        for r in ap.x_olap_corr(spark, sf_dir).collect()
    }
    rows = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_returnflag", "l_quantity", "l_extendedprice")
        .collect()
    )
    by_flag: dict[str, list[tuple[float, float]]] = {}
    for r in rows:
        by_flag.setdefault(r["l_returnflag"], []).append(
            (r["l_quantity"], r["l_extendedprice"])
        )
    for flag, pts in by_flag.items():
        n = len(pts)
        mx = sum(p[0] for p in pts) / n
        my = sum(p[1] for p in pts) / n
        sxy = sum((x - mx) * (y - my) for x, y in pts)
        sxx = sum((x - mx) ** 2 for x, y in pts)
        syy = sum((y - my) ** 2 for x, y in pts)
        want_corr = sxy / math.sqrt(sxx * syy)
        want_cov = sxy / (n - 1)
        assert abs(got[flag][0] - want_corr) < 1e-9
        assert abs(got[flag][1] - want_cov) / max(abs(want_cov), 1) < 1e-9


def test_pagerank_matches_pure_python_power_iteration(spark):
    """8 iterations on a small directed graph with a dangling node must
    match the dense reference to float tolerance, and mass must be
    conserved."""
    from glue_jobs_for_data_pipeline_spark.operators.graph import pagerank

    # node 5 only receives (no out-edges) -> exercises the dangling path
    edges = [(1, 2), (1, 3), (2, 3), (3, 1), (4, 3), (3, 5)]
    e = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: r["rank"] for r in pagerank(e, iterations=8).collect()
    }
    nodes = sorted({u for p in edges for u in p})
    n = len(nodes)
    out = {u: [v for (s, v) in edges if s == u] for u in nodes}
    r = {u: 1.0 / n for u in nodes}
    d = 0.85
    for _ in range(8):
        dangling = sum(r[u] for u in nodes if not out[u])
        contrib = {u: 0.0 for u in nodes}
        for u in nodes:
            for v in out[u]:
                contrib[v] += r[u] / len(out[u])
        base = (1 - d) / n + d * dangling / n
        r = {u: base + d * contrib[u] for u in nodes}
    assert set(got) == set(nodes)
    for u in nodes:
        assert abs(got[u] - r[u]) < 1e-9, (u, got[u], r[u])
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_pagerank_sink_accumulates_rank(spark):
    # 1->3, 2->3: node 3 must outrank its sources
    e = spark.createDataFrame([(1, 3), (2, 3)], "src long, dst long")
    got = {r["node"]: r["rank"] for r in pagerank_helper(spark, e)}
    assert got[3] > got[1] and got[3] > got[2]


def pagerank_helper(spark, e):
    from glue_jobs_for_data_pipeline_spark.operators.graph import pagerank

    return pagerank(e, iterations=6).collect()


def test_pagerank_int_grid_tracks_float_tier(spark):
    """The SQL-statable integer-grid tier (r14 graduation): scaled
    ranks must track the float tier within the flooring error bound
    ((|E|+n) * 2^-40 per round) and reproduce bit-identically under a
    different input partitioning — the determinism the oracle hash
    relies on. Includes a dangling node to exercise the dm path."""
    from glue_jobs_for_data_pipeline_spark.operators.graph import (
        pagerank,
        pagerank_int_grid,
    )

    edges = [(1, 2), (1, 3), (2, 3), (3, 1), (4, 3), (3, 5)]
    e = spark.createDataFrame(edges, "src long, dst long")
    flt = {r["node"]: r["rank"] for r in pagerank(e, iterations=8).collect()}
    grid = {
        r["node"]: r["rank_scaled"]
        for r in pagerank_int_grid(e, iterations=8).collect()
    }
    s = float(1 << 40)
    assert set(grid) == set(flt)
    for u in flt:
        # 8 rounds x (|E|+n)=11 floors of < 2^-40 each, plus init floor
        assert abs(grid[u] / s - flt[u]) < 1e-7, (u, grid[u] / s, flt[u])
    again = {
        r["node"]: r["rank_scaled"]
        for r in pagerank_int_grid(e.repartition(5), iterations=8).collect()
    }
    assert again == grid
