"""Semantic property tests for plans/mining_pack.py. Value-level
equality vs DuckDB is covered by the differential sweep
(tools/oracle_check.py — all 10 keys oracle-checked at sf0.001 and
sf0.01); these tests pin the properties the sweep can't see: the
triangle counter vs a brute-force enumerator on a known graph, as-of
forward semantics on a hand-built fixture, skyline non-dominance,
transition-probability normalization, regression on a perfect line,
and orphan injection.
"""

from __future__ import annotations

import itertools

from pyspark.sql import functions as F

from glue_jobs_for_data_pipeline_spark.operators.graph import triangle_counts
from glue_jobs_for_data_pipeline_spark.operators.timeseries import (
    asof_join_forward,
)
from glue_jobs_for_data_pipeline_spark.plans import mining_pack as mp


def test_triangle_counts_vs_bruteforce(spark):
    # K4 on {1,2,3,4} plus a pendant (5) and a disjoint edge (6,7):
    # K4 has C(4,3)=4 triangles; each K4 node sits in 3 of them.
    edges = [(a, b) for a, b in itertools.combinations([1, 2, 3, 4], 2)]
    edges += [(4, 5), (6, 7), (2, 1), (3, 3)]  # dup reversed, self-loop
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {
        r["node"]: r["n_triangles"] for r in triangle_counts(df).collect()
    }
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}


def test_triangle_counts_empty_when_acyclic(spark):
    df = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], ["src", "dst"])
    assert triangle_counts(df).count() == 0


def test_asof_forward_picks_next_at_or_after(spark):
    left = spark.createDataFrame(
        [(1, 10, "a"), (1, 25, "b"), (1, 40, "c"), (2, 5, "d")],
        ["k", "ts", "tag"],
    )
    right = spark.createDataFrame(
        [(1, 25, 100.0), (1, 30, 200.0)], ["k", "ts", "value"]
    )
    out = {
        r["tag"]: (r["matched_ts"], r["matched_value"])
        for r in asof_join_forward(
            left, right, on="k",
            right_cols={"ts": "matched_ts", "value": "matched_value"},
        ).collect()
    }
    assert out["a"] == (25, 100.0)   # strictly after
    assert out["b"] == (25, 100.0)   # inclusive at equal ts
    assert out["c"] == (None, None)  # nothing after -> left-join NULLs
    assert out["d"] == (None, None)  # key with no right rows


def test_skyline_members_are_mutually_nondominated(spark, sf_dir):
    rows = mp.x_olap_skyline(spark, sf_dir).collect()
    assert rows, "skyline cannot be empty on a non-empty table"
    for p, q in itertools.permutations(rows, 2):
        dominates = (
            q["p_retailprice"] <= p["p_retailprice"]
            and q["p_size"] >= p["p_size"]
            and (
                q["p_retailprice"] < p["p_retailprice"]
                or q["p_size"] > p["p_size"]
            )
        )
        assert not dominates, (p, q)


def test_skyline_excluded_rows_are_dominated(spark, sf_dir):
    from glue_jobs_for_data_pipeline_spark.sources.readers import load_table

    sky = [
        (r["p_retailprice"], r["p_size"])
        for r in mp.x_olap_skyline(spark, sf_dir).collect()
    ]
    sample = (
        load_table(spark, sf_dir, "part")
        .select("p_retailprice", "p_size")
        .limit(50)
        .collect()
    )
    for row in sample:
        pr, sz = row["p_retailprice"], row["p_size"]
        in_sky = (pr, sz) in sky
        dominated = any(
            qp <= pr and qs >= sz and (qp < pr or qs > sz) for qp, qs in sky
        )
        assert in_sky or dominated, (pr, sz)


def test_transition_probabilities_normalize(spark, sf_dir):
    rows = mp.x_events_transitions(spark, sf_dir).collect()
    by_from: dict[str, float] = {}
    for r in rows:
        by_from[r["from_type"]] = by_from.get(r["from_type"], 0.0) + r[
            "p_transition"
        ]
    for ft, total in by_from.items():
        assert abs(total - 1.0) < 1e-9, (ft, total)


def test_regression_recovers_perfect_line(spark):
    # y = 3x + 7 exactly (cents scale): slope_per_hour == 3, intercept 7.
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = [
        ("t", base + dt.timedelta(hours=h), float(3 * h + 7))
        for h in range(10)
    ]
    df = spark.createDataFrame(rows, ["event_type", "ts", "value"])
    # re-run the query body on a local frame: inline the same expressions
    x = F.expr("unix_micros(ts) div 3600000000")
    y = (
        (F.col("value").cast("decimal(18,2)") * F.lit(100))
        .cast("decimal(20,0)")
        .cast("bigint")
    )
    pts = df.select("event_type", x.alias("x"), y.alias("y"))
    xd, yd = F.col("x").cast("decimal(19,0)"), F.col("y").cast("decimal(19,0)")
    s = pts.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("x").cast("decimal(38,0)")).cast("double").alias("sx"),
        F.sum(F.col("y").cast("decimal(38,0)")).cast("double").alias("sy"),
        F.sum((xd * xd).cast("decimal(38,0)")).cast("double").alias("sxx"),
        F.sum((xd * yd).cast("decimal(38,0)")).cast("double").alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, sxy = F.col("sxx"), F.col("sxy")
    slope_cents = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    out = s.select(
        (slope_cents / F.lit(100.0)).alias("slope"),
        ((sy - slope_cents * sx) / n / F.lit(100.0)).alias("intercept"),
    ).collect()[0]
    # x is absolute epoch-hours, so the intercept sits at epoch hour 0:
    # y = 3(x - x0) + 7 = 3x + (7 - 3*x0) with x0 = base's epoch hour.
    x0 = pts.agg(F.min("x")).collect()[0][0]
    assert abs(out["slope"] - 3.0) < 1e-9
    assert abs(out["intercept"] - (7.0 - 3.0 * x0)) < 1e-3


def test_fk_orphans_zero_on_fixture_and_detects_injection(spark, sf_dir):
    rows = {
        r["relation"]: (r["n_orphans"], r["n_rows"])
        for r in mp.x_validate_fk_orphans(spark, sf_dir).collect()
    }
    assert set(rows) == {"lineitem->orders", "orders->customer"}
    for rel, (orphans, total) in rows.items():
        assert orphans == 0, (rel, orphans)
        assert total > 0

    # Injection: a child row pointing at a missing parent must count.
    child = spark.createDataFrame([(1,), (99,)], ["fk"])
    parent = spark.createDataFrame([(1,)], ["pk"])
    n = (
        child.join(parent, child["fk"] == parent["pk"], "left_anti")
        .count()
    )
    assert n == 1


def test_weighted_sample_keeps_all_heavy_docs(spark, sf_dir):
    from glue_jobs_for_data_pipeline_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents")
    n_heavy = docs.filter(F.col("n_chars") >= 800).count()
    sampled = mp.x_sample_weighted(spark, sf_dir)
    assert sampled.filter(F.col("n_chars") >= 800).count() == n_heavy
    # the sample is a subset and keeps more of the heavier strata
    assert sampled.count() <= docs.count()


def test_mom_growth_first_month_null_rest_finite(spark, sf_dir):
    rows = sorted(
        mp.x_olap_mom_growth(spark, sf_dir).collect(),
        key=lambda r: r["month"],
    )
    assert rows[0]["mom_growth"] is None
    for r in rows[1:]:
        assert r["mom_growth"] is not None
    # revenue recomputes from the raw table
    assert all(r["revenue"] > 0 for r in rows)


def test_mode_is_groupwise_argmax(spark, sf_dir):
    from glue_jobs_for_data_pipeline_spark.sources.readers import load_table

    got = {
        r["month"]: (r["modal_priority"], r["n_orders"])
        for r in mp.x_olap_mode(spark, sf_dir).collect()
    }
    raw = (
        load_table(spark, sf_dir, "orders")
        .groupBy(
            F.date_trunc("month", F.col("o_orderdate")).cast("date").alias("m"),
            "o_orderpriority",
        )
        .count()
        .collect()
    )
    best: dict = {}
    for r in raw:
        key = r["m"]
        cand = (-r["count"], r["o_orderpriority"])
        if key not in best or cand < best[key]:
            best[key] = cand
    for m, (neg_n, prio) in best.items():
        assert got[m] == (prio, -neg_n), m


# -- batch 2: lift / boilerplate / WAU / MAD / windowed funnel ----------


def test_lift_symmetric_definition_and_positive(spark, sf_dir):
    rows = mp.x_market_basket_lift(spark, sf_dir).collect()
    assert rows, "fixture has repeated co-purchases"
    for r in rows:
        assert r["item_a"] < r["item_b"]  # canonical pair order
        assert r["n_pair"] >= 2
        assert r["lift"] > 0.0


def test_boilerplate_drops_only_repeated_segments(spark, sf_dir):
    from glue_jobs_for_data_pipeline_spark.sources.readers import load_table

    cleaned = mp.x_text_boilerplate_removal(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    # cleaned text is a subsequence of the original: every kept doc's
    # cleaned token count <= original token count, and docs made of
    # entirely-unique segments survive byte-identical.
    j = cleaned.join(docs.select("doc_id", "text"), "doc_id")
    bad = j.filter(
        F.size(F.split("cleaned_text", " ")) > F.size(F.split("text", " "))
    ).count()
    assert bad == 0
    # at least one doc must have lost a segment on this fixture
    shrunk = j.filter(F.col("cleaned_text") != F.col("text")).count()
    assert shrunk > 0


def test_wau_bounds_dau_and_stickiness_in_unit_interval(spark, sf_dir):
    rows = mp.x_events_wau(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["wau"] >= r["dau"] > 0
        assert 0.0 < r["stickiness"] <= 1.0


def test_wau_equals_bruteforce_on_fixture(spark, sf_dir):
    from glue_jobs_for_data_pipeline_spark.sources.readers import load_events
    import datetime as dt

    du = {
        (r["d"], r["user_id"])
        for r in load_events(spark, sf_dir)
        .select(F.col("ts").cast("date").alias("d"), "user_id")
        .distinct()
        .collect()
    }
    got = {r["day"]: r["wau"] for r in mp.x_events_wau(spark, sf_dir).collect()}
    days = sorted({d for d, _ in du})
    for day in days:
        users = {
            u
            for d, u in du
            if day - dt.timedelta(days=6) <= d <= day
        }
        assert got[day] == len(users), day


def test_mad_outliers_match_bruteforce(spark, sf_dir):
    import statistics

    from glue_jobs_for_data_pipeline_spark.sources.readers import load_events

    vals: dict[str, list[int]] = {}
    for r in (
        load_events(spark, sf_dir)
        .select(
            "event_type",
            (F.col("value").cast("decimal(18,2)") * 100)
            .cast("decimal(20,0)")
            .cast("bigint")
            .alias("vc"),
        )
        .collect()
    ):
        vals.setdefault(r["event_type"], []).append(r["vc"])
    got = {
        r["event_type"]: (r["median_value"], r["mad_value"], r["n_outliers"])
        for r in mp.x_events_anomaly_mad(spark, sf_dir).collect()
    }
    for et, xs in vals.items():
        med = statistics.median(xs)
        adevs = [abs(float(x) - med) for x in xs]
        mad = statistics.median(adevs)
        n_out = sum(1 for a in adevs if a > 3 * mad)
        gm, gmad, gout = got[et]
        assert abs(gm - med / 100.0) < 1e-9, et
        assert abs(gmad - mad / 100.0) < 1e-9, et
        assert gout == n_out, et


def test_windowed_funnel_bounded_by_unwindowed(spark, sf_dir):
    from glue_jobs_for_data_pipeline_spark.plans.analytics_pack import (
        x_events_funnel,
    )

    w = mp.x_events_funnel_windowed(spark, sf_dir).collect()[0]
    u = x_events_funnel(spark, sf_dir).collect()[0]
    assert w["n_view"] == u["n_view"]  # step 1 has no window
    assert w["n_click_1d"] <= u["n_click_after"]
    assert w["n_purchase_1d"] <= u["n_purchase_after"]
    assert w["n_view"] >= w["n_click_1d"] >= w["n_purchase_1d"]
