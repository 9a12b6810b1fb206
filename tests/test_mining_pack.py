"""Semantic property tests for plans/mining_pack.py. Value-level
equality vs DuckDB is covered by the differential sweep
(tools/oracle_check.py — every oracle-able key in the pack checked at
sf0.001 AND sf0.01, see ORACLE_SWEEP_r08*.json); these tests pin the
properties the sweep can't see: the triangle counter vs a brute-force
enumerator on a known graph, as-of forward semantics on a hand-built
fixture, skyline non-dominance, transition-probability normalization,
regression on a perfect line, orphan injection, interpolation
midpoints, attribution on a hand fixture, zero-drift identical halves,
periodic-series autocorrelation, HLL accuracy + merge consistency,
auto_join plan shapes, and exact join-cardinality prediction.
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


# -- batch 3: full outer / paths / concentration / scalar kernels -------


def test_full_outer_keeps_both_sides(spark):
    # days disjoint on purpose: full outer must keep all four, zero-fill
    import datetime as dt

    c = spark.createDataFrame(
        [(dt.date(2024, 1, 1), 5), (dt.date(2024, 1, 2), 3)],
        ["day", "n_clicks"],
    )
    e = spark.createDataFrame(
        [(dt.date(2024, 1, 2), 1), (dt.date(2024, 1, 3), 7)],
        ["day_e", "n_errors"],
    )
    from pyspark.sql import functions as FF

    out = {
        r["day"]: (r["n_clicks"], r["n_errors"])
        for r in c.join(e, c["day"] == e["day_e"], "full_outer")
        .select(
            FF.coalesce(c["day"], e["day_e"]).alias("day"),
            FF.coalesce("n_clicks", FF.lit(0)).alias("n_clicks"),
            FF.coalesce("n_errors", FF.lit(0)).alias("n_errors"),
        )
        .collect()
    }
    assert out == {
        dt.date(2024, 1, 1): (5, 0),
        dt.date(2024, 1, 2): (3, 1),
        dt.date(2024, 1, 3): (0, 7),
    }


def test_top_paths_cover_all_users_with_ordered_prefixes(spark, sf_dir):
    from glue_jobs_for_data_pipeline_spark.sources.readers import load_events

    n_users = load_events(spark, sf_dir).select("user_id").distinct().count()
    rows = mp.x_events_top_paths(spark, sf_dir).collect()
    assert sum(r["n_users"] for r in rows) == n_users
    for r in rows:
        assert 1 <= len(r["path"].split(">")) <= 3


def test_revenue_concentration_shares_sum_to_one_and_decrease(spark, sf_dir):
    rows = sorted(
        mp.x_olap_revenue_concentration(spark, sf_dir).collect(),
        key=lambda r: r["decile"],
    )
    assert [r["decile"] for r in rows] == list(range(1, 11))
    assert abs(sum(r["revenue_share"] for r in rows) - 1.0) < 1e-9
    # deciles ranked by spend: shares must be non-increasing
    shares = [r["revenue_share"] for r in rows]
    assert all(a >= b for a, b in zip(shares, shares[1:]))


def test_string_kernels_consistent(spark, sf_dir):
    row = (
        mp.x_text_string_kernels(spark, sf_dir)
        .filter(F.col("doc_id") == 0)
        .collect()[0]
    )
    assert row["doc_code"] == "00000000"
    assert row["lang_upper"] == row["lang_translated"].upper()
    assert len(row["text_head"]) <= 20
    assert row["text_len"] > 0
    assert row["first_table_pos"] >= 0


def test_conditional_kernels_banding(spark, sf_dir):
    from glue_jobs_for_data_pipeline_spark.sources.readers import load_table

    out = mp.x_olap_conditional_kernels(spark, sf_dir)
    raw = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus", "o_custkey"
    )
    j = out.join(raw, "o_orderkey").collect()
    for r in j:
        expect = (
            "high"
            if r["o_totalprice"] > 300000
            else "mid" if r["o_totalprice"] > 150000 else "low"
        )
        assert r["price_band"] == expect
        assert r["status_folded"] == (
            "_open" if r["o_orderstatus"] == "O" else r["o_orderstatus"]
        )
        m = r["o_custkey"] % 7
        assert r["g7"] == max(m, 3) and r["l7"] == min(m, 3)


# -- batch 4: array/date kernels, bounce rate, latency histogram --------


def test_array_kernels_fold_matches_python(spark, sf_dir):
    rows = (
        mp.x_text_array_kernels(spark, sf_dir)
        .join(
            __import__(
                "glue_jobs_for_data_pipeline_spark.sources.readers",
                fromlist=["load_table"],
            ).load_table(spark, sf_dir, "documents").select("doc_id", "text"),
            "doc_id",
        )
        .limit(30)
        .collect()
    )
    for r in rows:
        toks = r["text"].split(" ")
        assert r["n_tokens"] == len(toks)
        assert r["n_distinct"] == len(set(toks))
        assert r["has_table"] == ("table" in toks)
        assert r["total_token_chars"] == sum(len(t) for t in toks)
        expect_ops = ",".join(
            sorted({"table", "scan", "join"} & set(toks))
        )
        assert r["ops_present"] == expect_ops


def test_date_kernels_clamp_and_week_monday(spark):
    import datetime as dt

    from glue_jobs_for_data_pipeline_spark.sources.readers import load_table  # noqa: F401

    df = spark.createDataFrame(
        [(1, dt.date(2024, 1, 31)), (2, dt.date(2024, 2, 8))], ["k", "d"]
    )
    out = {
        r["k"]: r
        for r in df.select(
            "k",
            F.add_months("d", 1).alias("plus1m"),
            F.date_trunc("week", F.col("d")).cast("date").alias("wk"),
            F.last_day("d").alias("ld"),
        ).collect()
    }
    assert out[1]["plus1m"] == dt.date(2024, 2, 29)  # end-of-month clamp
    assert out[2]["wk"] == dt.date(2024, 2, 5)       # Monday truncation
    assert out[1]["ld"] == dt.date(2024, 1, 31)


def test_bounce_rate_consistent_with_sessionizer(spark, sf_dir):
    from glue_jobs_for_data_pipeline_spark.operators.timeseries import (
        sessionize_batch,
    )
    from glue_jobs_for_data_pipeline_spark.sources.readers import load_events

    s = sessionize_batch(load_events(spark, sf_dir), gap_minutes=30)
    n_sessions = s.count()
    n_bounces = s.filter(F.col("n_events") == 1).count()
    rows = mp.x_ts_bounce_rate(spark, sf_dir).collect()
    assert sum(r["n_sessions"] for r in rows) == n_sessions
    assert sum(r["n_bounces"] for r in rows) == n_bounces
    for r in rows:
        assert 0.0 <= r["bounce_rate"] <= 1.0


def test_latency_hist_nonnegative_and_covers_all_lines(spark, sf_dir):
    from glue_jobs_for_data_pipeline_spark.sources.readers import load_table

    n_lines = load_table(spark, sf_dir, "lineitem").count()
    rows = mp.x_olap_latency_hist(spark, sf_dir).collect()
    assert sum(r["n_lines"] for r in rows) == n_lines  # inner FK join is total
    # the synthetic fixture draws shipdate independently of orderdate,
    # so negative latencies exist; just pin a sane bounded range
    assert all(-4000 < r["latency_days"] < 4000 for r in rows)


def test_lm_coverage_bounds_and_common_subset(spark, sf_dir):
    rows = mp.x_text_lm_coverage(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_common"] <= r["n_bigrams"]
        assert 0.0 <= r["lm_coverage"] <= 1.0
    # a doc made of corpus-common bigrams scores higher than a doc of
    # unique gibberish: verify via the extremes on the fixture
    by_cov = sorted(rows, key=lambda r: r["lm_coverage"])
    assert by_cov[-1]["lm_coverage"] > by_cov[0]["lm_coverage"]


# -- batch 6: FD profile / Benford / window frames ----------------------


def test_fd_profile_detects_pk_fd_and_violations(spark):
    # A table where k -> v holds for k=1 but breaks for k=2.
    df = spark.createDataFrame(
        [(1, "a"), (1, "a"), (2, "a"), (2, "b")], ["k", "v"]
    )
    g = df.groupBy("k").agg(F.countDistinct("v").alias("n_rhs"))
    violating = g.filter(F.col("n_rhs") > 1).count()
    assert violating == 1


def test_fd_profile_rates_in_unit_interval(spark, sf_dir):
    rows = mp.x_validate_fd_profile(spark, sf_dir).collect()
    assert len(rows) == 2
    for r in rows:
        assert 0 <= r["n_violating"] <= r["n_lhs_values"]
        assert 0.0 <= r["violation_rate"] <= 1.0


def test_benford_digits_cover_and_shares_sum_to_one(spark, sf_dir):
    rows = mp.x_olap_benford(spark, sf_dir).collect()
    digits = {r["digit"] for r in rows}
    assert digits <= set("123456789")
    assert abs(sum(r["share"] for r in rows) - 1.0) < 1e-9
    # digit extraction is from exact cents: recompute one digit
    from glue_jobs_for_data_pipeline_spark.sources.readers import load_table

    sample = (
        load_table(spark, sf_dir, "orders")
        .select("o_totalprice")
        .limit(5)
        .collect()
    )
    import decimal

    for r in sample:
        cents = int(
            (decimal.Decimal(str(r["o_totalprice"])).quantize(
                decimal.Decimal("0.01")
            ) * 100)
        )
        assert str(cents)[0] in digits


def test_window_frames_semantics(spark):
    df = spark.createDataFrame(
        [(1, 1, 10, "a"), (2, 1, 20, "b"), (3, 1, 30, "c"), (4, 2, 5, "z")],
        ["event_id", "user_id", "ts", "event_type"],
    )
    from pyspark.sql import Window as W

    w_run = W.partitionBy("user_id").orderBy("ts", "event_id")
    w_full = w_run.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    out = {
        r["event_id"]: (r["f"], r["l"], r["n2"])
        for r in df.select(
            "event_id",
            F.first("event_type").over(w_run).alias("f"),
            F.last("event_type").over(w_full).alias("l"),
            F.nth_value("event_type", 2).over(w_full).alias("n2"),
        ).collect()
    }
    assert out[1] == ("a", "c", "b")
    assert out[3] == ("a", "c", "b")
    assert out[4] == ("z", "z", None)  # 1-row partition: no 2nd value


# -- randomized differential properties (hypothesis) --------------------

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_edges_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=11),
        st.integers(min_value=0, max_value=11),
    ),
    min_size=1,
    max_size=30,
)


def _py_triangle_counts(edges):
    und = {
        (min(a, b), max(a, b)) for a, b in edges if a != b
    }
    adj: dict[int, set] = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    counts: dict[int, int] = {}
    nodes = sorted(adj)
    for i, a in enumerate(nodes):
        for b in sorted(adj[a]):
            if b <= a:
                continue
            for c in sorted(adj[a] & adj[b]):
                if c <= b:
                    continue
                for n in (a, b, c):
                    counts[n] = counts.get(n, 0) + 1
    return counts


@settings(
    max_examples=6,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(edges=_edges_strategy)
def test_triangle_counts_match_python_on_random_graphs(spark, edges):
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {
        r["node"]: r["n_triangles"] for r in triangle_counts(df).collect()
    }
    assert got == _py_triangle_counts(edges)


_asof_rows = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 50)),
    min_size=1,
    max_size=15,
)


@settings(
    max_examples=6,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(left=_asof_rows, right=_asof_rows)
def test_asof_forward_matches_python_on_random_series(spark, left, right):
    # dedupe right to one row per (key, ts) — the operator's contract
    rmap = {}
    for k, ts in right:
        rmap[(k, ts)] = float(ts * 10)
    rrows = [(k, ts, v) for (k, ts), v in sorted(rmap.items())]
    lrows = [(i, k, ts) for i, (k, ts) in enumerate(left)]
    ldf = spark.createDataFrame(lrows, ["lid", "k", "ts"])
    rdf = spark.createDataFrame(rrows, ["k", "ts", "value"])
    got = {
        r["lid"]: (r["mts"], r["mv"])
        for r in asof_join_forward(
            ldf, rdf, on="k", right_cols={"ts": "mts", "value": "mv"}
        ).collect()
    }
    for lid, k, ts in lrows:
        cand = [(rts, v) for (rk, rts), v in rmap.items() if rk == k and rts >= ts]
        expect = min(cand) if cand else (None, None)
        assert got[lid] == expect, (lid, k, ts)


_points = st.lists(
    st.tuples(st.integers(0, 9), st.integers(0, 9)),
    min_size=1,
    max_size=20,
)


@settings(
    max_examples=6,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(pts=_points)
def test_skyline_plan_matches_bruteforce_on_random_points(spark, pts):
    """The O(n log n) prefix-max skyline plan (groupBy price -> running
    max over strictly-cheaper groups) must equal the quadratic
    dominance definition on arbitrary point sets, ties included."""
    from pyspark.sql import Window as W

    rows = [(i, float(p), s) for i, (p, s) in enumerate(pts)]
    df = spark.createDataFrame(rows, ["id", "price", "size"])
    g = df.groupBy("price").agg(F.max("size").alias("max_size"))
    w = W.orderBy("price").rowsBetween(W.unboundedPreceding, -1)
    g = g.select(
        "price", "max_size", F.max("max_size").over(w).alias("run_lt")
    )
    sky = {
        r["id"]
        for r in df.join(g, "price")
        .filter(
            (F.col("size") == F.col("max_size"))
            & (F.col("run_lt").isNull() | (F.col("run_lt") < F.col("size")))
        )
        .collect()
    }
    expect = set()
    for i, (p, s) in enumerate(pts):
        dominated = any(
            (qp <= p and qs >= s and (qp < p or qs > s))
            for j, (qp, qs) in enumerate(pts)
            if j != i
        )
        if not dominated:
            expect.add(i)
    assert sky == expect, (pts, sky, expect)


def test_hll_partial_merge_accuracy_and_consistency(spark, sf_dir):
    from glue_jobs_for_data_pipeline_spark.sources.readers import load_events

    out = {
        r["week"]: r
        for r in mp.x_olap_hll_partial_merge(spark, sf_dir).collect()
    }
    assert out, "no weeks produced"
    for wk, r in out.items():
        # the r18 quantitative-gate booleans: 5% accuracy and
        # union-vs-oneshot estimate equality, both computed in-plan
        assert r["within_tolerance"], (wk, r)
        assert r["merge_consistent"], (wk, r)

    # merge consistency: union-of-daily-sketches == one-shot weekly
    # sketch, estimate-for-estimate (HLL union is deterministic)
    ev = load_events(spark, sf_dir)
    daily = ev.groupBy(
        F.weekofyear("ts").alias("week"), F.col("ts").cast("date").alias("d")
    ).agg(F.hll_sketch_agg("user_id").alias("sk"))
    merged = {
        r["week"]: r["est"]
        for r in daily.groupBy("week")
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk"))
            .cast("long")
            .alias("est")
        )
        .collect()
    }
    oneshot = {
        r["week"]: r["est"]
        for r in ev.groupBy(F.weekofyear("ts").alias("week"))
        .agg(
            F.hll_sketch_estimate(F.hll_sketch_agg("user_id"))
            .cast("long")
            .alias("est")
        )
        .collect()
    }
    assert merged == oneshot


def test_auto_join_broadcasts_small_build_side(spark, sf_dir):
    from glue_jobs_for_data_pipeline_spark.operators.planner import (
        auto_join,
    )
    from glue_jobs_for_data_pipeline_spark.sources.readers import load_table

    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_name"
    )
    joined = auto_join(o, c, "o_custkey")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert joined.count() == o.join(c, "o_custkey").count()


def test_auto_join_salts_skewed_probe_side(spark):
    from glue_jobs_for_data_pipeline_spark.operators.planner import (
        SALTED,
        auto_join,
        join_stats,
        recommend,
    )

    # hot key 1 owns 90% of the probe side; force the build side over
    # the broadcast budget via broadcast_max_rows=0
    big = spark.range(1000).select(
        F.when(F.col("id") < 900, F.lit(1)).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("payload"),
    )
    small = spark.range(2000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    stats = join_stats(big, small, "k")
    assert stats["skew_ratio"] > 4.0
    assert recommend(stats, broadcast_max_rows=0) == SALTED
    got = auto_join(big, small, "k", broadcast_max_rows=0)
    want = big.join(small, "k", "inner")
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )


def test_recommend_plain_sort_merge_when_uniform(spark):
    from glue_jobs_for_data_pipeline_spark.operators.planner import (
        SORT_MERGE,
        recommend,
    )

    stats = {
        "l_rows": 10_000_000,
        "l_keys": 1_000_000,
        "l_max_key_rows": 15,
        "r_rows": 5_000_000,
        "skew_ratio": 1.5,
    }
    assert recommend(stats) == SORT_MERGE


def test_interpolate_midpoint_and_edges(spark, tmp_path):
    # hand fixture through the same plan shape as x_ts_interpolate:
    # observed at t=0 (v=10) and t=4 (v=30); t=1 sits 25% of the way
    # -> 15.0; leading/trailing nulls take the nearest edge
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = [
        (0, 1, base + dt.timedelta(seconds=0), 10.0),
        (1, 1, base + dt.timedelta(seconds=1), None),
        (2, 1, base + dt.timedelta(seconds=4), 30.0),
        (3, 2, base + dt.timedelta(seconds=0), None),  # leading
        (4, 2, base + dt.timedelta(seconds=1), 7.0),
        (5, 2, base + dt.timedelta(seconds=2), None),  # trailing
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, v double"
    )
    from pyspark.sql import Window

    wp = (
        Window.partitionBy("user_id")
        .orderBy("tus", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wf = (
        Window.partitionBy("user_id")
        .orderBy("tus", "event_id")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    ev = df.select(
        "event_id", "user_id", F.unix_micros("ts").alias("tus"), "v"
    )
    t_obs = F.when(F.col("v").isNotNull(), F.col("tus"))
    b = ev.select(
        "event_id",
        "v",
        F.last("v", ignorenulls=True).over(wp).alias("pv"),
        F.last(t_obs, ignorenulls=True).over(wp).alias("pt"),
        F.first("v", ignorenulls=True).over(wf).alias("nv"),
        F.first(t_obs, ignorenulls=True).over(wf).alias("nt"),
        "tus",
    )
    interp = (
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(F.col("pv").isNull(), F.col("nv"))
        .when(F.col("nv").isNull(), F.col("pv"))
        .otherwise(
            F.col("pv")
            + (F.col("nv") - F.col("pv"))
            * (
                (F.col("tus") - F.col("pt")).cast("double")
                / (F.col("nt") - F.col("pt")).cast("double")
            )
        )
    )
    got = {
        r["event_id"]: r["vi"]
        for r in b.select("event_id", interp.alias("vi")).collect()
    }
    assert got[1] == 15.0  # 10 + (30-10) * 1/4
    assert got[3] == 7.0  # leading -> next
    assert got[5] == 7.0  # trailing -> prev


def test_attribution_hand_fixture(spark):
    # user 1: session A = [click, purchase(5), purchase(3)] (gaps < 30m),
    # then a 2h gap, session B = [view] (no purchase).
    import datetime as dt

    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (1, 1, base, "click", 0.0),
        (2, 1, base + dt.timedelta(minutes=10), "purchase", 5.0),
        (3, 1, base + dt.timedelta(minutes=20), "purchase", 3.0),
        (4, 1, base + dt.timedelta(hours=2, minutes=21), "view", 1.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp,"
        " event_type string, value double"
    )
    from glue_jobs_for_data_pipeline_spark.plans.mining_pack import (
        x_events_attribution,
    )
    import glue_jobs_for_data_pipeline_spark.sources.readers as readers

    # run the same pipeline body against the fixture by monkeypatch-free
    # inlining: reuse the registered query but feed it through a temp
    # parquet dir shaped like the events table
    import tempfile, os

    d = tempfile.mkdtemp(prefix="attrib_fixture_")
    df.select(
        "event_id", "ts", "user_id", "event_type", "value",
        F.lit("{}").alias("props"),
    ).write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    got = {
        r["channel"]: (r["n_sessions"], r["n_converting"],
                       r["attributed_revenue"])
        for r in x_events_attribution(spark, d).collect()
    }
    assert got["click"] == (1, 1, 8.0)  # first touch gets 5 + 3
    assert got["view"] == (1, 0, None)  # non-converting session


def test_drift_chisq_zero_on_identical_halves(spark, tmp_path):
    # doc_id parity halves with IDENTICAL lang composition -> every
    # chisq term 0, every rate ratio 1
    rows = [(i, "t", "en" if i % 4 < 2 else "fr", "s", 1) for i in range(40)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
        " n_chars long"
    )
    import os, tempfile

    d = tempfile.mkdtemp(prefix="drift_fixture_")
    df.write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    from glue_jobs_for_data_pipeline_spark.plans.mining_pack import (
        x_validate_drift_chisq,
    )

    for r in x_validate_drift_chisq(spark, d).collect():
        assert r["chisq_term"] == 0.0
        assert r["rate_ratio"] == 1.0


def test_autocorr_perfect_period_24(spark, tmp_path):
    # hourly series exactly periodic with period 24 -> lag-24 pairs are
    # identical -> autocorr == 1 (up to one sqrt rounding)
    import datetime as dt, math, os, tempfile

    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for hour in range(24 * 10):
        v = float(10 + (hour % 24))
        rows.append((eid, base + dt.timedelta(hours=hour), 1, "view", v, "{}"))
        eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long,"
        " event_type string, value double, props string"
    )
    d = tempfile.mkdtemp(prefix="autocorr_fixture_")
    df.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    from glue_jobs_for_data_pipeline_spark.plans.mining_pack import (
        x_ts_autocorr,
    )

    got = {r["lag_k"]: r for r in x_ts_autocorr(spark, d).collect()}
    assert got[24]["n_pairs"] == 24 * 9
    assert math.isclose(got[24]["autocorr"], 1.0, rel_tol=1e-12)
    # lag-1 on a sawtooth is positive but clearly below 1
    assert got[1]["autocorr"] < 0.99


def test_join_cardinality_prediction_is_exact(spark, sf_dir):
    from glue_jobs_for_data_pipeline_spark.sources.readers import load_table

    pred = mp.x_validate_join_cardinality(spark, sf_dir).collect()[0]
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("k")
    )
    assert pred["predicted_rows"] == o.join(li, "k").count()
    assert pred["n_matching_keys"] == (
        o.distinct().join(li.distinct(), "k").count()
    )
    assert pred["max_single_key_rows"] >= 1
