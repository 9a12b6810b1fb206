"""Round-9 metrics pack: hand-computed unit oracles for the Gini
index, Simpson transition diversity, the FK-cascade report, exact
discrete percentiles, and the phash clustering closure (the
fixture-level differential checks live in tools/oracle_check.py)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from glue_jobs_for_data_pipeline_spark.plans import catalog_ext  # noqa: F401
from glue_jobs_for_data_pipeline_spark.plans import metrics_pack  # noqa: F401
from glue_jobs_for_data_pipeline_spark.plans.catalog import QUERIES


def test_gini_known_values(spark, tmp_path):
    """Gini of equal incomes is 0; of [1,2,3,4] it is 0.25 (rank
    formula, hand-computed)."""
    d = str(tmp_path / "sf")
    rows_eq = [(i, 10.0) for i in range(1, 5)]
    rows_sk = [(1, 1.0), (2, 2.0), (3, 3.0), (4, 4.0)]
    for name, rows in (("eq", rows_eq), ("sk", rows_sk)):
        spark.createDataFrame(
            [(c, float(v)) for c, v in rows],
            "o_custkey long, o_totalprice double",
        ).write.mode("overwrite").parquet(f"{d}_{name}/orders.parquet")
    g_eq = QUERIES["x_olap_gini"](spark, d + "_eq").collect()[0]
    g_sk = QUERIES["x_olap_gini"](spark, d + "_sk").collect()[0]
    assert abs(g_eq["gini"]) < 1e-12
    assert abs(g_sk["gini"] - 0.25) < 1e-12
    assert g_sk["n_customers"] == 4 and g_sk["total_revenue"] == 10.0


def test_transition_diversity_bounds(spark, sf_dir):
    out = QUERIES["x_events_transition_diversity"](spark, sf_dir).collect()
    assert len(out) > 0
    for r in out:
        # Simpson diversity in [0, 1 - 1/k] for k observed next-types
        k = r["n_next_types"]
        assert 0.0 <= r["simpson_diversity"] <= 1.0 - 1.0 / k + 1e-12
        assert r["n_transitions"] > 0


def test_fk_cascade_counts_planted_orphans(spark, tmp_path):
    d = str(tmp_path / "sf")
    spark.createDataFrame(
        [(0, "r")], "r_regionkey long, r_name string"
    ).write.parquet(f"{d}/region.parquet")
    # nation 1 -> region 0 (ok), nation 2 -> region 9 (orphan)
    spark.createDataFrame(
        [(1, 0), (2, 9)], "n_nationkey long, n_regionkey long"
    ).write.parquet(f"{d}/nation.parquet")
    spark.createDataFrame(
        [(10, 1), (11, 1), (12, 7)], "c_custkey long, c_nationkey long"
    ).write.parquet(f"{d}/customer.parquet")
    spark.createDataFrame(
        [(20, 2)], "s_suppkey long, s_nationkey long"
    ).write.parquet(f"{d}/supplier.parquet")
    spark.createDataFrame(
        [(30, 10), (31, 99)], "o_orderkey long, o_custkey long"
    ).write.parquet(f"{d}/orders.parquet")
    spark.createDataFrame(
        [(40, 1)], "p_partkey long, p_size long"
    ).write.parquet(f"{d}/part.parquet")
    spark.createDataFrame(
        [(30, 40, 20), (31, 41, 20), (99, 40, 21)],
        "l_orderkey long, l_partkey long, l_suppkey long",
    ).write.parquet(f"{d}/lineitem.parquet")
    out = {
        r["edge"]: (r["n_child"], r["n_orphans"])
        for r in QUERIES["x_validate_fk_cascade"](spark, d).collect()
    }
    assert out["nation.n_regionkey"] == (2, 1)
    assert out["customer.c_nationkey"] == (3, 1)
    assert out["supplier.s_nationkey"] == (1, 0)
    assert out["orders.o_custkey"] == (2, 1)
    assert out["lineitem.l_orderkey"] == (3, 1)
    assert out["lineitem.l_partkey"] == (3, 1)
    assert out["lineitem.l_suppkey"] == (3, 1)


def test_interarrival_disc_hand_computed(spark, tmp_path):
    """One user, one event type, gaps of exactly 1s, 2s, ..., 10s:
    discrete p50 = 5s, p90 = 9s, p99 = 10s (value at rank ceil(q*n))."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    ts, acc = [base], 0
    for g in range(1, 11):
        acc += g
        ts.append(base + dt.timedelta(seconds=acc))
    rows = [(i, 7, "click", t) for i, t in enumerate(ts)]
    d = str(tmp_path / "sf")
    spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp"
    ).write.parquet(f"{d}/events.parquet")
    out = QUERIES["x_events_interarrival_disc"](spark, d).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_gaps"] == 10
    assert r["p50_us"] == 5_000_000
    assert r["p90_us"] == 9_000_000
    assert r["p99_us"] == 10_000_000


def test_phash_clusters_transitive_closure(spark, sf_dir):
    """Clusters refine pairs: every phash pair's endpoints share a
    cluster id, and cluster_id is the min doc_id of its members."""
    pairs = QUERIES["x_mm_phash_dedup"](spark, sf_dir).collect()
    clusters = {
        r["doc_id"]: r["cluster_id"]
        for r in QUERIES["x_mm_phash_clusters"](spark, sf_dir).collect()
    }
    assert pairs and clusters
    for r in pairs:
        assert clusters[r["doc_a"]] == clusters[r["doc_b"]]
    members: dict[int, list[int]] = {}
    for doc, cl in clusters.items():
        members.setdefault(cl, []).append(doc)
    for cl, docs in members.items():
        assert cl == min(docs)


# --------------------------------------------------------------------------
# Count-min sketch: one-sided error + mergeability
# --------------------------------------------------------------------------


def test_cms_never_underestimates(spark, sf_dir):
    from glue_jobs_for_data_pipeline_spark.plans.metrics_pack import (
        x_olap_countmin_sketch,
    )

    rows = x_olap_countmin_sketch(spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        assert r["cms_est"] >= r["exact_cnt"], r
        assert r["overcount"] == r["cms_est"] - r["exact_cnt"]


def test_cms_partial_sketches_merge_to_whole(spark, sf_dir):
    """The CM counter matrix is a pure sum: sketch(half A) + sketch(half
    B) must equal sketch(all) cell-by-cell — the property that makes
    map-side partial aggregation (and cross-day rollups) the merge."""
    from pyspark.sql import functions as F

    from glue_jobs_for_data_pipeline_spark.plans.metrics_pack import (
        _CMS_D,
        _cms_col,
    )
    from glue_jobs_for_data_pipeline_spark.sources.readers import load_table

    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").cast("long").alias("k"),
        (F.col("o_orderkey") % 2).alias("half"),
    )
    ks = F.col("k").cast("string")
    cells = o.select(
        "half",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).cast("int").alias("j"),
                        _cms_col(j, ks).alias("col"),
                    )
                    for j in range(_CMS_D)
                ]
            )
        ).alias("c"),
    ).select("half", "c.j", "c.col")

    whole = {
        (r["j"], r["col"]): r["cnt"]
        for r in cells.groupBy("j", "col")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    merged: dict = {}
    for r in (
        cells.groupBy("half", "j", "col")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    ):
        key = (r["j"], r["col"])
        merged[key] = merged.get(key, 0) + r["cnt"]
    assert merged == whole
