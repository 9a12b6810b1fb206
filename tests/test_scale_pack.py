"""Tests for plans/scale_pack.py: the salted replicated join must be
result-identical to the plain join (the whole point of the technique),
the SQL front end must run the exact oracle text, and the streaming
top-k must match its batch equivalent.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from glue_jobs_for_data_pipeline_spark.operators.skew import replicated_skew_join
from glue_jobs_for_data_pipeline_spark.plans import scale_pack as sp
from glue_jobs_for_data_pipeline_spark.sources.readers import load_table


def test_replicated_skew_join_equals_plain_join(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_returnflag"
    )
    dim = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("flag_rows"))
    )
    salted = replicated_skew_join(li, dim, "l_returnflag", n_salts=8)
    plain = li.join(dim, "l_returnflag")
    assert salted.count() == plain.count()
    assert salted.exceptAll(plain).count() == 0
    assert plain.exceptAll(salted).count() == 0


def test_skew_join_spreads_hot_key_over_salts(spark, sf_dir):
    """Each (key, salt) group must be a strict subset of the key's rows
    — i.e. the salt actually partitions the hot key's work."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_returnflag"
    )
    salted = li.withColumn(
        "_salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in li.columns]), F.lit(8)),
    )
    per_salt = (
        salted.groupBy("l_returnflag", "_salt")
        .count()
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n_salts"), F.max("count").alias("biggest"))
        .collect()
    )
    total = {
        r["l_returnflag"]: r["cnt"]
        for r in li.groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    for r in per_salt:
        assert r["n_salts"] > 1  # the hot key really spread
        assert r["biggest"] < total[r["l_returnflag"]]


def test_sql_frontend_executes_oracle_text_verbatim(spark, sf_dir):
    df = sp.run_sql(spark, sf_dir, sp._X_SQL_FRONTEND_SQL)
    assert set(df.columns) == {"l_returnflag", "l_linestatus", "sum_qty", "cnt"}
    assert df.count() > 0


def test_stream_topk_matches_batch_rank(spark, sf_dir):
    from pyspark.sql import Window as W

    from glue_jobs_for_data_pipeline_spark.sources.readers import load_events

    got = sp.x_stream_topk(spark, sf_dir)
    ev = load_events(spark, sf_dir)
    counts = ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("window_start"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n_events"))
    w = W.partitionBy("window_start").orderBy(
        F.col("n_events").desc(), F.col("event_type")
    )
    want = (
        counts.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("window_start", "event_type", "n_events", "rnk")
    )
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_salted_agg_equals_plain_groupby(spark, sf_dir):
    """The salt must cancel exactly: two-phase salted count/sum over the
    hot 3-value key equals the direct aggregation, and phase 1 really
    spreads each key over multiple salt groups."""
    from glue_jobs_for_data_pipeline_spark.operators.skew import (
        salted_count,
        salted_sum,
    )

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    plain = {
        r["l_returnflag"]: (r["cnt"], str(r["qty"]))
        for r in li.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("qty"),
        )
        .collect()
    }
    cnt = salted_count(li, ["l_returnflag"], salt_from="l_orderkey")
    qty = salted_sum(
        li,
        ["l_returnflag"],
        F.col("l_quantity").cast("decimal(18,2)"),
        salt_from="l_orderkey",
        alias="qty",
    )
    got = {
        r["l_returnflag"]: (r["cnt"], str(r["qty"]))
        for r in cnt.join(qty, "l_returnflag").collect()
    }
    assert got == plain
    # phase 1 spread: each hot key occupies >1 salt group
    spread = (
        li.withColumn(
            "_salt", F.pmod(F.xxhash64(F.col("l_orderkey")), F.lit(16))
        )
        .groupBy("l_returnflag")
        .agg(F.countDistinct("_salt").alias("n_salts"))
        .collect()
    )
    assert all(r["n_salts"] > 8 for r in spread), spread
