"""Similarity search: exact top-k correctness + LSH recall floor."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from glue_jobs_for_data_pipeline_spark.operators import similarity


def test_brute_force_topk_known_answer(spark):
    rows = [
        (0, [1.0, 0.0]),
        (1, [0.9, 0.1]),
        (2, [0.0, 1.0]),
        (3, [0.7, 0.7]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = similarity.brute_force_topk(
        emb, emb.filter(F.col("vec_id") == 0), k=2
    ).collect()
    ranked = [r["neighbor_id"] for r in sorted(out, key=lambda r: r["rank"])]
    assert ranked == [1, 3]  # cos(0,1) > cos(0,3) > cos(0,2)
    assert all(r["query_id"] == 0 for r in out)


def test_lsh_recall_floor(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 5)
    exact = similarity.brute_force_topk(emb, queries, k=10)
    approx = similarity.lsh_topk(emb, queries, k=10)
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.7, f"LSH recall {recall} below floor"


def test_ivf_recall_floor(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 5)
    exact = similarity.brute_force_topk(emb, queries, k=10)
    approx = similarity.ivf_topk(emb, queries, k=10, n_cells=16, n_probe=4)
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    # 4/16 probe fraction on weakly-clustered random data: modest floor
    assert recall >= 0.3, f"IVF recall {recall} below floor"


def test_lsh_deterministic(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(50)
    q = emb.filter(F.col("vec_id") < 2)
    r1 = sorted(map(tuple, similarity.lsh_topk(emb, q, k=5).collect()))
    r2 = sorted(map(tuple, similarity.lsh_topk(emb, q, k=5).collect()))
    assert r1 == r2
