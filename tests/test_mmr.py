"""MMR diversity re-rank (operators/similarity.py::mmr_rerank, r16)."""

from __future__ import annotations

from pyspark.sql import functions as F

from glue_jobs_for_data_pipeline_spark.operators.similarity import mmr_rerank


def _emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def test_first_pick_is_pure_relevance_argmax(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < 4)
    out = mmr_rerank(emb, queries, k_candidates=8, m=3).collect()
    firsts = {r["query_id"]: r["selected_id"] for r in out if r["position"] == 1}
    # recompute argmax relevance on the same integer grid
    import math

    rows = emb.collect()
    vecs = {
        r["vec_id"]: [math.floor(float(x) * 1024) for x in r["embedding"]]
        for r in rows
    }
    for qid in firsts:
        qv = vecs[qid]
        best = max(
            ((sum(a * b for a, b in zip(qv, cv)), -cid), cid)
            for cid, cv in vecs.items()
            if cid != qid
        )
        assert firsts[qid] == best[1]


def test_mmr_output_shape_and_determinism(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < 4)
    a = sorted(map(tuple, mmr_rerank(emb, queries, k_candidates=8, m=3).collect()))
    b = sorted(map(tuple, mmr_rerank(emb, queries, k_candidates=8, m=3).collect()))
    assert a == b
    per_q = {}
    for qid, pos, sid, _ in a:
        per_q.setdefault(qid, []).append((pos, sid))
        assert sid != qid
    for qid, picks in per_q.items():
        assert sorted(p for p, _ in picks) == [1, 2, 3]
        assert len({s for _, s in picks}) == 3  # no repeats


def test_mmr_diversifies_a_planted_duplicate_cluster(spark):
    """Three near-identical high-relevance vectors vs one orthogonal
    mid-relevance vector: plain top-2 takes two clones; MMR's second
    pick must be the orthogonal one."""
    rows = [
        (0, [1.0] * 8),                               # the query
        (1, [1.0] * 4 + [0.0] * 4),                   # clone A (top rel)
        (2, [0.999] * 4 + [0.0] * 4),                 # clone B
        (3, [0.998] * 4 + [0.0] * 4),                 # clone C
        (4, [0.0] * 4 + [0.9] * 4),                   # orthogonal to clones
    ]
    # round 2 scores (rel - max dot with clone A): clones score ~0
    # (their relevance IS their similarity to A), the orthogonal vector
    # keeps its full relevance — MMR must take it over the better-rel
    # clones
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = mmr_rerank(
        emb, emb.filter(F.col("vec_id") == 0), k_candidates=4, m=2
    ).collect()
    picks = {r["position"]: r["selected_id"] for r in out}
    assert picks[1] == 1       # pure relevance: the closest clone
    assert picks[2] == 4       # diversity: NOT clone B/C
