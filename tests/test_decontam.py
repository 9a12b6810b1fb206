"""Benchmark decontamination: gram generation edge cases, planted
contamination detection, and the broadcast plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from glue_jobs_for_data_pipeline_spark.operators import decontam


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_token_ngrams_short_doc_is_empty(spark):
    df = _docs(spark, [(1, "a b c"), (2, "one two three four five")])
    out = df.select(
        "doc_id", decontam.token_ngrams(F.col("text"), 5).alias("g")
    ).collect()
    by_id = {r["doc_id"]: r["g"] for r in out}
    assert by_id[1] == []  # 3 tokens < n=5: no fabricated grams
    assert by_id[2] == ["one two three four five"]


def test_token_ngrams_counts(spark):
    df = _docs(spark, [(1, "  a b c d e  ")])
    out = df.select(decontam.token_ngrams(F.col("text"), 3).alias("g")).first()
    assert out["g"] == ["a b c", "b c d", "c d e"]


def test_planted_contamination_flagged(spark):
    leak = "the quick brown fox jumps over the lazy"
    docs = _docs(
        spark,
        [
            (1, f"intro words {leak} trailing tail"),  # contaminated
            (2, "totally clean document with enough tokens here ok"),
            (3, "short clean"),
        ],
    )
    evals = _docs(spark, [(100, f"benchmark prompt {leak} answer choice")])
    rep = {
        r["doc_id"]: (r["n_contam"], r["contaminated"])
        for r in decontam.contamination_report(docs, evals, n=8).collect()
    }
    assert rep[1][1] is True and rep[1][0] >= 1
    assert rep[2] == (0, False)
    assert rep[3] == (0, False)  # short doc: no grams, still reported

    kept = {
        r["doc_id"] for r in decontam.decontaminate(docs, evals, n=8).collect()
    }
    assert kept == {2, 3}


def test_decontaminate_plan_broadcasts_eval_side(spark):
    docs = _docs(spark, [(i, f"w{i} x y z a b c d e f") for i in range(20)])
    evals = _docs(spark, [(99, "x y z a b c d e")])
    plan = decontam.decontaminate(docs, evals, n=8)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_token = st.sampled_from("alpha beta gamma delta eps zeta eta theta".split())


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    eval_toks=st.lists(_token, min_size=8, max_size=12),
    prefix=st.lists(_token, min_size=0, max_size=5),
    suffix=st.lists(_token, min_size=0, max_size=5),
)
def test_containment_implies_flagged(spark, eval_toks, prefix, suffix):
    """Any training doc that embeds an eval doc's full token sequence
    MUST be flagged (n-gram overlap is a superset of containment)."""
    train_text = " ".join(prefix + eval_toks + suffix)
    docs = _docs(spark, [(1, train_text)])
    evals = _docs(spark, [(9, " ".join(eval_toks))])
    rep = decontam.contamination_report(docs, evals, n=8).first()
    assert rep["contaminated"] is True


def test_build_corpus_stage_ordering(spark, sf_dir):
    """Composition sanity: the final manifest only contains docs that
    survive EVERY stage, and positions are dense per shard."""
    from glue_jobs_for_data_pipeline_spark.operators.corpus import build_corpus
    from pyspark.sql import functions as F

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = build_corpus(
        d.filter(F.col("doc_id") % 29 != 0),
        d.filter(F.col("doc_id") % 29 == 0),
        mix_rates={"src0": 1.0},
        default_rate=0.5,
        n_shards=4,
        seed="t",
    ).collect()
    assert out  # survivors exist at sf0.001
    by_shard: dict[int, list[int]] = {}
    for r in out:
        assert r["lang_pred"] == "en"
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    for poss in by_shard.values():
        assert sorted(poss) == list(range(1, len(poss) + 1))
