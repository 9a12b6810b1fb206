"""Round-11 curation pack: winnowing fingerprints, normalized dedup,
temperature mixing, matryoshka truncation, compaction planning."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from glue_jobs_for_data_pipeline_spark.operators.decontam import (
    winnow_fingerprints,
    winnow_hash,
)


def _fps(spark, text, k=5, w=4):
    return (
        spark.createDataFrame([(text,)], "text string")
        .select(winnow_fingerprints(F.col("text"), k=k, w=w).alias("f"))
        .first()["f"]
    )


def test_winnow_guarantee_shared_run_shares_fingerprint(spark):
    """The winnowing theorem: two texts sharing a run of >= w+k-1
    tokens MUST share at least one fingerprint hash."""
    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 = w+k-1
    a = "x1 x2 x3 " + shared + " y1 y2"
    b = "z9 " + shared + " q7 q8 q9 q10"
    ha = {f >> 20 for f in _fps(spark, a)}
    hb = {f >> 20 for f in _fps(spark, b)}
    assert ha & hb, "shared 8-token run must share a fingerprint"


def test_winnow_density_and_edge_cases(spark):
    # ~2/(w+1) of grams selected on random-ish text; exact bounds:
    # at most one fingerprint per window start, at least one per window
    text = " ".join(f"tok{i * 7919 % 997}" for i in range(200))
    fps = _fps(spark, text)
    m = 200 - 4  # grams at k=5
    n_windows = m - 3
    assert 1 <= len(fps) <= n_windows
    assert len(fps) <= m
    # fewer than k tokens -> no fingerprints
    assert _fps(spark, "a b c") == []
    # k..k+w-2 tokens: one window, exactly one fingerprint
    assert len(_fps(spark, "a b c d e")) == 1
    # positions are 1-based and within gram range
    for f in fps:
        pos = f & ((1 << 20) - 1)
        assert 1 <= pos <= m


def test_winnow_hash_roundtrip(spark):
    df = spark.createDataFrame([("one two three four five six",)], "text string")
    r = df.select(
        F.explode(winnow_fingerprints(F.col("text"))).alias("f")
    ).select("f", winnow_hash(F.col("f")).alias("h"))
    for row in r.collect():
        assert row["h"] == row["f"] >> 20


def test_greedy_pack_by_group_capacity_and_reset(spark):
    from glue_jobs_for_data_pipeline_spark.operators.corpus import (
        greedy_pack_by_group,
    )

    rows = [
        ("a", 1, 600),
        ("a", 2, 700),  # 600+700 <= 1500 -> bin 0
        ("a", 3, 400),  # 1700 > 1500 -> bin 1
        ("a", 4, 2000),  # oversized -> own bin 2 (bin 1 had 400)
        ("b", 1, 100),  # new group -> bin restarts at 0
    ]
    df = spark.createDataFrame(rows, "g string, fid long, sz long")
    got = greedy_pack_by_group(
        df, "g", ["fid"], "sz", capacity=1500,
        out_schema="g string, bin long, fid long, sz long",
    ).collect()
    by = {(r["g"], r["fid"]): r["bin"] for r in got}
    assert by[("a", 1)] == 0 and by[("a", 2)] == 0
    assert by[("a", 3)] == 1
    assert by[("a", 4)] == 2
    assert by[("b", 1)] == 0
    # capacity invariant: no bin of non-oversized items exceeds capacity
    sums: dict = {}
    for r in got:
        sums.setdefault((r["g"], r["bin"]), 0)
        sums[(r["g"], r["bin"])] += r["sz"]
    for (g, b), s in sums.items():
        members = [r for r in got if r["g"] == g and r["bin"] == b]
        assert s <= 1500 or len(members) == 1


def test_temperature_mix_is_integer_exact(spark, sf_dir):
    """The mixture plan's weights/thresholds re-derive exactly in pure
    Python integer arithmetic — no float-order dependence anywhere."""
    from glue_jobs_for_data_pipeline_spark.plans.curation_pack import (
        x_corpus_temperature_mix,
    )

    rows = x_corpus_temperature_mix(spark, sf_dir).collect()
    sum_w = sum(r["weight"] for r in rows)
    for r in rows:
        assert r["weight"] == math.isqrt(r["n_docs"])
        assert r["thresh16"] == (100 * r["weight"] * 65536) // (
            sum_w * r["n_docs"]
        )
        assert 0 <= r["n_sampled"] <= r["n_docs"]
    # temperature flattening: sampling rate decreases with domain size
    # (weight/n = 1/sqrt(n)); with a shared budget the threshold of a
    # larger domain is never higher than a smaller domain's
    by_n = sorted(rows, key=lambda r: r["n_docs"])
    for lo, hi in zip(by_n, by_n[1:]):
        if lo["n_docs"] < hi["n_docs"]:
            assert hi["thresh16"] <= lo["thresh16"]


def test_matryoshka_digest_is_unit_norm(spark, sf_dir):
    from glue_jobs_for_data_pipeline_spark.plans.curation_pack import (
        x_emb_matryoshka,
    )

    rows = x_emb_matryoshka(spark, sf_dir).limit(50).collect()
    assert rows
    for r in rows:
        assert r["norm16"] > 0
        # renormalized elements live in [-1, 1]
        assert -1.0000001 <= r["renorm_min"] <= r["renorm_max"] <= 1.0000001


def test_normalized_dedup_groups_cover_exact_dups(spark, sf_dir):
    """Every byte-exact duplicate group is also a normalized group."""
    from glue_jobs_for_data_pipeline_spark.plans.curation_pack import (
        x_dedup_normalized_text,
    )
    from glue_jobs_for_data_pipeline_spark.sources.readers import load_table

    d = load_table(spark, sf_dir, "documents")
    n_exact_dup_docs = (
        d.groupBy("text").count().filter(F.col("count") >= 2)
        .agg(F.sum("count")).first()[0]
    ) or 0
    n_norm_dup_docs = (
        x_dedup_normalized_text(spark, sf_dir)
        .agg(F.sum("n_members")).first()[0]
    ) or 0
    assert n_norm_dup_docs >= n_exact_dup_docs


def test_winnow_pairs_flags_clones_and_caps_boilerplate(spark):
    from glue_jobs_for_data_pipeline_spark.plans import curation_pack as cp

    # two clone-ish docs sharing a long run + one unrelated doc
    run = " ".join(f"w{i}" for i in range(40))
    rows = [
        (1, "intro text here " + run),
        (2, run + " some tail content words"),
        (3, " ".join(f"z{i * 13 % 71}" for i in range(60))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    import glue_jobs_for_data_pipeline_spark.sources.readers as rd

    orig = rd.load_table
    try:
        rd.load_table = lambda s, d, t: df  # noqa: E731
        # route the pack's loader to the fixture
        cp.load_table = rd.load_table
        got = {
            (r["doc_a"], r["doc_b"]): r["n_shared"]
            for r in cp.x_dedup_winnow_pairs(spark, "unused").collect()
        }
    finally:
        rd.load_table = orig
        cp.load_table = orig
    assert (1, 2) in got and got[(1, 2)] >= 2
    assert all(p == (1, 2) for p in got)


def test_bpe_merges_counts_on_crafted_corpus(spark, tmp_path):
    """Pair counts match the hand-computed BPE tally: 'ab ab cd' has
    word freqs {ab:2, cd:1}; pairs ab,b$ (x2) and cd,d$ (x1)."""
    import pandas as pd

    pd.DataFrame({"doc_id": [1], "text": ["ab ab cd"]}).to_parquet(
        str(tmp_path / "documents.parquet")
    )
    from glue_jobs_for_data_pipeline_spark.plans.curation_pack import (
        x_text_bpe_merges,
    )

    out = {r["pair"]: r["pair_count"] for r in
           x_text_bpe_merges(spark, str(tmp_path)).collect()}
    assert out == {"ab": 2, "b$": 2, "cd": 1, "d$": 1}


def test_bpe_merges_word_table_first_plan(spark, sf_dir):
    """The pair explode runs over the DISTINCT-WORD table, not the
    corpus: exactly two hash aggregates (word freq, pair sum) and no
    Python node."""
    from glue_jobs_for_data_pipeline_spark.plans.curation_pack import (
        x_text_bpe_merges,
    )

    plan = (
        x_text_bpe_merges(spark, sf_dir)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "InPandas" not in plan and "BatchEvalPython" not in plan


def test_linkage_patterns_crafted_blocks(spark, tmp_path):
    """Two customers agreeing on everything land in pattern (1,1,1);
    a third in the same block disagreeing on segment contributes
    (0,x,x) rows; a 41-customer hot block is excluded by the cap."""
    import pandas as pd

    rows = [
        # block (7, 1): three members
        (1, "Customer#000000001", 7, 150.00, "BUILDING"),
        (11, "Customer#000000011", 7, 151.00, "BUILDING"),
        (21, "Customer#000000002", 7, 152.00, "MACHINERY"),
    ]
    # hot block (3, 0): 41 members -> capped out entirely
    rows += [
        (100 + i, f"Customer#{100 + i:09d}", 3, 50.00, "AUTOMOBILE")
        for i in range(41)
    ]
    pd.DataFrame(
        rows,
        columns=[
            "c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"
        ],
    ).to_parquet(str(tmp_path / "customer.parquet"))
    from glue_jobs_for_data_pipeline_spark.plans.curation_pack import (
        x_dedup_linkage_patterns,
    )

    got = {
        (r["agree_segment"], r["agree_balcent"], r["agree_namedigit"]):
        r["n_pairs"]
        for r in x_dedup_linkage_patterns(spark, str(tmp_path)).collect()
    }
    # pairs among {1,11,21}: (1,11) seg=1 cent=1 (00==00) name=1 (1==1)
    # (1,21) seg=0 cent=1 name=0 (1 vs 2); (11,21) seg=0 cent=1 name=0
    assert got == {(1, 1, 1): 1, (0, 1, 0): 2}


def test_subword_encode_greedy_walk(spark, tmp_path):
    """Greedy longest-match segmentation on a corpus small enough that
    every gram enters the vocabulary: whole-word 4/3/2-gram matches
    take one token each, and a 9-char word segments 4+4+1."""
    import pandas as pd

    pd.DataFrame(
        {"doc_id": [1, 2], "text": ["abcd ab cd xyz", "abcdabcda"]}
    ).to_parquet(str(tmp_path / "documents.parquet"))
    from glue_jobs_for_data_pipeline_spark.plans.curation_pack import (
        x_text_subword_encode,
    )

    out = {r["doc_id"]: r for r in
           x_text_subword_encode(spark, str(tmp_path)).collect()}
    assert out[1]["n_words"] == 4
    assert out[1]["n_subword_tokens"] == 4  # abcd | ab | cd | xyz
    assert out[1]["n_chars"] == 11
    assert out[1]["chars_per_token"] == 11 / 4
    assert out[2]["n_subword_tokens"] == 3  # abcd | abcd | a
    assert out[2]["chars_per_token"] == 3.0


def test_subword_encode_fixture_invariants(spark, sf_dir):
    """Token counts are bounded by ceil(chars/4) below and chars above,
    per doc — the greedy walk can never emit fewer than len/4 or more
    than len tokens."""
    from glue_jobs_for_data_pipeline_spark.plans.curation_pack import (
        x_text_subword_encode,
    )

    rows = x_text_subword_encode(spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        assert r["n_subword_tokens"] * 4 >= r["n_chars"]
        assert r["n_subword_tokens"] <= r["n_chars"]
        assert r["n_subword_tokens"] >= r["n_words"]


# --------------------------------------------------------------------------
# DSIR importance weights: both tiers agree on the decision axis
# --------------------------------------------------------------------------


def test_dsir_tiers_rank_target_language_above_rest(spark, sf_dir):
    """The paper-faithful log-likelihood tier (dsir_log_weights) and
    the hash-gated integer-ratio tier (x_text_dsir_weights) must both
    put target-language docs above the rest on average, and broadly
    agree with each other doc-by-doc."""
    from glue_jobs_for_data_pipeline_spark.operators.corpus import (
        dsir_log_weights,
    )
    from glue_jobs_for_data_pipeline_spark.plans.curation_pack import (
        x_text_dsir_weights,
    )
    from glue_jobs_for_data_pipeline_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents")
    logw = {
        r["doc_id"]: r["logw"]
        for r in dsir_log_weights(docs, F.col("lang") == "en").collect()
    }
    ratio = {
        r["doc_id"]: r["score"]
        for r in x_text_dsir_weights(spark, sf_dir).collect()
    }
    lang = {r["doc_id"]: r["lang"] for r in docs.select("doc_id", "lang").collect()}
    assert set(logw) == set(ratio) == set(lang)

    def mean(xs):
        xs = list(xs)
        return sum(xs) / len(xs)

    # both tiers separate the target language on average
    assert mean(logw[d] for d in logw if lang[d] == "en") > mean(
        logw[d] for d in logw if lang[d] != "en"
    )
    assert mean(ratio[d] for d in ratio if lang[d] == "en") > mean(
        ratio[d] for d in ratio if lang[d] != "en"
    )

    # doc-level agreement: rank correlation between the tiers is
    # clearly positive. It is NOT near 1 by construction — the log
    # tier weights rare-bucket evidence multiplicatively while the
    # ratio surrogate is linear in bucket counts — so the pinned bound
    # is "same decision axis", not "same ordering" (observed ~0.58 on
    # the sf0.001 fixture).
    ids = sorted(logw)
    def ranks(scores):
        order = sorted(ids, key=lambda d: (scores[d], d))
        return {d: i for i, d in enumerate(order)}
    ra, rb = ranks(logw), ranks(ratio)
    n = len(ids)
    d2 = sum((ra[d] - rb[d]) ** 2 for d in ids)
    spearman = 1 - 6 * d2 / (n * (n * n - 1))
    assert spearman > 0.4, spearman


def test_dsir_log_weights_handles_single_token_docs(spark):
    from glue_jobs_for_data_pipeline_spark.operators.corpus import (
        dsir_log_weights,
    )

    df = spark.createDataFrame(
        [(1, "hello", True), (2, "hello world", False), (3, "x", False)],
        "doc_id int, text string, is_t boolean",
    )
    out = dsir_log_weights(df, F.col("is_t"), text_col="text").collect()
    got = {r["doc_id"]: r["n_grams"] for r in out}
    assert got == {1: 1, 2: 3, 3: 1}  # bigram only where >= 2 tokens


def test_dsir_log_weights_keeps_null_text_docs_with_neutral_weight(spark):
    from glue_jobs_for_data_pipeline_spark.operators.corpus import (
        dsir_log_weights,
    )

    df = spark.createDataFrame(
        [(1, "hello world", True), (2, None, False), (3, "hello", False)],
        "doc_id int, text string, is_t boolean",
    )
    out = {r["doc_id"]: r for r in dsir_log_weights(df, F.col("is_t")).collect()}
    assert set(out) == {1, 2, 3}  # the NULL-text doc is not dropped
    assert out[2]["n_grams"] == 0 and out[2]["logw"] == 0.0


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(
    max_examples=8,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    texts=st.lists(
        st.text(
            alphabet=st.sampled_from(list("ab c\tD!é ")),
            min_size=1,
            max_size=30,
        ),
        min_size=1,
        max_size=6,
    )
)
def test_hashed_grams_match_python_reference(spark, texts):
    """_hashed_grams' unigram+bigram multiset equals a pure-Python
    re-tokenization for ANY messy-whitespace/unicode text (the gram
    set is the part both DSIR tiers and the SQL twin must agree on;
    bucket hashing is md5 and engine-portable by construction)."""
    import re
    from collections import Counter

    from glue_jobs_for_data_pipeline_spark.operators.corpus import (
        _hashed_grams,
    )

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
    )
    got = Counter(
        (r["doc_id"], r["bucket"])
        for r in _hashed_grams(df, "doc_id", "text", 64).collect()
    )

    import hashlib

    def bucket(g: str) -> int:
        return int(hashlib.md5(g.encode("utf-8")).hexdigest()[:8], 16) % 64

    want: Counter = Counter()
    for i, t in enumerate(texts):
        # Spark trim() and DuckDB trim() strip SPACES only (not tabs) —
        # the engines agree with each other, so the reference must
        # strip(" "), not Python's all-whitespace strip()
        w = re.split(r"\s+", t.strip(" ").lower())
        grams = list(w) + [f"{a} {b}" for a, b in zip(w, w[1:])]
        for g in grams:
            want[(i, bucket(g))] += 1
    assert got == want
