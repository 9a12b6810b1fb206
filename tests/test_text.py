"""Text kernels: counts, quality, language ID on real sentences,
fingerprint stability."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from glue_jobs_for_data_pipeline_spark.functions import text as tx


@pytest.fixture(scope="module")
def df(spark):
    rows = [
        (0, "The cat sat on the mat, and it was happy."),
        (1, "Der Hund lief zu den Kindern und ist nicht müde."),
        (2, "Le chat est sur la table et les enfants sont là."),
        (3, "El perro y el gato están en la casa."),
        (4, "这是一个中文句子。"),
        (5, "xyzzy plugh qwerty"),  # no stopwords anywhere
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _col(df, expr, alias="v"):
    return {r["doc_id"]: r[alias] for r in df.select("doc_id", expr.alias(alias)).collect()}


def test_token_counts(df):
    counts = _col(df, tx.token_count(F.col("text")))
    assert counts[0] == 10
    assert counts[5] == 3


def test_bpeish_counts_splits_punct(df):
    counts = _col(df, tx.bpeish_token_count(F.col("text")))
    assert counts[0] == 12  # 10 words + comma + period


def test_lang_id(df):
    langs = _col(df, tx.lang_id(F.col("text")))
    assert langs[0] == "en"
    assert langs[1] == "de"
    assert langs[2] == "fr"
    assert langs[3] == "es"
    assert langs[4] == "zh"
    assert langs[5] == "und"


def test_quality_score_ranges(df):
    q = _col(df, tx.quality_score(F.col("text")))
    assert all(0.0 <= v <= 1.0 for v in q.values())
    # prose with stopwords outscores keyboard mash of same length
    assert q[0] > q[5]


def test_fingerprints_normalize_whitespace_and_case(spark):
    rows = [(0, "Hello  World"), (1, "hello world"), (2, "hello worlds")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fp = {
        r["doc_id"]: (r["c"], r["r"])
        for r in df.select(
            "doc_id",
            tx.content_fingerprint(F.col("text")).alias("c"),
            tx.rolling_hash(F.col("text")).alias("r"),
        ).collect()
    }
    assert fp[0] == fp[1]
    assert fp[0] != fp[2]


def test_pii_redaction_and_counts(spark):
    rows = [
        (1, "contact me at jane.doe+spam@example.co.uk or on 192.168.1.100 ok"),
        (2, "call +1 (555) 123-4567 tomorrow"),
        (3, "no pii here just words and the year 2026"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            tx.pii_count(F.col("text"), tx.PII_EMAIL).alias("n_emails"),
            tx.pii_count(F.col("text"), tx.PII_IPV4).alias("n_ips"),
            tx.redact_pii(F.col("text")).alias("red"),
        ).collect()
    }
    assert out[1]["n_emails"] == 1 and out[1]["n_ips"] == 1
    assert "<EMAIL>" in out[1]["red"] and "<IP>" in out[1]["red"]
    assert "jane.doe" not in out[1]["red"] and "192.168" not in out[1]["red"]
    assert "<PHONE>" in out[2]["red"] and "555" not in out[2]["red"]
    # clean text unchanged (short digit runs like years stay)
    assert out[3]["red"] == rows[2][1]


def test_chunk_documents_boundaries(spark):
    from glue_jobs_for_data_pipeline_spark.operators.corpus import chunk_documents

    text = " ".join(f"t{i}" for i in range(300))  # 300 tokens
    df = spark.createDataFrame([(1, text), (2, "short doc")], "doc_id long, text string")
    out = sorted(
        chunk_documents(df, chunk_tokens=128, overlap=16).collect(),
        key=lambda r: (r["doc_id"], r["chunk_idx"]),
    )
    one = [r for r in out if r["doc_id"] == 1]
    # stride 112: starts 0,112,224 -> 3 chunks of 128,128,76 tokens
    assert [r["n_tokens"] for r in one] == [128, 128, 76]
    assert one[0]["chunk_text"].split()[0] == "t0"
    assert one[1]["chunk_text"].split()[0] == "t112"
    # overlap: chunk 0's last 16 tokens == chunk 1's first 16
    assert one[0]["chunk_text"].split()[-16:] == one[1]["chunk_text"].split()[:16]
    # short doc -> exactly one whole-doc chunk
    two = [r for r in out if r["doc_id"] == 2]
    assert len(two) == 1 and two[0]["chunk_text"] == "short doc"


def test_quantize_int8_codes_in_range(spark):
    from glue_jobs_for_data_pipeline_spark.plans.catalog_ext import (
        x_emb_quantize_int8,
    )

    # output is scalarized to one (vec_id, pos, code) row per element
    # (r05: the driver gate cannot hash array cells)
    out = x_emb_quantize_int8(spark, "/root/testdata/sf0.001").collect()
    assert len(out) > 0
    by_vec: dict[int, list] = {}
    for r in out:
        assert 0 <= r["code"] <= 255
        assert r["mn"] <= r["mx"]
        by_vec.setdefault(r["vec_id"], []).append((r["pos"], r["code"]))
    for vec_id, codes in list(by_vec.items())[:50]:
        poss = sorted(p for p, _ in codes)
        assert poss == list(range(len(codes)))  # dense 0..d-1 positions
        vals = [c for _, c in codes]
        # min maps to code 0; max maps to ~255 — floor of
        # ((mx-mn)*255)/(mx-mn) can compose roundings to 254
        assert 0 in vals and max(vals) in (254, 255)


def test_pack_chunks_capacity_and_determinism(spark):
    from glue_jobs_for_data_pipeline_spark.operators.corpus import (
        chunk_documents,
        pack_chunks,
    )

    rows = [(i, " ".join(f"w{i}_{j}" for j in range(37 + (i * 13) % 200)))
            for i in range(50)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    chunks = chunk_documents(docs, chunk_tokens=64, overlap=8)
    packed = pack_chunks(chunks, context_tokens=128, n_partitions=4)
    rows1 = sorted(map(tuple, packed.collect()))

    # every chunk assigned exactly once
    assert len(rows1) == chunks.count()
    # no bin exceeds capacity (chunks <= 64 tokens, capacity 128)
    bins = packed.groupBy("bin_id").agg(F.sum("n_tokens").alias("t")).collect()
    assert all(r["t"] <= 128 for r in bins)
    # packing actually packs: fewer bins than chunks
    assert len(bins) < len(rows1)
    # deterministic: identical assignment on a second run
    rows2 = sorted(map(tuple, pack_chunks(
        chunks, context_tokens=128, n_partitions=4).collect()))
    assert rows1 == rows2


def test_chunk_reconstruction_invariant(spark):
    """For every doc length 0..200 in one pass: dropping each
    non-first chunk's leading `overlap` tokens and concatenating
    reproduces the original token stream exactly."""
    from glue_jobs_for_data_pipeline_spark.operators.corpus import chunk_documents

    chunk_tokens, overlap = 64, 8
    rows = [(n, " ".join(f"t{j}" for j in range(n))) for n in range(0, 201)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = chunk_documents(
        docs, chunk_tokens=chunk_tokens, overlap=overlap
    ).collect()
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == set(range(0, 201))
    for n, chunks in by_doc.items():
        chunks.sort(key=lambda r: r["chunk_idx"])
        rebuilt = chunks[0]["chunk_text"].split()
        for c in chunks[1:]:
            rebuilt += c["chunk_text"].split()[overlap:]
        assert rebuilt == rows[n][1].split(), f"doc len {n}"


def test_chunking_no_redundant_trailing_chunk(spark):
    """Docs whose length mod stride falls in 1..overlap (and docs
    exactly chunk_tokens long) must NOT emit a trailing chunk wholly
    contained in its predecessor."""
    from glue_jobs_for_data_pipeline_spark.operators.corpus import chunk_documents

    # chunk 128 / overlap 16 / stride 112: n=128 and n=230 both used to
    # yield a redundant final chunk
    rows = [(n, " ".join(f"t{j}" for j in range(n))) for n in (128, 230)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = chunk_documents(docs, chunk_tokens=128, overlap=16).collect()
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert len(by_doc[128]) == 1  # exactly one chunk, no duplicate tail
    assert len(by_doc[230]) == 2
    chunks = sorted(by_doc[230], key=lambda r: r["chunk_idx"])
    # chunk 2 must carry tokens beyond chunk 1's coverage
    assert chunks[1]["chunk_text"].split()[-1] == "t229"
    tail_tokens = set(chunks[1]["chunk_text"].split())
    head_tokens = set(chunks[0]["chunk_text"].split())
    assert not tail_tokens.issubset(head_tokens)
