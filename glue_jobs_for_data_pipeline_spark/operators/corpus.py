"""Composed training-corpus preparation: the end-to-end LLM data-pipeline
flow (BASELINE north-star) built entirely from this package's kernels:

    score (lang-ID, quality, token count, fingerprint)
      -> filter (language + quality gates)
      -> exact dedup (min-id survivor per content fingerprint)
      -> optional near-dup removal (MinHash-LSH pairs)

Everything before near-dup removal is built-in-expression only (one scan,
one 16-byte-key shuffle) and therefore oracle-checkable; the near-dup
stage adds the LSH candidate join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import (
    content_fingerprint,
    lang_id,
    quality_score,
    token_count,
    tokens,
)
from ..sources.readers import spread
from .dedup import minhash_lsh_pairs


def score_documents(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Scoring is the CPU-heavy stage (regex + stopword folds per doc);
    spread() keeps it parallel even off a single-row-group source."""
    t = F.col(text_col)
    return spread(docs).select(
        id_col,
        text_col,
        lang_id(t).alias("lang_pred"),
        quality_score(t).alias("quality"),
        token_count(t).alias("n_tokens"),
        content_fingerprint(t).alias("fp"),
    )


def prepare_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang: str = "en",
    min_quality: float = 0.3,
) -> DataFrame:
    """Language gate + quality gate + exact dedup; returns
    (doc_id, n_tokens, quality) for the surviving documents."""
    scored = score_documents(docs, id_col, text_col)
    filtered = scored.filter(
        (F.col("lang_pred") == lang) & (F.col("quality") >= min_quality)
    )
    survivors = filtered.groupBy("fp").agg(F.min(id_col).alias(id_col))
    return survivors.join(filtered, id_col).select(id_col, "n_tokens", "quality")


def prepare_corpus_neardup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang: str = "en",
    min_quality: float = 0.3,
    min_est_jaccard: float = 0.8,
) -> DataFrame:
    """prepare_corpus + MinHash-LSH near-dup removal: of each candidate
    pair with estimated Jaccard >= threshold, only the lower doc id
    survives (deterministic)."""
    base = prepare_corpus(docs, id_col, text_col, lang, min_quality)
    pairs = minhash_lsh_pairs(docs, id_col, text_col).filter(
        F.col("est_jaccard") >= min_est_jaccard
    )
    losers = pairs.select(F.col("doc_b").alias(id_col)).distinct()
    return base.join(losers, id_col, "left_anti")


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 128,
    overlap: int = 16,
) -> DataFrame:
    """Split documents into overlapping ~chunk_tokens-token windows —
    the context-length prep step of a training pipeline (long docs
    become multiple training rows; the overlap preserves cross-boundary
    context).

    Pure built-ins: token array once per doc, chunk start offsets via
    sequence(0, n-1, stride), posexplode to (chunk_idx, start), slice +
    concat_ws per chunk. No UDF, no shuffle — the fan-out pipelines
    with the scan and Catalyst prunes untouched columns. Trailing
    chunks shorter than chunk_tokens are kept (they carry the document
    tail); a doc shorter than one chunk yields exactly one chunk.
    """
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be < chunk_tokens")
    stride = chunk_tokens - overlap
    w = tokens(F.col(text_col))
    starts = F.sequence(
        F.lit(0), F.greatest(F.size(w) - 1, F.lit(0)), F.lit(stride)
    )
    return (
        df.select(
            F.col(id_col),
            w.alias("_w"),
            F.posexplode(starts).alias("chunk_idx", "_start"),
        )
        .select(
            id_col,
            "chunk_idx",
            F.concat_ws(
                " ", F.slice("_w", F.col("_start") + 1, chunk_tokens)
            ).alias("chunk_text"),
            F.size(F.slice("_w", F.col("_start") + 1, chunk_tokens)).alias(
                "n_tokens"
            ),
        )
    )
