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
