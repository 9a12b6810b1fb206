"""Benchmark decontamination: flag training documents that share token
n-grams with an evaluation/benchmark set.

The standard LLM-corpus hygiene step (GPT-3 appendix C, PaLM §7,
Dolma/RefinedWeb pipelines): any training document containing a long
token n-gram (n in 8..13) that also appears in an eval benchmark is
"contaminated" and must be dropped or audited before training.

Scale shape (100 TB corpus, ~10^6 eval n-grams):
- The eval side is BENCHMARK-sized, not corpus-sized — its distinct
  n-gram set fits in memory, so the contamination join is a broadcast
  semi/inner join against the exploded corpus grams: zero shuffle of
  corpus data, one scan.
- Corpus-side n-grams are generated per row with builtin higher-order
  functions (sequence/transform/slice) inside whole-stage codegen —
  no Python, no UDF — then exploded map-side straight into the
  broadcast join. Rows with zero hits never survive the join, so the
  per-doc aggregation state is bounded by the (small) hit set.
- When the eval set is genuinely large (many benchmarks x many grams),
  drop the broadcast hint and let AQE pick a shuffle join keyed on the
  gram — still one corpus scan.

Reference has no analogue (572-LoC SQL ETL); this is part of the
LLM-training-data surface SURVEY §6 adds on top of reference parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def token_ngrams(text: F.Column, n: int) -> F.Column:
    """Array of space-joined token n-grams of ``text``, [] when the
    document has fewer than n tokens.

    Builtin-only (split/sequence/transform/slice/array_join) so the
    whole expression stays inside whole-stage codegen. The explicit
    ``when`` guard matters: Spark's ``sequence(1, 0)`` infers step -1
    and yields [1, 0] instead of [], which would fabricate grams for
    short documents.
    """
    toks = F.split(F.trim(text), r"\s+")
    n_grams = F.size(toks) - F.lit(n - 1)
    return F.when(
        n_grams >= 1,
        F.transform(
            F.sequence(F.lit(1), n_grams),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def eval_ngram_set(eval_docs: DataFrame, n: int, text_col: str = "text") -> DataFrame:
    """Distinct n-gram set of the benchmark side: one column ``g``."""
    return (
        eval_docs.select(
            F.explode(token_ngrams(F.col(text_col), n)).alias("g")
        ).distinct()
    )


def contamination_report(
    docs: DataFrame,
    eval_docs: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_eval: bool = True,
) -> DataFrame:
    """Per-document contamination: (id, n_contam, contaminated).

    ``n_contam`` counts DISTINCT eval n-grams the document contains
    (a doc repeating one leaked gram 50 times counts once — the metric
    is breadth of leakage, matching how dedup literature reports it).
    Zero-hit documents are preserved via the final left join so the
    report covers the whole corpus.
    """
    evals = eval_ngram_set(eval_docs, n, text_col)
    if broadcast_eval:
        evals = F.broadcast(evals)
    grams = docs.select(
        F.col(id_col), F.explode(token_ngrams(F.col(text_col), n)).alias("g")
    )
    hits = (
        grams.join(evals, "g")
        .groupBy(id_col)
        .agg(F.count_distinct("g").alias("_n_contam"))
    )
    return docs.select(id_col).join(hits, id_col, "left").select(
        id_col,
        F.coalesce(F.col("_n_contam"), F.lit(0)).cast("bigint").alias("n_contam"),
        (F.coalesce(F.col("_n_contam"), F.lit(0)) > 0).alias("contaminated"),
    )


def decontaminate(
    docs: DataFrame,
    eval_docs: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Drop contaminated documents: broadcast LEFT ANTI join against the
    exploded gram hits — the production filter path (no aggregation at
    all; a doc is dropped on its first matching gram)."""
    evals = F.broadcast(eval_ngram_set(eval_docs, n, text_col))
    dirty = (
        docs.select(
            F.col(id_col), F.explode(token_ngrams(F.col(text_col), n)).alias("g")
        )
        .join(evals, "g")
        .select(id_col)
        .distinct()
    )
    return docs.join(dirty, id_col, "left_anti")


# --------------------------------------------------------------------------
# Winnowing fingerprints (MOSS-style local document fingerprinting)
# --------------------------------------------------------------------------

# Winnowing parameters are part of the fingerprint identity:
#   k = tokens per gram; w = grams per window.  Any shared substring of
# >= w + k - 1 tokens is GUARANTEED to share a selected fingerprint
# (the winnowing theorem) — unlike plain n-gram sampling, misses are
# impossible above the threshold while only ~2/(w+1) of grams are kept.
_WINNOW_POS_BITS = 20  # positions per doc < 2^20 (1M grams)
_WINNOW_POS_BASE = 1 << _WINNOW_POS_BITS


def winnow_fingerprints(
    text: F.Column, k: int = 5, w: int = 4
) -> F.Column:
    """Array of winnowing fingerprints of ``text`` — Schleimer,
    Wilkerson & Aiken, "Winnowing: Local Algorithms for Document
    Fingerprinting" (SIGMOD 2003), the MOSS algorithm.

    Each element encodes (gram hash, gram position) in one BIGINT:
    ``hash * 2^20 + pos`` with hash = the first 10 md5 hex digits of
    the space-joined k-token gram (< 2^40, so the combined value stays
    in positive BIGINT and is portable SQL text on any engine — the
    table-checksum '0x'-cast pattern). Selection = min combined value
    of every w-gram window, deduplicated; the position term makes the
    min TOTAL (no tie ambiguity), exactly the robust-winnowing
    determinism requirement.

    ENTIRELY map-side: token array -> gram hash array (two-arg
    transform gives the position) -> ONE aggregate fold that slides a
    w-element ring buffer over the hash array, emitting each window's
    min -> array_distinct. Zero shuffle, zero UDF; the per-doc cost is
    O(grams x w). The fold matters: a transform-over-window-starts
    formulation re-evaluates the WHOLE gram-hash array (every md5) per
    window position — higher-order lambdas don't CSE captured
    expressions, so that shape is O(grams^2) hashing (measured 9.4 s
    vs 0.5 s for the corpus scan at sf0.1); aggregate() evaluates its
    input array exactly once per row. Documents shorter than one full
    window yield the min of what exists (one window); documents with
    fewer than k tokens yield [].
    """
    toks = F.split(F.trim(text), r"\s+")
    m = F.size(toks) - F.lit(k - 1)  # number of k-grams
    grams = F.transform(
        F.sequence(F.lit(1), m),
        lambda i: F.array_join(F.slice(toks, i, k), " "),
    )
    combined = F.transform(
        grams,
        lambda g, i: F.conv(F.substring(F.md5(g), 1, 10), 16, 10).cast("long")
        * F.lit(_WINNOW_POS_BASE)
        + (i + F.lit(1)).cast("long"),
    )
    empty = F.array().cast("array<long>")

    def _step(acc, x):
        # positive-start slice: slice(c, -w, w) is NULL when size(c) < w
        c = F.concat(acc["buf"], F.array(x))
        buf = F.slice(c, F.greatest(F.size(c) - F.lit(w - 1), F.lit(1)), w)
        return F.struct(
            buf.alias("buf"),
            F.when(
                F.size(buf) >= w,
                F.concat(acc["out"], F.array(F.array_min(buf))),
            )
            .otherwise(acc["out"])
            .alias("out"),
        )

    sels = F.aggregate(
        combined,
        F.struct(empty.alias("buf"), empty.alias("out")),
        _step,
        # m < w: no full window closed — one window of everything
        lambda acc: F.when(
            F.size(acc["out"]) == 0, F.array(F.array_min(acc["buf"]))
        ).otherwise(acc["out"]),
    )
    return F.when(m >= 1, F.array_distinct(sels)).otherwise(empty)


def winnow_hash(fp: F.Column) -> F.Column:
    """The gram-hash half of a combined fingerprint (drops position):
    the join key for cross-document matching."""
    return F.shiftright(fp, _WINNOW_POS_BITS).cast("long")
