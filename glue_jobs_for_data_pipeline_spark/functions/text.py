"""Text-analysis kernels for training-data pipelines (SURVEY §7.5 / BASELINE
north-star: language-ID, quality scoring, token counting, fingerprinting).

All column expressions are built-in JVM functions (split / regexp /
higher-order array ops) — no Python UDFs — so they run inside
whole-stage codegen and scale linearly with a parquet scan. Every
kernel has an exact ANSI-SQL equivalent so the DuckDB oracle can check
it value-for-value.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Whitespace tokenizer shared by all kernels.
def tokens(text: Column) -> Column:
    return F.split(F.trim(text), r"\s+")


def token_count(text: Column) -> Column:
    """Whitespace token count."""
    return F.size(tokens(text))


# A BPE-ish subword proxy: alternating letter/digit/punctuation runs.
# (A real BPE needs a learned vocab; the regex segmentation is the
# deterministic, engine-portable stand-in.)
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def bpeish_token_count(text: Column) -> Column:
    # regexp_extract_all counts letter runs, digit runs, and single
    # punctuation marks — a stable upper bound on BPE token count.
    return F.size(F.regexp_extract_all(text, F.lit(BPE_ISH_PATTERN), 0))


def char_count(text: Column) -> Column:
    return F.length(text)


def punct_ratio(text: Column) -> Column:
    """Punctuation chars / total chars (per-row double division —
    IEEE-identical across engines)."""
    punct = F.length(F.regexp_replace(text, r"[^.,;:!?'\"()\-]", ""))
    return punct / F.greatest(F.length(text), F.lit(1))


STOPWORDS_EN = (
    "the a an and or of to in is are was were be been it this that for on with as",
)


def stopword_ratio(text: Column, stopwords: tuple[str, ...] | None = None) -> Column:
    words = (stopwords[0] if stopwords else STOPWORDS_EN[0]).split()
    toks = tokens(F.lower(text))
    hits = F.size(F.filter(toks, lambda t: t.isin(*words)))
    return hits / F.greatest(F.size(toks), F.lit(1))


def quality_score(text: Column) -> Column:
    """Composite quality heuristic in [0,1]: rewards moderate length,
    penalizes punctuation soup, rewards stopword presence (prose-ness).

    score = 0.4*min(n_tokens/100,1) + 0.3*(1-min(punct_ratio*5,1))
          + 0.3*min(stopword_ratio*4,1)
    """
    n = token_count(text).cast("double")
    length_term = F.least(n / F.lit(100.0), F.lit(1.0))
    punct_term = F.lit(1.0) - F.least(punct_ratio(text) * 5, F.lit(1.0))
    stop_term = F.least(stopword_ratio(text) * 4, F.lit(1.0))
    return (
        F.lit(0.4) * length_term + F.lit(0.3) * punct_term + F.lit(0.3) * stop_term
    )


# --- language ID: stopword-hit scoring + CJK codepoint detection ---------

LANG_STOPWORDS: dict[str, str] = {
    "en": "the a and of to in is that it for",
    "de": "der die das und zu den von ist mit nicht",
    "fr": "le la les et de des un une est que",
    "es": "el la los las y de que en un es",
}
# Deterministic tie-break precedence (argmax order).
LANG_ORDER = ("en", "de", "fr", "es")


def _stopword_hits(toks: Column, words: list[str]) -> Column:
    # closure factory keeps the lambda single-arg (a 2-arg lambda would be
    # interpreted as (element, index) by F.filter)
    return F.size(F.filter(toks, lambda t: t.isin(*words)))


def lang_scores(text: Column) -> dict[str, Column]:
    toks = tokens(F.lower(text))
    return {
        lang: _stopword_hits(toks, words.split())
        for lang, words in LANG_STOPWORDS.items()
    }


def lang_id(text: Column) -> Column:
    """Predicted language: 'zh' if any CJK codepoint, else the stopword
    argmax over LANG_ORDER (first wins ties), else 'und'."""
    has_cjk = F.length(F.regexp_replace(text, r"[^一-鿿]", "")) > 0
    s = lang_scores(text)
    # when() chains evaluate first-true, so listing langs in LANG_ORDER
    # with >= comparisons gives earlier langs the ties.
    chain = F.when(has_cjk, F.lit("zh"))
    for lang in LANG_ORDER:
        others = [s[o] for o in LANG_ORDER if o != lang]
        chain = chain.when(
            (s[lang] > 0) & (s[lang] >= F.greatest(*others)), F.lit(lang)
        )
    return chain.otherwise(F.lit("und"))


# --- fingerprinting -------------------------------------------------------

def normalize_text(text: Column) -> Column:
    """Canonical form for content fingerprints: lowercase, collapse
    whitespace, trim."""
    return F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))


def content_fingerprint(text: Column) -> Column:
    """Exact content fingerprint: md5 of the normalized text (portable
    across engines; used by exact dedup at scale — 16 bytes instead of
    shuffling full documents)."""
    return F.md5(normalize_text(text))


ROLLING_MOD = 1_000_000_007
ROLLING_BASE = 31


def rolling_hash(text: Column) -> Column:
    """Polynomial rolling hash of the normalized text's codepoints:
    h = (h*31 + code) mod 1e9+7 — foldLeft via aggregate(), stays JVM-side.
    Intermediate fits long: h < 1e9+7, h*31 + 0x10FFFF < 2^63.
    """
    codes = F.transform(F.split(normalize_text(text), ""), F.ascii)
    return F.aggregate(
        codes,
        F.lit(0).cast("long"),
        lambda acc, c: (acc * ROLLING_BASE + c.cast("long")) % ROLLING_MOD,
    )


# --- PII scrubbing --------------------------------------------------------
#
# Patterns are deliberately restricted to the Java-regex ∩ RE2 common
# subset (no lookahead/lookbehind, ASCII classes, \b boundaries) so the
# SAME pattern string runs in Spark (Java) and the DuckDB oracle (RE2)
# with identical matches. Redaction order is fixed (email -> IPv4 ->
# phone) and replacement tokens contain no digits, so the chain composes
# identically in both engines.

PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE = r"\+?\d[\d().\s-]{7,14}\d"


def pii_count(text: Column, pattern: str) -> Column:
    """Match count for one PII pattern (codegen'd regexp_extract_all)."""
    return F.size(F.regexp_extract_all(text, F.lit(pattern), F.lit(0)))


def redact_pii(text: Column) -> Column:
    """Replace emails, IPv4 addresses, and phone-like digit runs with
    typed placeholder tokens. Pure regexp_replace chain — pipelines with
    the scan, no UDF, linear at any corpus size."""
    out = F.regexp_replace(text, PII_EMAIL, "<EMAIL>")
    out = F.regexp_replace(out, PII_IPV4, "<IP>")
    return F.regexp_replace(out, PII_PHONE, "<PHONE>")


def dup_token_ratio(text: Column) -> Column:
    """Gopher-style repetition signal: fraction of tokens that are
    repeats of an earlier token (1 - distinct/total). Pure array
    builtins — stays in codegen, no explode."""
    toks = tokens(text)
    return F.lit(1.0) - F.size(F.array_distinct(toks)) / F.greatest(
        F.size(toks), F.lit(1)
    ).cast("double")
