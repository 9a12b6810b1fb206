"""Deterministic sampling for training-data pipelines.

``df.sample()`` is seed-dependent AND partition-layout-dependent — the
same seed yields different rows after a repartition, which breaks
reproducible corpus builds and makes a differential oracle impossible.
These operators derive every sampling decision from a cryptographic hash
of the ROW's own key, so the sample is a pure function of the data:
stable across runs, partitionings, engines, and cluster sizes, and
expressible in ANSI SQL for the DuckDB oracle.

The md5-prefix trick: md5 hex digits are uniform, so comparing a k-digit
prefix against a threshold string samples at threshold/16^k resolution
(k=4 -> 1/65536 granularity) with zero RNG state. The filter is a plain
codegen'd predicate — it pushes into the scan and costs one hash per
row at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _hash_prefix(key: F.Column, digits: int = 4) -> F.Column:
    return F.substring(F.md5(key.cast("string")), 1, digits)


def hash_threshold(rate: float, digits: int = 4) -> str:
    """Hex threshold string t such that P(md5_prefix < t) ~= rate.

    rate >= 1.0 returns the sentinel ``"g"``: every hex prefix compares
    below it, so the predicate selects all rows. (The naive
    ``format(16**digits)`` would yield a 5-char string like ``"10000"``
    that loses lexicographic comparison to most 4-char hex prefixes.)
    """
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate {rate} outside [0, 1]")
    if rate >= 1.0:
        return "g"
    return format(int(rate * (16 ** digits)), f"0{digits}x")


def sample_by_hash(
    df: DataFrame, key_col: str, rate: float, digits: int = 4
) -> DataFrame:
    """Deterministic Bernoulli(rate) sample keyed on ``key_col``."""
    return df.filter(
        _hash_prefix(F.col(key_col), digits) < F.lit(hash_threshold(rate, digits))
    )


def split_by_hash(
    df: DataFrame,
    key_col: str,
    holdout_rate: float = 0.1,
    split_col: str = "split",
    digits: int = 4,
) -> DataFrame:
    """Stable train/holdout assignment: a row's split never changes as
    the corpus grows (membership depends only on its own key), which is
    the property that prevents eval-set contamination across corpus
    versions."""
    thr = hash_threshold(holdout_rate, digits)
    return df.withColumn(
        split_col,
        F.when(
            _hash_prefix(F.col(key_col), digits) < F.lit(thr), F.lit("holdout")
        ).otherwise(F.lit("train")),
    )


def stratified_fixed_n(
    df: DataFrame, strata_cols: list[str], key_col: str, n_per_stratum: int
) -> DataFrame:
    """Exactly min(n, stratum size) rows per stratum, chosen by hash
    order — a deterministic balanced subsample (e.g. equal docs per
    language). One shuffle on the strata key; the per-stratum window
    never sees more than a stratum's rows."""
    w = Window.partitionBy(*strata_cols).orderBy(
        _hash_prefix(F.col(key_col)), F.col(key_col)
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n_per_stratum)
        .drop("_rn")
    )


def resample_mix(
    df: DataFrame,
    group_col: str,
    key_col: str,
    rates: dict[str, float],
    default_rate: float = 1.0,
    digits: int = 4,
) -> DataFrame:
    """Domain-mixture resampling: per-group deterministic downsampling
    rates (e.g. keep 100% of wiki, 30% of common-crawl) — the knob every
    LLM corpus recipe exposes as "mixture weights".

    Implemented as ONE codegen'd predicate: a CASE over the group column
    choosing the hash threshold. No join, no shuffle, pushes to the
    scan; a row's fate depends only on (its group, its key), so the mix
    is reproducible across runs and cluster layouts, and rerunning on a
    grown corpus keeps every previously selected row (monotone sample).
    """
    thr = F.lit(hash_threshold(default_rate, digits))
    for g, r in sorted(rates.items()):
        thr = F.when(F.col(group_col) == g, F.lit(hash_threshold(r, digits))).otherwise(
            thr
        )
    return df.filter(_hash_prefix(F.col(key_col), digits) < thr)


def token_budget_fill(
    df: DataFrame,
    group_col: str,
    token_col: str,
    budget: int,
    order_cols: list,
) -> DataFrame:
    """Greedy per-group budget fill: walk each group's rows in
    ``order_cols`` order (best first) and keep a row while the tokens
    accumulated BEFORE it are still under ``budget`` — the "take the
    best N tokens per domain" selection every mixture recipe needs once
    weights are stated in tokens rather than documents. The kept set
    can overshoot by at most one document (the standard greedy
    contract); it is deterministic ONLY given a total order, which is
    why ``order_cols`` is required with no default: make it total by
    ending in a unique key (e.g. quality DESC, doc_id ASC) — ties at
    the budget boundary otherwise keep partition-layout-dependent rows,
    the irreproducibility this module exists to prevent.

    One shuffle on the group key; the running SUM is a frame-bounded
    window (UNBOUNDED PRECEDING .. 1 PRECEDING) evaluated
    partition-locally. A group's rows land on one partition — fine for
    domain-grained groups (hundreds-to-thousands of groups); for a
    single colossal group, pre-filter with sample_by_hash to ~2x the
    budget first (cheap, scan-side) so the window only sorts the
    shortlist, then budget-fill exactly.
    """
    w = Window.partitionBy(group_col).orderBy(*order_cols)
    cum_before = F.sum(token_col).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        df.withColumn("_cum_before", F.coalesce(cum_before, F.lit(0)))
        .filter(F.col("_cum_before") < budget)
        .drop("_cum_before")
    )


def shard_positions(
    df: DataFrame,
    key_col: str,
    n_shards: int,
    seed: str = "0",
    shard_col: str = "shard",
    pos_col: str = "pos",
) -> DataFrame:
    """Deterministic global training-order shuffle, sharded.

    A global ORDER BY random() is neither reproducible nor resumable; a
    global row_number is a single-partition window (scale killer). This
    derives a seeded hash per row, buckets it into ``n_shards`` shards,
    and numbers rows WITHIN each shard by hash order — the layout a
    training loader actually consumes (shard files read sequentially,
    shards themselves interleaved). One shuffle on the shard key; each
    window sees ~N/n_shards rows, so it scales out with shard count.
    Re-running with the same seed reproduces the exact order.
    """
    h = F.md5(F.concat_ws("|", F.lit(seed), F.col(key_col).cast("string")))
    shard = (
        F.conv(F.substring(h, 1, 4), 16, 10).cast("bigint") % F.lit(n_shards)
    ).cast("int")
    w = Window.partitionBy(shard_col).orderBy(F.col("_h"), F.col(key_col))
    return (
        df.withColumn("_h", h)
        .withColumn(shard_col, shard)
        .withColumn(pos_col, F.row_number().over(w))
        .drop("_h")
    )
