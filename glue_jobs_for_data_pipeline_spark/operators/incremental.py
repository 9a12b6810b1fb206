"""Incremental aggregate maintenance: a materialized grouped aggregate
kept current by merging per-batch PARTIAL aggregates, never re-scanning
history.

The warehouse pattern behind every "daily rollup" table: at 100 TB the
fact history is unrecomputable on each load, but grouped
sums/counts/mins/maxes are ALGEBRAIC — a new batch contributes its own
partial state, and merge(stored, delta) = groupBy(keys).sum(...) over
their union. Cost per refresh is O(batch + |distinct keys|), not
O(history); the merge shuffles only aggregate rows (keys x few
measures), the batch itself collapses map-side before the shuffle.

AVG is maintained as (sum, count) and derived at read — storing the
ratio would make the state non-mergeable. Same decomposition extends to
stddev (sum, sum-of-squares, count) and approx-distinct (HLL sketch
merge); exact DISTINCT and percentiles are NOT algebraic and need their
own structures (the catalog's count-distinct / percentile queries are
full-recompute by design).

Storage: each refresh commits through sources/txn.py's atomic pointer
swap, so readers always see a complete rollup — never a half-merged
one — and a failed refresh is a free rollback.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources import txn


def cdc_apply(
    feed: DataFrame,
    key_cols: list[str],
    seq_cols: list[str],
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """Collapse a CDC changelog (insert/update/delete records) to the
    current snapshot: keep each key's LATEST record by ``seq_cols``
    (make the order total — e.g. (commit_seq, offset) — or the survivor
    is nondeterministic), then drop keys whose latest record is a
    tombstone. This is the Debezium/DMS-style feed-to-table collapse
    that precedes an SCD-2 upsert or a snapshot publish.

    One window shuffle on the key; the tombstone filter is free (applied
    post-window, no extra pass). Deletes must ride the SAME ordering
    domain as upserts — filtering tombstones before the window instead
    would resurrect a deleted key's older version, the classic CDC
    replay bug.
    """
    w = Window.partitionBy(*key_cols).orderBy(
        *[F.col(c).desc() for c in seq_cols]
    )
    return (
        feed.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .filter(F.col(op_col) != delete_op)
        .drop("_rn", op_col)
    )


def partial_aggs(
    batch: DataFrame, keys: list[str], sum_cols: dict[str, str]
) -> DataFrame:
    """Collapse a batch to its partial aggregate state: one row per key
    with n_rows + exact decimal sums (``sum_cols`` maps source column ->
    output measure name). Map-side combine does most of the work; only
    per-key partials reach the shuffle."""
    return batch.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_rows"),
        *[
            F.sum(F.col(src).cast("decimal(28,2)")).alias(dst)
            for src, dst in sum_cols.items()
        ],
    )


def merge_aggs(
    stored: DataFrame, delta: DataFrame, keys: list[str], measures: list[str]
) -> DataFrame:
    """merge(stored, delta): union the two partial states and re-sum.
    Keys present in only one side pass through (full outer semantics via
    union+groupBy, no join)."""
    return (
        stored.select(*keys, "n_rows", *measures)
        .unionByName(delta.select(*keys, "n_rows", *measures))
        .groupBy(*keys)
        .agg(
            F.sum("n_rows").alias("n_rows"),
            *[F.sum(m).alias(m) for m in measures],
        )
    )


def refresh_rollup(
    spark: SparkSession,
    rollup_dir: str,
    batch: DataFrame,
    keys: list[str],
    sum_cols: dict[str, str],
) -> DataFrame:
    """Apply one batch to the stored rollup and commit atomically.
    First call bootstraps the rollup from the batch alone. Returns the
    newly committed state."""
    delta = partial_aggs(batch, keys, sum_cols)
    measures = list(sum_cols.values())
    if txn.current_version(rollup_dir) is None:
        merged = delta
    else:
        stored = txn.read_committed(spark, rollup_dir)
        merged = merge_aggs(stored, delta, keys, measures)
    txn.txn_overwrite(merged, rollup_dir)
    return txn.read_committed(spark, rollup_dir)
