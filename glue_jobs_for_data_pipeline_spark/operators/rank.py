"""Distributed exact-rank kernel: global ROW_NUMBER / NTILE without a
single-partition sort.

`Window.orderBy(...)` with no partition spec funnels every row through
ONE task — fine on a 150k-customer aggregate at sf0.1, a genuine
scale-killer when the ranked grain grows with the data (customers are
billions of rows at 100 TB TPC-H shape). Exact global rank does not
need that funnel: it is computable fully in parallel as

    repartitionByRange(order)            # globally ordered partitions
      -> sortWithinPartitions(order)     # each partition sorted locally
      -> monotonically_increasing_id()   # pid (high 31 bits) +
                                         # local offset (low 33 bits),
                                         # assigned in sorted order
      -> per-partition counts            # map-side-combined agg over
                                         # ~num_partitions rows; ONE
                                         # scalar-per-partition collect
      -> broadcast offset join           # rank = offset[pid] + local + 1

which is exactly the RDD `zipWithIndex` pattern lifted to DataFrames:
the big side crosses the wire once (the range exchange), the driver
sees `num_partitions` longs, and the physical plan contains NO Window
node at all. NTILE(B) then derives from (rank, N) with pure integer
arithmetic — N is already known from the collected counts, so the
bucket expression is a literal-folded column, no second pass.

Correctness preconditions (both asserted/documented, not silent):
- `order_cols` must be a TOTAL order (append a unique tiebreaker such
  as the business key). Range partitioning sends equal keys to one
  partition, so a total order also guarantees no tie straddles a
  partition boundary.
- The tagged frame is CACHED before the count job (registered with
  dedup's release_caches pool, like the phash signature stage), so the
  counts and the final result read the SAME materialization — pids
  cannot drift between the two jobs even when the upstream is a
  shuffle whose reduce-side fetch order is nondeterministic (every
  production caller here feeds the kernel from a groupBy, not a
  parquet scan, so the bare zipWithIndex determinism argument would
  not cover them). The cache also means the upstream
  scan+aggregate+exchange runs once, not twice. Cost: the ranked
  grain is held at MEMORY_AND_DISK for the query's lifetime —
  data-volume-equal to the sort itself. Pass an explicit
  `num_partitions` (we always do) so AQE never re-coalesces the
  user-specified exchange.

Reference scope: the reference's 4 Redshift scripts have no ranked
statistic at all; this kernel backs the extension queries
`x_olap_gini` (plans/metrics_pack.py) and
`x_olap_revenue_concentration` (plans/mining_pack.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_PID_BITS = 33  # monotonically_increasing_id: low 33 bits = local offset
_LOCAL_MASK = (1 << _PID_BITS) - 1


def _counts_by_partition(tagged: DataFrame, pid_col: str) -> list[tuple[int, int]]:
    """Per-range-partition row counts, sorted by pid.

    A map-side-combined COUNT over the pid column: the shuffle carries
    ~num_partitions rows, the collect returns one (pid, count) pair per
    partition — scalars, never data."""
    rows = (
        tagged.groupBy(pid_col)
        .agg(F.count(F.lit(1)).alias("__rk_cnt"))
        .collect()
    )
    return sorted((r[pid_col], r["__rk_cnt"]) for r in rows)


def distributed_row_number(
    df: DataFrame,
    order_cols: list[Column],
    out_col: str = "i",
    num_partitions: int | None = None,
) -> tuple[DataFrame, int]:
    """Exact global ROW_NUMBER over `order_cols`, fully parallel.

    `order_cols` are Column objects and may carry sort direction
    (`F.col("rev").desc()`); they MUST form a total order — append a
    unique tiebreaker. Returns `(df_with_rank, total_rows)`; the rank
    column `out_col` is LongType, 1-based, identical to
    `ROW_NUMBER() OVER (ORDER BY ...)`.

    The total row count comes free from the offset computation and is
    returned so callers (NTILE, percentile cutoffs) never run a second
    count job.
    """
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))

    from .dedup import _cached

    ranged = df.repartitionByRange(num_partitions, *order_cols).sortWithinPartitions(
        *order_cols
    )
    tagged = _cached(
        ranged.withColumn(
            "__rk_mid", F.monotonically_increasing_id()
        ).withColumn(
            "__rk_pid", F.shiftright(F.col("__rk_mid"), _PID_BITS).cast("long")
        )
    )

    counts = _counts_by_partition(tagged, "__rk_pid")
    offsets: list[tuple[int, int]] = []
    acc = 0
    for pid, cnt in counts:
        offsets.append((pid, acc))
        acc += cnt
    total = acc

    if not offsets:  # empty input: rank column exists, zero rows
        return tagged.withColumn(out_col, F.lit(None).cast("long")).drop(
            "__rk_mid", "__rk_pid"
        ), 0

    offs_df = spark.createDataFrame(offsets, "__rk_pid long, __rk_off long")
    local = F.col("__rk_mid").bitwiseAND(F.lit(_LOCAL_MASK)).cast("long")
    out = (
        tagged.join(F.broadcast(offs_df), "__rk_pid")
        .withColumn(out_col, (F.col("__rk_off") + local + F.lit(1)).cast("long"))
        .drop("__rk_mid", "__rk_pid", "__rk_off")
    )
    return out, total


def _ntile_params(total_rows: int, buckets: int) -> tuple[int, int, int]:
    """(q, r, head) for the integer NTILE formula — factored out so the
    exhaustive arithmetic test exercises the SAME constants the Column
    expression folds in (tests/test_rank.py)."""
    q, r = divmod(total_rows, buckets)
    return q, r, r * (q + 1)


def ntile_from_rank(rank: Column, total_rows: int, buckets: int) -> Column:
    """NTILE(buckets) as pure integer arithmetic over a global rank.

    SQL NTILE with N rows and B buckets gives the first N mod B buckets
    ceil(N/B) rows and the rest floor(N/B): for 1-based rank i,

        q = N div B, r = N mod B
        bucket(i) = ceil(i / (q+1))                     if i <= r*(q+1)
                  = r + ceil((i - r*(q+1)) / q)         otherwise

    Integer ceil via (x + d - 1) div d; the otherwise-branch divisor q
    is only 0 when N < B, in which case the first branch always fires
    (r = N, r*(q+1) = N >= i) — CaseWhen evaluates lazily per row, so
    the dead division never runs. LongType throughout: hash-stable
    across engines.
    """
    q, r, head = _ntile_params(total_rows, buckets)
    first = F.floor((rank + F.lit(q)) / F.lit(q + 1)).cast("long")
    rest = (
        F.lit(r) + F.floor((rank - F.lit(head) + F.lit(q - 1)) / F.lit(q))
    ).cast("long")
    return F.when(rank <= F.lit(head), first).otherwise(rest)


def distributed_ntile(
    df: DataFrame,
    order_cols: list[Column],
    buckets: int,
    out_col: str = "bucket",
    num_partitions: int | None = None,
) -> DataFrame:
    """NTILE(buckets) OVER (ORDER BY order_cols) without the
    single-partition WindowExec: distributed_row_number supplies the
    exact global rank AND the total count (no extra job), then the
    bucket is a literal-folded integer expression."""
    ranked, total = distributed_row_number(
        df, order_cols, out_col="__rk_i", num_partitions=num_partitions
    )
    if total == 0:
        return ranked.withColumn(out_col, F.lit(None).cast("long")).drop("__rk_i")
    return ranked.withColumn(
        out_col, ntile_from_rank(F.col("__rk_i"), total, buckets)
    ).drop("__rk_i")
