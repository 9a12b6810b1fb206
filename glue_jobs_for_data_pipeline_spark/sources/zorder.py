"""Z-order (Morton-curve) clustering for multi-column data skipping.

Parquet readers skip row groups / files whose [min, max] column ranges
cannot satisfy a filter. A layout sorted on ONE column gives perfect
skipping on that column and none on others; interleaving the bits of
several columns' ranks gives every interleaved column locality, so a
box predicate on ANY subset of them intersects only O(surface) of the
files instead of all of them — the standard Delta/Iceberg OPTIMIZE
ZORDER BY recipe, built here from plain DataFrame expressions:

1. per column, map values to a uniform integer rank in [0, 2^bits)
   via exact min/max scaling (one tiny agg per column, broadcast);
2. interleave the rank bits into a single Morton key (pure bit
   arithmetic, JVM-side, no UDF);
3. repartitionByRange(morton) + sortWithinPartitions(morton) + write
   — range partitioning gives each output file a tight Morton
   interval, i.e. a small hyper-rectangle of the value space.

At 100 TB this is one extra full shuffle at WRITE time (range exchange
on the Morton key) bought once, against every subsequent scan skipping
most of the corpus; re-cluster per partition (e.g. per day) so the
sort never spans the whole table. bits=16 per column bounds the key at
2 columns x 16 = 32 bits (or 21 bits x 3 = 63) — within a BIGINT.

No counterpart in the reference (Redshift sort keys play this role:
the reference's tables implicitly rely on Redshift's zone maps); this
is the Spark-native equivalent of that storage concern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _rank_expr(col: str, mn: str, mx: str, bits: int) -> F.Column:
    """Scale a numeric column to an integer rank in [0, 2^bits) using
    the broadcast min/max columns ``mn``/``mx``. Degenerate (constant)
    columns rank 0 everywhere."""
    span = F.col(mx) - F.col(mn)
    scaled = F.when(span == 0, F.lit(0.0)).otherwise(
        (F.col(col).cast("double") - F.col(mn)) / span
    )
    top = (1 << bits) - 1
    # NULL values rank 0 (cluster at the LOW Morton corner). The
    # coalesce must sit INSIDE the least(): Spark's least() skips NULL
    # operands, so least(top, NULL) returns top — a NULL value would
    # silently land at the HIGH Morton corner and pollute the top
    # region's footer stats with rows that match no range predicate
    # (ADVICE r07). The same coalesce also absorbs the all-NULL-column
    # case (mn/mx NULL -> span NULL -> scaled NULL).
    rank = F.least(
        F.lit(top),
        F.coalesce(
            F.floor(scaled * F.lit(1 << bits)).cast("long"),
            F.lit(0).cast("long"),
        ),
    )
    return rank.alias(f"_rank_{col}")


def _interleave(rank_cols: list[str], bits: int) -> F.Column:
    """Morton-interleave the bit planes of the rank columns: output bit
    (i * n + j) takes bit i of rank j. Pure shift/and/or expression —
    whole-stage codegen keeps it JVM-side."""
    n = len(rank_cols)
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, rc in enumerate(rank_cols):
            bit = F.shiftright(F.col(rc), i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(
                F.shiftleft(bit.cast("long"), i * n + j)
            )
    return z.alias("_morton")


def zorder_write(
    df: DataFrame,
    cols: list[str],
    path: str,
    n_files: int = 8,
    bits: int = 8,
) -> None:
    """Write ``df`` as parquet clustered on the Morton order of ``cols``.

    Each output file covers a contiguous Morton range =>: a small
    hyper-rectangle in (cols) space, so per-file min/max footer stats
    prune box queries on any of the clustered columns. The rank
    min/max aggregate is one broadcast row; the range partitioner
    samples the Morton key as usual."""
    # the Morton key lives in a signed 64-bit long: one more bit and
    # shiftleft spills into the sign bit, silently corrupting the order
    assert bits * len(cols) <= 63, (
        f"bits*cols = {bits}*{len(cols)} exceeds the 63-bit Morton budget"
    )
    stats = df.agg(
        *[
            f
            for c in cols
            for f in (
                F.min(F.col(c).cast("double")).alias(f"_mn_{c}"),
                F.max(F.col(c).cast("double")).alias(f"_mx_{c}"),
            )
        ]
    )
    ranked = df.crossJoin(F.broadcast(stats)).select(
        *df.columns,
        *[_rank_expr(c, f"_mn_{c}", f"_mx_{c}", bits) for c in cols],
    )
    keyed = ranked.select(
        *df.columns, _interleave([f"_rank_{c}" for c in cols], bits)
    )
    (
        keyed.repartitionByRange(n_files, "_morton")
        .sortWithinPartitions("_morton")
        .drop("_morton")
        .write.mode("overwrite")
        .parquet(path)
    )


def zvalue_sql(levels: dict[str, str], bits: int) -> str:
    """The Morton interleave as ANSI-SQL TEXT: ``levels`` maps a
    column alias to the SQL expression of its integer level in
    [0, 2^bits). This is ``_interleave`` restated term for term so a
    DuckDB oracle can hash-check a clustering decision end to end
    (x_storage_zorder_layout pairs it with equal-width integer levels,
    whose scaling both engines state identically; the write path's
    double-scaled _rank_expr keeps its permutation + footer-stats
    checks instead). Bit i of column j lands at position i * n + j,
    exactly as _interleave places it."""
    exprs = list(levels.values())
    n = len(exprs)
    if bits * n > 63:
        raise ValueError(
            f"bits*cols = {bits}*{n} exceeds the 63-bit Morton budget"
        )
    terms = []
    for i in range(bits):
        for j, e in enumerate(exprs):
            # outer parens are load-bearing: '+' binds tighter than
            # '<<', so unparenthesized terms re-associate when joined
            terms.append(f"(((({e}) >> {i}) & 1) << {i * n + j})")
    return " + ".join(terms)
