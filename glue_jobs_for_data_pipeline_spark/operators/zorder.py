"""Z-order (Morton) clustering keys for multi-column data skipping.

The lakehouse layout problem: min/max file statistics (the skipping
index, sources/skipindex.py) prune scans on the SORT column only — a
table sorted by l_partkey answers partkey predicates from metadata but
scans everything for suppkey predicates. Z-ordering interleaves the
bits of several columns into one sort key so that files become
rectangles in the multi-column space: each file's min/max box is tight
on EVERY interleaved column, and predicates on any of them prune
(Delta Lake's OPTIMIZE ZORDER BY; the technique is Morton's 1966
space-filling curve).

Spark realization is pure layout policy, no new machinery:
``zvalue`` is a deterministic JVM expression (rank-normalize each
column to ``bits`` levels, interleave bits round-robin); writers
``repartitionByRange(zvalue).sortWithinPartitions(zvalue)`` and every
existing min/max stats reader gets multi-column pruning for free. The
expression is plain integer arithmetic, so the DuckDB oracle restates
it term by term and the whole layout decision is hash-checkable.

Scale shape: normalization bounds come from one tiny agg (2 longs per
column to the driver — same contract as any range partitioner);
z-value assignment is a map-only scan; the clustering write is ONE
range exchange. Nothing here grows with column count but the literal
expression (bits * n_cols shift-add terms).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _level_expr(col: str, lo: int, hi: int, bits: int) -> F.Column:
    """Map [lo, hi] linearly onto [0, 2^bits - 1] (integer floor).

    Equal-width quantization is deliberate (vs equal-frequency): the
    level of a value depends only on the global (lo, hi) pair, so the
    oracle can restate it and incremental writers can keep appending
    without re-ranking history. Degenerate columns (hi == lo) map to
    level 0.
    """
    n_levels = 1 << bits
    if hi == lo:
        return F.lit(0).cast("long")
    span = hi - lo + 1
    lvl = ((F.col(col).cast("long") - F.lit(lo)) * n_levels) / F.lit(span)
    return F.floor(lvl).cast("long")


def zvalue(
    levels: dict[str, F.Column],
    bits: int,
) -> F.Column:
    """Interleave the bit-planes of per-column level expressions into
    one Morton key: bit i of column j lands at position
    i * n_cols + j. Built as a flat sum of shift-mask terms — plain
    64-bit integer arithmetic, whole-stage-codegen-friendly, and
    restatable verbatim in ANSI SQL."""
    cols = list(levels.values())
    n = len(cols)
    if bits * n > 62:
        raise ValueError(f"z-key needs {bits * n} bits; max 62")
    acc = F.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(cols):
            acc = acc + F.shiftleft(
                F.shiftright(c, i).bitwiseAND(F.lit(1)), i * n + j
            )
    return acc


def zvalue_sql(levels: dict[str, str], bits: int) -> str:
    """The same Morton interleave as SQL text (for oracle CTEs):
    ``levels`` maps column alias -> the SQL expression of its level."""
    exprs = list(levels.values())
    n = len(exprs)
    terms = []
    for i in range(bits):
        for j, e in enumerate(exprs):
            # outer parens are load-bearing: '+' binds tighter than
            # '<<', so unparenthesized terms re-associate when joined
            terms.append(f"(((({e}) >> {i}) & 1) << {i * n + j})")
    return " + ".join(terms)


def zorder_keys(
    df: DataFrame,
    columns: list[str],
    bits: int = 8,
    bounds: dict[str, tuple[int, int]] | None = None,
    out_col: str = "zkey",
) -> DataFrame:
    """Append the Morton clustering key over ``columns`` (integer
    columns; rank-free equal-width levels). ``bounds`` inject known
    (min, max) per column; omitted bounds come from one global agg
    (2 longs per column to the driver). A writer then lays the table
    out with ``repartitionByRange(out_col)`` +
    ``sortWithinPartitions(out_col)`` and every min/max stats
    consumer prunes on ALL interleaved columns."""
    bounds = dict(bounds or {})
    missing = [c for c in columns if c not in bounds]
    if missing:
        row = df.agg(
            *[
                f
                for c in missing
                for f in (
                    F.min(F.col(c).cast("long")).alias(f"_lo_{c}"),
                    F.max(F.col(c).cast("long")).alias(f"_hi_{c}"),
                )
            ]
        ).first()
        for c in missing:
            bounds[c] = (row[f"_lo_{c}"], row[f"_hi_{c}"])
    levels = {
        c: _level_expr(c, bounds[c][0], bounds[c][1], bits) for c in columns
    }
    return df.withColumn(out_col, zvalue(levels, bits))
