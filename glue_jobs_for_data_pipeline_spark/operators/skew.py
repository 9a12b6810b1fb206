"""Skew-handling primitives for hot-key aggregations and joins.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime; these explicit primitives cover the cases AQE can't: hot-key
GROUP BY (where one reducer gets the whole key) and broadcast-exempt
joins against skewed build sides.

The two-phase salted aggregation is result-identical to the direct
aggregation (the salt cancels in phase 2), which makes it
oracle-checkable against plain GROUP BY SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_count(
    df: DataFrame,
    keys: list[str],
    salt_from: str,
    n_salts: int = 16,
) -> DataFrame:
    """GROUP BY count over hot keys via two-phase salting.

    Phase 1 groups by (keys, salt) — each hot key spreads over n_salts
    reducers; phase 2 re-aggregates the n_salts partial counts per key
    (tiny). ``salt_from`` is any high-cardinality column; the salt is
    deterministic (xxhash64 mod n) so plans replay identically.
    """
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(salt_from)), F.lit(n_salts))
    )
    phase1 = salted.groupBy(*keys, "_salt").agg(F.count(F.lit(1)).alias("_partial"))
    return phase1.groupBy(*keys).agg(F.sum("_partial").alias("cnt"))


def salted_sum(
    df: DataFrame,
    keys: list[str],
    value_col: F.Column,
    salt_from: str,
    n_salts: int = 16,
    alias: str = "total",
) -> DataFrame:
    """Two-phase salted SUM (use an exact-typed value column — decimal or
    integer — so the re-aggregation is order-insensitive)."""
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(salt_from)), F.lit(n_salts))
    )
    phase1 = salted.groupBy(*keys, "_salt").agg(F.sum(value_col).alias("_partial"))
    return phase1.groupBy(*keys).agg(F.sum("_partial").alias(alias))


def replicated_skew_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 16,
) -> DataFrame:
    """Inner equi-join where ``big`` has hot keys and ``small`` is too big
    to broadcast whole but small per key: salt the big side, replicate the
    small side n_salts times, join on (key, salt). Every salted shard of a
    hot key meets its matching small rows; result equals the plain join.

    The salt hashes ALL of the big side's columns, so it is stable under
    task retry / recompute (monotonically_increasing_id is not — its value
    depends on partition layout). Fully duplicate rows share a salt, which
    only costs spread when one identical row dominates a key.
    """
    big_salted = big.withColumn(
        "_salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(n_salts)),
    )
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("_salt")
    small_rep = small.select("*", salts)
    return big_salted.join(small_rep, [key, "_salt"], "inner").drop("_salt")
