"""Pre-flight join planning: inspect key statistics, pick a strategy.

Spark's own CBO + AQE already re-plan joins at runtime (broadcast
conversion, skew-split) — at 100 TB those stay on. What they cannot do
is tell the PIPELINE AUTHOR, before a multi-hour run, "this join will
shuffle 40 TB against a key where one value owns 9% of the rows; salt
it or broadcast the dim". These helpers make that pre-flight check a
first-class operator: exact key statistics (one map-side-combined
aggregate per side), a deterministic strategy decision, and an
``auto_join`` that applies it.

Exact counts keep the report oracle-checkable and are what the sf-scale
fixtures need; a 100 TB deployment points ``join_stats`` at catalog
statistics or a hash-sampled scan instead — the decision logic is
unchanged. The decision thresholds are explicit parameters, not hidden
config, so the report IS the documentation of why a strategy was
chosen.

No counterpart in the reference (its joins are Redshift-side SQL,
populate_fact.py:74-146, where the Redshift planner is a black box);
this is engine scope.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .skew import replicated_skew_join

#: Strategy labels (also the values in the report's `strategy` column).
BROADCAST = "broadcast"
SORT_MERGE = "sort_merge"
SALTED = "salted_sort_merge"


def join_stats(left: DataFrame, right: DataFrame, key: str) -> dict:
    """Exact pre-flight statistics for ``left JOIN right USING (key)``.

    Two aggregate jobs (each one map-side-combined pass; the left-side
    key histogram reduces to per-key counts before the scalar rollup),
    constant-size result to the driver:

    - ``l_rows``, ``l_keys``, ``l_max_key_rows``: probe-side volume,
      key cardinality, and the heaviest key's multiplicity.
    - ``r_rows``: build-side volume.
    - ``skew_ratio``: max-key rows / mean rows per key — >> 1 means one
      reducer inherits a disproportionate share of the shuffle.
    """
    kc = left.groupBy(key).agg(F.count(F.lit(1)).alias("n"))
    l = kc.agg(
        F.sum("n").cast("long").alias("l_rows"),
        F.count(F.lit(1)).cast("long").alias("l_keys"),
        F.max("n").cast("long").alias("l_max_key_rows"),
    ).collect()[0]
    r_rows = right.count()
    skew = (
        float(l["l_max_key_rows"]) * float(l["l_keys"]) / float(l["l_rows"])
        if l["l_rows"]
        else 0.0
    )
    return {
        "l_rows": l["l_rows"],
        "l_keys": l["l_keys"],
        "l_max_key_rows": l["l_max_key_rows"],
        "r_rows": r_rows,
        "skew_ratio": skew,
    }


def recommend(
    stats: dict,
    broadcast_max_rows: int = 1_000_000,
    skew_threshold: float = 4.0,
) -> str:
    """Deterministic strategy decision from pre-flight stats.

    Broadcast beats everything when the build side fits an executor
    (row-count proxy here; byte budgets at deployment); otherwise a
    skewed probe side wants salting (replicate the build side over the
    salt space) before a plain shuffled sort-merge join.
    """
    if stats["r_rows"] <= broadcast_max_rows:
        return BROADCAST
    if stats["skew_ratio"] > skew_threshold:
        return SALTED
    return SORT_MERGE


def auto_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    broadcast_max_rows: int = 1_000_000,
    skew_threshold: float = 4.0,
    n_salts: int = 16,
) -> DataFrame:
    """Inner equi-join with the pre-flight-chosen strategy applied.

    All three strategies are result-identical to the plain join (salting
    cancels; broadcast is a physical hint) — tests/test_skew.py-style
    equivalence plus plan-shape assertions live in
    tests/test_mining_pack.py.
    """
    strategy = recommend(
        join_stats(left, right, key), broadcast_max_rows, skew_threshold
    )
    if strategy == BROADCAST:
        return left.join(F.broadcast(right), key, "inner")
    if strategy == SALTED:
        return replicated_skew_join(left, right, key, n_salts=n_salts)
    return left.join(right, key, "inner")
