"""Snapshot diff: added / removed / changed rows between two versions
of a keyed table — the primitive behind CDC backfills ("what did the
vendor's full re-drop actually change?"), incremental-publish gating
("ship only if the delta is sane"), and audit trails, when all you
have is two full snapshots and no changelog.

Spark-first shape at 100 TB:
- ONE full outer join on the key columns — both sides shuffle once,
  key-partitioned; with both snapshots bucketed on the key the
  exchange disappears entirely.
- Change detection compares a single 64-bit row fingerprint
  (xxhash64 of the compared columns) instead of N column-by-column
  predicates — column pruning still reaches the scan (only key +
  compared columns are read), and the join's output projection carries
  two longs per side, not two full payloads.
- Output is (keys..., change_type) — the delta manifest. Callers who
  need the changed PAYLOADS semi-join this manifest back against the
  new snapshot, keeping the wide-row traffic proportional to the delta,
  not the table.

The fingerprint is xxhash64(col1, col2, ...) which hashes the raw
typed values (not string renderings), so NULL vs 'NULL' and 1 vs '1'
stay distinct; hash collisions (~2^-64 per changed row) can only
misclassify a changed row as unchanged — callers needing certainty
pass compare_cols and get exact column comparison instead.

No counterpart in the reference (its upsert consumes a curated delta
feed, dynamic_upsert.py:108-152; it never has to DERIVE a delta);
SURVEY §7 extension scope.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
    exact: bool = False,
) -> DataFrame:
    """(keys..., change_type) for change_type in insert/delete/update.

    ``compare_cols`` defaults to every non-key column present in BOTH
    snapshots (schema evolution: columns only one side has are ignored
    unless explicitly requested). ``exact=True`` compares columns with
    null-safe equality instead of the 64-bit fingerprint.
    """
    if compare_cols is None:
        shared = [c for c in old.columns if c in set(new.columns)]
        compare_cols = [c for c in shared if c not in set(keys)]

    def _sided(df: DataFrame, side: str) -> DataFrame:
        cols = [F.col(k) for k in keys]
        if not compare_cols:
            # pure link/membership table (every shared column is a key):
            # there is nothing to compare, so classification is
            # presence-only — insert/delete, never update. Without this
            # guard the fingerprint mode would call xxhash64() with zero
            # arguments, which fails Spark analysis.
            payload = []
        elif exact:
            payload = [
                F.col(c).alias(f"{side}_{c}") for c in compare_cols
            ]
        else:
            # xxhash64 SKIPS null inputs (the accumulator is unchanged),
            # so hashing bare columns would fingerprint (NULL, 'x') and
            # ('x', NULL) identically; interleaving each column's
            # is-null flag (a never-null boolean) breaks that symmetry.
            parts: list = []
            for c in compare_cols:
                parts.append(F.col(c))
                parts.append(F.col(c).isNull())
            payload = [F.xxhash64(*parts).alias(f"{side}_fp")]
        return df.select(*cols, *payload, F.lit(1).alias(f"{side}_present"))

    o = _sided(old, "old")
    n = _sided(new, "new")
    j = o.join(n, keys, "full_outer")

    if not compare_cols:
        changed = F.lit(False)
    elif exact:
        changed = F.lit(False)
        for c in compare_cols:
            changed = changed | ~F.col(f"old_{c}").eqNullSafe(
                F.col(f"new_{c}")
            )
    else:
        changed = F.col("old_fp") != F.col("new_fp")

    change = (
        F.when(F.col("old_present").isNull(), F.lit("insert"))
        .when(F.col("new_present").isNull(), F.lit("delete"))
        .when(changed, F.lit("update"))
    )
    return (
        j.withColumn("change_type", change)
        .filter(F.col("change_type").isNotNull())
        .select(*keys, "change_type")
    )


def changed_payloads(
    new: DataFrame,
    manifest: DataFrame,
    keys: list[str],
    change_types: tuple[str, ...] = ("insert", "update"),
) -> DataFrame:
    """Wide rows of the NEW snapshot for keys the diff manifest marks
    as changed — the companion the module docstring promises: callers
    who need payloads semi-join the manifest back, so wide-row traffic
    stays proportional to the DELTA, never the table.

    Plan shape (asserted in tests/test_plans.py): the manifest is
    filtered to the requested change types BEFORE the join, and the
    join is left_semi on the keys — the wide snapshot is probed by
    (typically broadcast) keys only, no wide column ever enters a
    shuffle for unchanged rows, and column pruning on the snapshot
    side is unaffected by the manifest's schema.
    """
    m = manifest.filter(F.col("change_type").isin(*change_types)).select(
        *keys
    )
    return new.join(m, keys, "left_semi")
