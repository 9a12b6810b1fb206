"""localCheckpoint lifecycle management.

``DataFrame.localCheckpoint`` persists the materialized RDD at
MEMORY_AND_DISK and truncates lineage — the right tool for iterative
operators (connected components, PageRank, k-core, coreness) whose
plans would otherwise grow per round. But PySpark exposes no way to
free those blocks: they linger in the block manager until the JVM
ContextCleaner happens to GC them, and a long session running many
checkpointing queries (the 46-query x 4-pass bench; the 246-query
oracle sweep) accumulates dozens of dead edge-list copies. That
storage-memory pressure was the r10 bench regression on
x_graph_triangles / x_dedup_cc_clusters — neither query changed; the
suite around them grew.

Two lifetimes, two helpers:

- ``checkpoint(df, eager=...)`` — checkpoint and REGISTER the block
  for release at the next ``release_checkpoints()`` (wired into
  ``dedup.release_caches``, which bench/oracle sweeps call after
  materializing each query). For checkpoints the RETURNED frame still
  reads (triangle adjacency, the final label table).
- ``free(df)`` — unpersist a superseded checkpoint IMMEDIATELY (loop
  intermediates: round N's labels once round N+1 is materialized).

CRITICAL CONTRACT: a checkpointed RDD's lineage is gone — unpersisting
destroys the data unrecoverably (unlike cache eviction, there is no
recompute). Only free/release a frame once nothing that will ever be
evaluated again reads it. Query results must be fully materialized
(collect / noop write) BEFORE release_checkpoints() runs — the same
contract dedup's cache pool already imposes.

The RDD handle comes from the checkpointed frame's LogicalRDD leaf
(``queryExecution().analyzed().rdd()``); accessor failures degrade to
the old behavior (blocks live until JVM GC) rather than erroring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_POOL: list = []  # JavaRDD handles of registered checkpoints


def _jrdd(df: DataFrame):
    """The checkpointed frame's underlying JavaRDD, or None."""
    try:
        return df._jdf.queryExecution().analyzed().rdd()
    except Exception:  # noqa: BLE001 — internal accessor, best-effort
        return None


def checkpoint(df: DataFrame, eager: bool = True) -> DataFrame:
    """localCheckpoint + register the block for release_checkpoints()."""
    ck = df.localCheckpoint(eager=eager)
    register(ck)
    return ck


def register(df: DataFrame) -> None:
    """Register an ALREADY-checkpointed frame for release_checkpoints()
    — for loop finals that were checkpointed bare so intermediates
    could be freed individually."""
    h = _jrdd(df)
    if h is not None:
        _POOL.append(h)


def free(df: DataFrame) -> None:
    """Unpersist a superseded checkpoint NOW (see module contract)."""
    h = _jrdd(df)
    if h is not None:
        try:
            h.unpersist(False)
        except Exception:  # noqa: BLE001
            pass


def release_checkpoints() -> None:
    """Unpersist every registered checkpoint (called from
    dedup.release_caches so existing bench/sweep call sites clean up
    both pools)."""
    while _POOL:
        h = _POOL.pop()
        try:
            h.unpersist(False)
        except Exception:  # noqa: BLE001
            pass
