"""Exactly-once streaming sink into the transactional catalog (r17).

``foreachBatch`` is at-least-once: a crash between the sink's side
effect and the streaming checkpoint commit replays the micro-batch on
restart. ``scd2_stream_apply`` (events.py) closes that for ONE
pointer-swap table; this module closes it for the CATALOG — the
streaming analog of the reference's batch transaction bracket
(dynamic_upsert.py:108,151 BEGIN/COMMIT): each micro-batch lands as ONE
atomic manifest commit that covers BOTH the appended data and a
recorded batch id, so a replayed batch observes its own id already
committed and becomes a no-op. This is exactly Delta's ``txn``
(appId, version) action / Iceberg's snapshot summary dedup.

Scale shape: the data lands through ``CatalogTransaction.append``
(stage_version_append — base part files hard-link into the new
version, only the batch's rows are written), so a micro-batch commit
costs O(batch) + O(file count) metadata, never a table rewrite. The
commit ledger is one tiny two-column table read once per batch —
metadata-sized by construction (one row per micro-batch), the same
object every lakehouse sink consults before committing.

Concurrency: the commit is CAS-guarded by the transaction snapshot;
a racing writer on the same branch (another stream, a batch job)
makes this batch's commit lose and RETRY from a fresh snapshot —
including a fresh replay check, so even a rival instance of the SAME
stream (zombie executor after failover) cannot double-append.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame

from ..sources.txn import Catalog, ConcurrentCommitError

_LEDGER_SUFFIX = "__commits"
_COMMIT_RETRIES = 16


def ledger_table(name: str) -> str:
    return name + _LEDGER_SUFFIX


def committed_batch_ids(
    cat: Catalog, spark, name: str, app_id: str, branch: str = "main"
) -> set[int]:
    """Batch ids already committed for (table, app_id) — read from the
    CURRENT committed ledger (metadata-sized: one row per batch)."""
    try:
        ledger = cat.read(spark, ledger_table(name), branch)
    except FileNotFoundError:
        return set()
    return {
        r["batch_id"]
        for r in ledger.filter(ledger["app_id"] == app_id).collect()
    }


def exactly_once_batch_sink(
    cat: Catalog, name: str, app_id: str, branch: str = "main"
):
    """Build the foreachBatch function: append the micro-batch and
    record its id in ONE manifest commit; replays are no-ops.

    ``app_id`` namespaces the ledger so several independent streams
    can feed the same table without confusing each other's batch-id
    sequences (Delta txn appId semantics)."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return  # an empty replay is equally a no-op
        spark = batch_df.sparkSession
        last: ConcurrentCommitError | None = None
        for attempt in range(_COMMIT_RETRIES):
            try:
                with cat.transaction(branch=branch) as t:
                    try:
                        ledger = t.read_committed(spark, ledger_table(name))
                        done = {
                            r["batch_id"]
                            for r in ledger.filter(
                                ledger["app_id"] == app_id
                            ).collect()
                        }
                    except FileNotFoundError:
                        ledger, done = None, set()
                    if batch_id in done:
                        return  # replayed batch: exit stages nothing,
                        # so the empty bracket publishes nothing
                    t.append(batch_df, name)
                    entry = spark.createDataFrame(
                        [(app_id, int(batch_id))],
                        "app_id string, batch_id long",
                    )
                    t.overwrite(
                        ledger.unionByName(entry) if ledger is not None
                        else entry,
                        ledger_table(name),
                    )
                return
            except ConcurrentCommitError as exc:
                last = exc  # snapshot moved: re-check the ledger, retry
                time.sleep(0.02 * (attempt + 1))
        raise last  # type: ignore[misc]

    return sink


def stream_append_exactly_once(
    source_stream: DataFrame,
    cat: Catalog,
    name: str,
    checkpoint_dir: str,
    app_id: str = "stream",
    branch: str = "main",
) -> None:
    """Drain a stream into catalog table ``name`` with exactly-once
    commits: trigger(availableNow) + checkpointed foreachBatch, each
    micro-batch published through one atomic manifest swap carrying
    (data append, ledger row) together. Restarting after ANY crash —
    before, during, or after a batch's commit — converges to the same
    committed table, proven by replay injection in
    tests/test_exactly_once.py."""
    q = (
        source_stream.writeStream.foreachBatch(
            exactly_once_batch_sink(cat, name, app_id, branch)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
