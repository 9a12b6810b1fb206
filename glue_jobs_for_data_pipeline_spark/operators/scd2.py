"""SCD Type-2 dimension upsert (SURVEY §2.9 M1/M4; reference dynamic_upsert.py:110-152).

Reference pipeline (one Redshift transaction, generated from column dicts):
  (a) stage ``SELECT DISTINCT <cols>`` of the source into dim_<t>_staging
      with LoadDate = current_date            (dynamic_upsert.py:120-122)
  (b) expire: ``UPDATE dim SET EndDate = current_date - INTERVAL '1 day'
      WHERE <key> IN (SELECT <key> FROM source) AND EndDate = '9999-12-31'``
                                              (dynamic_upsert.py:128-131)
  (c) insert every staged row as a new current version with
      StartDate = LoadDate, EndDate = '9999-12-31'
                                              (dynamic_upsert.py:137-139)

This is the NAIVE variant — no change detection: every run re-versions
every key present in the source, changed or not. ``mode="reference"``
reproduces that exactly; ``mode="delta"`` is the scale extension that
versions only genuinely changed rows (left-anti on the compared
columns), cutting dim growth from O(runs x source) to O(changes).

Spark realization: the three statements collapse into one pure
DataFrame -> DataFrame expression with a single terminal write — the
transaction bracket (M5) becomes write-last atomicity, and Spark's lazy
evaluation removes the physical staging table (S4/S7) entirely.

Scale posture: the source-key set is broadcast into the expire step
(dims are small next to facts; for a billion-row dim swap the broadcast
for a shuffle semi-join by passing broadcast_keys=False). Surrogate-key
assignment offers ``key_mode="hash"`` (xxhash64 — fully parallel,
deterministic, non-contiguous) for huge dims, and
``key_mode="rownum"`` (max+row_number — contiguous like the
reference's IDENTITY, single-partition window, fine for dim-sized data).
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..schemas import CURRENT_ROW_SENTINEL, SCD2_END, SCD2_START
from ..functions.datefns import run_date_col


def _sentinel() -> F.Column:
    return F.lit(CURRENT_ROW_SENTINEL).cast("date")


def stage_source(
    source: DataFrame,
    columns: Sequence[str],
    run_date: dt.date | str | None = None,
) -> DataFrame:
    """(a) ``SELECT DISTINCT <cols>`` + LoadDate audit column.

    Reference: dynamic_upsert.py:120-122 with the staging DDL's
    ``LoadDate DATE DEFAULT current_date`` (dynamic_upsert.py:22-26);
    run_date is injectable for determinism (F10).
    """
    return source.select(*columns).distinct().withColumn(
        "LoadDate", run_date_col(run_date)
    )


def expire_current_rows(
    dim: DataFrame,
    source_keys: DataFrame,
    business_key: str,
    run_date: dt.date | str | None = None,
    broadcast_keys: bool = True,
) -> DataFrame:
    """(b)/M4: close out current rows whose key re-appears in the source.

    ``UPDATE ... SET EndDate = run_date - 1 WHERE key IN (source) AND
    EndDate = '9999-12-31'`` (dynamic_upsert.py:128-131). Spark has no
    in-place UPDATE, so: mark keys via a (broadcast) join, rewrite
    EndDate with when/otherwise, and let the caller overwrite the dim.
    Keys present in dim but absent from source are NOT touched (the
    IN-subquery semantics, P7/J3).
    """
    keys = source_keys.select(business_key).distinct().withColumn(
        "_in_source", F.lit(True)
    )
    if broadcast_keys:
        keys = F.broadcast(keys)
    is_current = F.col(SCD2_END) == _sentinel()
    return (
        dim.join(keys, on=business_key, how="left")
        .withColumn(
            SCD2_END,
            F.when(
                is_current & F.col("_in_source").isNotNull(),
                F.date_sub(run_date_col(run_date), 1),
            ).otherwise(F.col(SCD2_END)),
        )
        .drop("_in_source")
    )


def assign_surrogate_keys(
    staged: DataFrame,
    dim: DataFrame | None,
    business_key: str,
    surrogate_key: str,
    key_mode: str = "rownum",
) -> DataFrame:
    """Surrogate keys for new versions (the IDENTITY(1,1) analog,
    dynamic_upsert.py:17-19).

    rownum: max(existing)+row_number over business-key order —
    contiguous + deterministic (oracle-reproducible). Size-gated since
    r11: below `spark.graft.sk.kernelMinBytes` (default 256 MiB of
    staged batch, by optimizer plan statistics) the row_number is the
    classic single-partition ordered window — bounded by the gate's own
    measurement, so the funnel task is small by construction; above it,
    the distributed exact-rank kernel (operators/rank.py) computes the
    identical ranks with no single-task sort, so a billion-row dim load
    never collapses onto one executor. Both paths produce the same key
    values — ROW_NUMBER() OVER (ORDER BY business_key) — because keys
    are unique at the staged grain (the reference's source contract;
    with duplicate keys the old window was tie-nondeterministic
    anyway), so the gate can never cause value drift, only plan choice.
    Plan-stats overestimation (cached/joined inputs) errs toward the
    kernel — the scale-safe direction.
    hash: xxhash64(business_key, StartDate) — join-free and
    non-contiguous; still available where contiguity is not required.
    """
    if key_mode == "hash":
        # staged carries the run date as LoadDate at this point (it becomes
        # StartDate downstream, dynamic_upsert.py:137-139 column-positional).
        # KEY-GRAIN writers (scd1_overwrite / scd3_update) stage no
        # version date at all — their rows are one-per-key, so the
        # business key alone is the hash input.
        if "LoadDate" in staged.columns:
            key = F.xxhash64(F.col(business_key), F.col("LoadDate"))
        elif SCD2_START in staged.columns:
            key = F.xxhash64(F.col(business_key), F.col(SCD2_START))
        else:
            key = F.xxhash64(F.col(business_key))
        return staged.withColumn(surrogate_key, key)
    min_bytes = int(
        staged.sparkSession.conf.get(
            "spark.graft.sk.kernelMinBytes", str(256 << 20)
        )
    )
    plan_bytes = int(
        staged._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
    )
    if plan_bytes <= min_bytes:
        ranked = staged.withColumn(
            "__sk_rn",
            F.row_number().over(Window.orderBy(business_key)).cast("long"),
        )
    else:
        from .rank import distributed_row_number

        ranked, _total = distributed_row_number(
            staged, [(business_key, True)], out_col="__sk_rn"
        )
    base = F.lit(0)
    if dim is not None:
        max_key = dim.agg(
            F.coalesce(F.max(surrogate_key), F.lit(0)).alias("_max_key")
        )
        ranked = ranked.crossJoin(F.broadcast(max_key))
        base = F.col("_max_key")
    return (
        ranked.withColumn(surrogate_key, (base + F.col("__sk_rn")).cast("long"))
        .drop("_max_key", "__sk_rn")
    )


def scd2_upsert(
    dim: DataFrame | None,
    source: DataFrame,
    business_key: str,
    columns: Sequence[str],
    surrogate_key: str,
    run_date: dt.date | str | None = None,
    mode: str = "reference",
    key_mode: str = "rownum",
    broadcast_keys: bool = True,
) -> DataFrame:
    """M1: full SCD-2 upsert — returns the new dim table contents.

    dim may be None/empty for the initial load. Output columns:
    [surrogate_key, *columns, StartDate, EndDate].

    mode="reference": naive semantics — every source key is expired and
    re-versioned each run (dynamic_upsert.py:128-139), byte-for-byte the
    reference behavior.
    mode="delta": expire/re-version only rows whose compared columns
    changed (left-anti join of staged vs current dim rows) — the scale
    extension (SURVEY §7.4).
    """
    out_cols = [surrogate_key, *columns, SCD2_START, SCD2_END]
    staged = stage_source(source, columns, run_date)

    if mode == "delta" and dim is not None:
        current = dim.filter(F.col(SCD2_END) == _sentinel()).select(*columns)
        staged = staged.join(current, on=list(columns), how="left_anti")

    if dim is None:
        new_rows = (
            assign_surrogate_keys(staged, None, business_key, surrogate_key, key_mode)
            .withColumn(SCD2_START, F.col("LoadDate"))
            .withColumn(SCD2_END, _sentinel())
        )
        return new_rows.select(*out_cols)

    expired = expire_current_rows(
        dim, staged, business_key, run_date, broadcast_keys
    ).select(*out_cols)
    new_rows = (
        assign_surrogate_keys(staged, dim, business_key, surrogate_key, key_mode)
        # column-positional LoadDate -> StartDate (dynamic_upsert.py:137-139)
        .withColumn(SCD2_START, F.col("LoadDate"))
        .withColumn(SCD2_END, _sentinel())
        .select(*out_cols)
    )
    return expired.unionByName(new_rows)


def infer_late_members(
    dim: DataFrame,
    fact_keys: DataFrame,
    business_key: str,
    defaults: dict[str, object],
    flag_col: str = "is_inferred",
) -> DataFrame:
    """Late-arriving dimension handling: business keys the FACT feed
    references before the dim feed has delivered them get INFERRED
    placeholder members, so fact population never drops or orphans a
    row — the standard Kimball pattern the reference's star ETL lacks
    (its fact join silently inner-joins orphans away,
    populate_fact.py:89-136). When the real dim row finally arrives,
    the normal SCD-2 upsert expires the placeholder like any changed
    row — no special repair path.

    ``defaults`` fills the placeholder's attribute columns (e.g.
    'UNKNOWN'); dim columns not listed come out NULL. All existing
    members carry ``flag_col`` = false, inferred ones true, so
    downstream can report/repair inferred counts.

    Scale shape: distinct fact keys (map-side-combined — the fact is
    reduced to its key set before anything joins), one left_anti
    against the dim's key projection (dim keys broadcast when small,
    AQE decides), one unionByName. The fact's payload columns never
    move; the dim is scanned once.
    """
    missing = (
        fact_keys.select(F.col(business_key))
        .distinct()
        .join(dim.select(business_key), business_key, "left_anti")
    )
    inferred = missing.select(
        F.col(business_key),
        *[F.lit(v).alias(c) for c, v in defaults.items()],
        F.lit(True).alias(flag_col),
    )
    if flag_col in dim.columns:
        # a dim that already persisted the flag keeps it: a placeholder
        # from an earlier run that is STILL unrepaired must stay
        # flagged, or the repair report silently loses it forever
        existing = dim.withColumn(
            flag_col, F.coalesce(F.col(flag_col), F.lit(False))
        )
    else:
        existing = dim.withColumn(flag_col, F.lit(False))
    return existing.unionByName(inferred, allowMissingColumns=True)


def _stage_key_grain(
    source: DataFrame, business_key: str, columns: Sequence[str]
) -> DataFrame:
    """Stage a batch for the KEY-GRAIN writers (type-1 / type-3):
    distinct rows, then collapse to exactly one row per business key.
    A feed can legitimately carry two different updates for the same
    key in one batch; without this collapse the dim join fans out and
    the one-row-per-key output contract silently breaks (duplicate
    surrogates, double-counting fact joins). Resolution is
    deterministic — the lexicographically greatest attribute tuple
    wins (struct max over the columns in declared order) — and costs
    one map-side-combined aggregate keyed the same as the join that
    follows."""
    attrs = [c for c in columns if c != business_key]
    if not attrs:  # key-only feed: distinct IS the key grain
        return source.select(business_key).distinct()
    return (
        source.select(*columns)
        .distinct()
        .groupBy(business_key)
        .agg(F.max(F.struct(*[F.col(c) for c in attrs])).alias("_p"))
        .select(business_key, *[F.col("_p")[c].alias(c) for c in attrs])
    )


def _matched_batch(
    staged: DataFrame,
    business_key: str,
    attrs: Sequence[str],
    broadcast_batch: bool,
):
    """The staged batch shaped for the dim left join: key, a match
    marker, and the new attribute values under collision-free names."""
    b = staged.select(
        business_key,
        F.lit(True).alias("_matched"),
        *[F.col(c).alias(f"_new_{c}") for c in attrs],
    )
    return F.broadcast(b) if broadcast_batch else b


def scd1_overwrite(
    dim: DataFrame | None,
    source: DataFrame,
    business_key: str,
    columns: Sequence[str],
    surrogate_key: str,
    key_mode: str = "rownum",
    broadcast_batch: bool = False,
) -> DataFrame:
    """SCD Type-1: overwrite in place, no history — the taxonomy slot
    BELOW the reference's type-2 pipeline (dynamic_upsert.py versions
    every change; type-1 is the contract for corrections/typos where
    history is noise). Matched keys take the batch's attribute values
    but KEEP their surrogate key — downstream facts keep joining;
    unmatched dim rows pass through untouched; unseen keys insert with
    fresh surrogates (same assigner as SCD-2). Output grain: exactly
    one row per business key.

    Scale shape: one left join of the dim against the staged batch on
    the business key, one anti-join for inserts, one union. AQE decides
    the join strategy by default (r11: the default flipped from forced
    broadcast — F.broadcast bypasses autoBroadcastJoinThreshold, and an
    SF-proportional batch would mandate a driver-side hash-relation
    build at large SF, the x_validate_fk_cascade hazard). Pass
    broadcast_batch=True only for KNOWN-SMALL incremental batches. No
    window over data-proportional grain in hash key_mode.
    """
    attrs = [c for c in columns if c != business_key]
    staged = _stage_key_grain(source, business_key, columns)
    if dim is None:
        return assign_surrogate_keys(
            staged, None, business_key, surrogate_key, key_mode
        ).select(surrogate_key, *columns)

    b = _matched_batch(staged, business_key, attrs, broadcast_batch)
    updated = dim.join(b, on=business_key, how="left").select(
        surrogate_key,
        business_key,
        *[
            F.when(F.col("_matched").isNotNull(), F.col(f"_new_{c}"))
            .otherwise(F.col(c))
            .alias(c)
            for c in attrs
        ],
    )
    inserts = assign_surrogate_keys(
        staged.join(dim.select(business_key), business_key, "left_anti"),
        dim,
        business_key,
        surrogate_key,
        key_mode,
    ).select(surrogate_key, business_key, *attrs)
    return updated.unionByName(inserts)


def scd3_update(
    dim: DataFrame,
    source: DataFrame,
    business_key: str,
    columns: Sequence[str],
    tracked: Sequence[str],
    surrogate_key: str,
    run_date: dt.date | str | None = None,
    key_mode: str = "rownum",
    broadcast_batch: bool = False,
) -> DataFrame:
    """SCD Type-3: previous-value columns — the taxonomy slot between
    type-1 (no history) and type-2 (full history): each ``tracked``
    column keeps exactly ONE prior value in ``Prev<col>`` plus the date
    it changed in ``<col>ChangeDate``, while untracked attributes
    overwrite type-1 style (the standard mixed-SCD3 contract for
    'current vs previous territory/segment' reporting). A dim that has
    never been through this operator (no Prev columns yet) is accepted:
    missing Prev/ChangeDate columns start as NULL.

    Per matched key: tracked column's new value differs (null-safe) ->
    Prev<col> = old value, <col>ChangeDate = run_date, value
    overwritten; unchanged -> value, Prev, and ChangeDate all carry
    forward. Inserts get NULL Prev/ChangeDate. Output grain: one row
    per business key (like type-1 — no row versioning).

    Scale shape identical to scd1_overwrite: one left join (strategy
    AQE-decided by default; broadcast_batch=True only for known-small
    batches) + one anti-join + union; change detection is a null-safe
    column comparison inside the join projection, never a shuffle of
    its own.
    """
    attrs = [c for c in columns if c != business_key]
    staged = _stage_key_grain(source, business_key, columns)
    b = _matched_batch(staged, business_key, attrs, broadcast_batch)

    def _existing(col: str, like: str) -> F.Column:
        if col in dim.columns:
            return F.col(col)
        return F.lit(None).cast(dim.schema[like].dataType)

    matched = F.col("_matched").isNotNull()
    out: list[F.Column] = [F.col(surrogate_key), F.col(business_key)]
    for c in attrs:
        new_val = F.when(matched, F.col(f"_new_{c}")).otherwise(F.col(c))
        out.append(new_val.alias(c))
    for c in tracked:
        changed = matched & ~F.col(f"_new_{c}").eqNullSafe(F.col(c))
        out.append(
            F.when(changed, F.col(c))
            .otherwise(_existing(f"Prev{c}", c))
            .alias(f"Prev{c}")
        )
        out.append(
            F.when(changed, run_date_col(run_date))
            .otherwise(
                _existing(f"{c}ChangeDate", c).cast("date")
                if f"{c}ChangeDate" in dim.columns
                else F.lit(None).cast("date")
            )
            .alias(f"{c}ChangeDate")
        )
    updated = dim.join(b, on=business_key, how="left").select(*out)
    inserts = assign_surrogate_keys(
        staged.join(dim.select(business_key), business_key, "left_anti"),
        dim,
        business_key,
        surrogate_key,
        key_mode,
    ).select(
        F.col(surrogate_key),
        F.col(business_key),
        *[F.col(c) for c in attrs],
        *[
            col
            for c in tracked
            for col in (
                F.lit(None).cast(dim.schema[c].dataType).alias(f"Prev{c}"),
                F.lit(None).cast("date").alias(f"{c}ChangeDate"),
            )
        ],
    )
    return updated.unionByName(inserts)
