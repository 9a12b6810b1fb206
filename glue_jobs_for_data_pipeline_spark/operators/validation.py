"""Data-quality / validation operators (SURVEY §2.10, V1-V4).

Reference semantics (validate_data.py:36-87): after each CSV load, run a
NOT-NULL check per column and a PK-uniqueness check; raise (aborting the
workflow) on any violation.

Physical divergence, same answers: the reference issues N+1 sequential
full scans per table (one COUNT(*) per column at validate_data.py:68-76
plus one GROUP BY at :78-86). Here the null checks collapse into ONE
pass of conditional aggregation — at 100 TB that is the difference
between N+1 table scans and a single scan with a tiny agg, and Catalyst
still prunes the scan to exactly the checked columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class ValidationError(Exception):
    """Raised on data-quality violation; aborts the pipeline (V4).

    Mirrors the reference raising inside validate_data (validate_data.py:74,85),
    which fails the Glue job and halts the workflow.
    """


def null_counts(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """V1: per-column NULL counts in one scan.

    Reference: one ``SELECT COUNT(*) FROM t WHERE c IS NULL`` per column
    (validate_data.py:68-76). Single-pass conditional aggregation gives
    identical counts with one scan.
    """
    cols = columns or df.columns
    return df.agg(
        *[F.count(F.when(F.col(c).isNull(), F.lit(1))).alias(c) for c in cols]
    )


def pk_duplicates(df: DataFrame, pk: str | list[str]) -> DataFrame:
    """V2: business keys that appear more than once.

    Reference: ``SELECT pk, COUNT(*) FROM t GROUP BY pk HAVING COUNT(*) > 1``
    (validate_data.py:78-86; pk = first column of the table dict,
    validate_data.py:63). Generalized to composite keys for tables whose
    real grain is multi-column (e.g. orderdetails = (OrderID, ProductID),
    FIXTURES.md §A1). Hash aggregation with map-side partial agg;
    shuffles only the (already reduced) per-key counts.
    """
    keys = [pk] if isinstance(pk, str) else list(pk)
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("dup_count"))
        .filter(F.col("dup_count") > 1)
    )


def validation_report(df: DataFrame, table: str, pk: str | list[str]) -> DataFrame:
    """V4 (reporting form): one row per check with its violation count.

    Columns: table_name, check_name, violation_count — the relational
    rendering of the reference's raise-on-violation gate so the result is
    oracle-checkable as a query.
    """
    nulls = null_counts(df)
    # melt the single row of per-column null counts into (check, count) rows
    stack_expr = ", ".join(f"'not_null_{c}', `{c}`" for c in nulls.columns)
    null_rows = nulls.selectExpr(
        f"stack({len(nulls.columns)}, {stack_expr}) AS (check_name, violation_count)"
    )
    pk_label = pk if isinstance(pk, str) else "_".join(pk)
    dup_rows = pk_duplicates(df, pk).agg(
        F.lit(f"pk_unique_{pk_label}").alias("check_name"),
        F.count(F.lit(1)).cast("long").alias("violation_count"),
    )
    return (
        null_rows.unionByName(dup_rows)
        .select(
            F.lit(table).alias("table_name"),
            "check_name",
            F.col("violation_count").cast("long").alias("violation_count"),
        )
    )


def validate_or_raise(df: DataFrame, table: str, pk: str | list[str]) -> None:
    """V4: the load-then-validate gate (validate_data.py:148-171).

    Single action: collects the (tiny) report and raises ValidationError
    listing every failed check, aborting the pipeline like the reference.
    """
    failed = [
        (r["check_name"], r["violation_count"])
        for r in validation_report(df, table, pk).collect()
        if r["violation_count"] > 0
    ]
    if failed:
        detail = ", ".join(f"{name}={n}" for name, n in failed)
        raise ValidationError(f"validation failed for {table}: {detail}")


def range_checksums(
    df: DataFrame,
    key_col: str,
    cols: list[str],
    bucket_width: int = 1000,
) -> DataFrame:
    """Anti-entropy range checksums: an order-independent row fold per
    key-range bucket — the Merkle-ish tier that LOCALIZES a replica
    mismatch instead of just detecting it (x_validate_table_checksum is
    the whole-table root; this is one level of fan-out below it).

    Per bucket (key // bucket_width): row count, bit-XOR of a 60-bit
    md5-derived row hash, and the exact decimal row-hash sum reduced
    mod the Mersenne prime 2^61-1 — xor catches any single-row change,
    the mod-sum catches xor's blind spot (an even number of identical
    changes), and the count catches pure cardinality drift. Two
    replicas compare this table; only buckets whose triple differs need
    a row-level diff (snapshot_diff restricted to that key range), so
    repair traffic is proportional to the damage, never the table.

    ``cols`` are canonicalized with '|' separators via F.concat (NULL
    propagates — cast-to-string columns here are non-null by schema;
    a production profile canonicalizes nullable/float columns first,
    the same discipline the whole-table gate documents). One
    map-side-combined aggregation; the shuffle carries one row per
    bucket.
    """
    parts: list = []
    for i, c in enumerate(cols):
        if i:
            parts.append(F.lit("|"))
        parts.append(F.col(c).cast("string"))
    h = F.conv(F.substring(F.md5(F.concat(*parts)), 1, 15), 16, 10).cast(
        "long"
    )
    return (
        df.select(
            F.floor(F.col(key_col) / F.lit(bucket_width))
            .cast("long")
            .alias("bucket"),
            h.alias("h"),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.bit_xor("h").cast("long").alias("cksum_xor"),
            (
                F.sum(F.col("h").cast("decimal(32,0)"))
                % F.lit(2305843009213693951).cast("decimal(32,0)")
            )
            .cast("long")
            .alias("cksum_sum_mod"),
        )
    )


def constraint_quarantine(
    df: DataFrame, constraints: dict[str, "F.Column"]
) -> tuple[DataFrame, DataFrame]:
    """Split rows into (valid, quarantined-with-reasons) by a named
    constraint set — the batch dead-letter pattern: a nightly load
    ships the valid side and routes violators to a quarantine table
    with machine-readable reasons, instead of failing the whole batch
    (validate_or_raise) or silently dropping rows (a bare filter).

    NULL follows SQL CHECK semantics: a constraint evaluating to NULL
    (unknown) PASSES — only a definite FALSE quarantines, so a nullable
    column never flags rows the equivalent CHECK would admit. The
    violation array preserves the dict's insertion order,
    deterministically.

    One map-only projection builds the reasons array; both returned
    frames share it, so a caller materializing the two sides scans the
    input once per side with no shuffle (or once total if it caches the
    tagged frame). Quarantined rows keep every input column plus
    ``violations`` (array<string>).
    """
    viol = F.filter(
        F.array(
            *[
                F.when(~F.coalesce(c, F.lit(True)), F.lit(name))
                for name, c in constraints.items()
            ]
        ),
        lambda x: x.isNotNull(),
    )
    tagged = df.withColumn("violations", viol)
    valid = tagged.filter(F.size("violations") == 0).drop("violations")
    quarantined = tagged.filter(F.size("violations") > 0)
    return valid, quarantined
