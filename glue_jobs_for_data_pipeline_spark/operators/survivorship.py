"""Survivorship / golden-record merge: column-level best-value fusion
after entity resolution.

Entity resolution (operators/dedup.py blocked fuzzy ER, or any of the
dedup cluster tiers) ends with CLUSTERS of records believed to be the
same real-world entity; the dedup tiers then keep one ROW per cluster
(dedup_by_clusters / dedup_by_clusters_best). Survivorship is the
complementary, column-level policy: the golden record takes each
ATTRIBUTE from whichever cluster member satisfies that attribute's
rule — newest segment, longest name, any non-null balance — so the
survivor can be better than every input row. This is the standard MDM
(master-data-management) merge step a training-data pipeline runs after
near-dup clustering to fuse document/source metadata. No counterpart in
the reference (its dimensions assume a single clean feed).

Scale shape: ONE map-side-combined groupBy over the cluster key,
regardless of how many columns carry rules — every rule compiles to a
struct-ordered MAX/MIN aggregate (lexicographic struct comparison, the
same trick both engines share), so there is exactly one shuffle of
(cluster, packed-struct) rows and no window, no self-join, no
per-column pass. Determinism: every comparison struct is null-guarded
(a leading not-null flag; null comparison fields coalesced to a typed
neutral) and totally ordered (the unique record id sits before the
carried value, so engine null-ordering and tie behavior never decide a
winner).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

RULES = ("latest", "earliest", "max", "min", "longest", "non_null_latest")


def _neutral(dtype: T.DataType) -> F.Column:
    """A typed constant used ONLY to keep null comparison fields
    orderable; it can never select a winner because the unique record
    id orders any rows that tie on it."""
    if isinstance(dtype, T.StringType):
        return F.lit("")
    if isinstance(dtype, (T.DateType, T.TimestampType)):
        return F.lit("1900-01-01").cast(dtype)
    if isinstance(dtype, T.BooleanType):
        return F.lit(False)
    return F.lit(0).cast(dtype)


def golden_record(
    df: DataFrame,
    cluster_col: str,
    id_col: str,
    rules: dict[str, str],
    recency_col: str | None = None,
) -> DataFrame:
    """One golden row per cluster; each ruled column fused
    independently per its rule:

    - ``latest`` / ``earliest``: value from the most/least recent
      member (requires ``recency_col``; the value itself may be null
      if that member's is).
    - ``non_null_latest``: the most recent NON-NULL value — the
      standard 'fill from any source, prefer fresh' policy.
    - ``max`` / ``min``: extreme non-null value (nulls lose).
    - ``longest``: longest non-null string (ties: lexicographically
      greatest, then highest id).

    Output: (cluster, n_members, <ruled columns>).
    """
    for col, rule in rules.items():
        if rule not in RULES:
            raise ValueError(f"unknown survivorship rule {rule!r} for {col!r}")
        if rule in ("latest", "earliest", "non_null_latest") and not recency_col:
            raise ValueError(f"rule {rule!r} for {col!r} needs recency_col")

    aggs = [F.count(F.lit(1)).alias("n_members")]
    for col, rule in rules.items():
        v = F.col(col)
        dtype = df.schema[col].dataType
        flag = F.when(v.isNull(), F.lit(0)).otherwise(F.lit(1))
        vc = F.coalesce(v, _neutral(dtype))
        rid = F.col(id_col)
        if rule == "latest":
            packed = F.struct(
                F.col(recency_col).alias("k"), rid.alias("i"), v.alias("v")
            )
            agg = F.max(packed)
        elif rule == "earliest":
            packed = F.struct(
                F.col(recency_col).alias("k"), rid.alias("i"), v.alias("v")
            )
            agg = F.min(packed)
        elif rule == "non_null_latest":
            packed = F.struct(
                flag.alias("f"),
                F.col(recency_col).alias("k"),
                rid.alias("i"),
                v.alias("v"),
            )
            agg = F.max(packed)
        elif rule == "max":
            packed = F.struct(
                flag.alias("f"), vc.alias("k"), rid.alias("i"), v.alias("v")
            )
            agg = F.max(packed)
        elif rule == "min":
            # invert the flag so null (flag 1) sorts LAST under min
            packed = F.struct(
                (F.lit(1) - flag).alias("f"),
                vc.alias("k"),
                rid.alias("i"),
                v.alias("v"),
            )
            agg = F.min(packed)
        else:  # longest
            packed = F.struct(
                flag.alias("f"),
                F.coalesce(F.length(v), F.lit(0)).alias("l"),
                vc.alias("k"),
                rid.alias("i"),
                v.alias("v"),
            )
            agg = F.max(packed)
        aggs.append(agg["v"].alias(col))
    return df.groupBy(cluster_col).agg(*aggs)
