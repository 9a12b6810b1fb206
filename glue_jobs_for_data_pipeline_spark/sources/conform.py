"""Schema conformance for drifting ingestion feeds.

The reference pins every table's shape in dict-driven configs
(its Glue jobs assume the feed matches; a drifted batch fails the
COPY). Production feeds drift anyway — columns appear, disappear, get
renamed upstream, or arrive at a narrower type — so the ingestion
plane needs one explicit, auditable alignment step instead of
scattered selectExpr casts: ``conform_schema`` maps any incoming batch
onto a target StructType or rejects it with a precise reason.

Policy (deliberately conservative):
- renames apply first (upstream's name -> target name);
- a missing target column materializes as a typed NULL;
- an exact type match passes through;
- a SAFE WIDENING casts (byte<short<int<long, float<double,
  date->timestamp, decimal to >= precision-minus-scale and >= scale);
- anything else — narrowing, cross-family, string->number — raises
  ValueError naming the column and both types (silent coercion is how
  bad feeds poison a warehouse);
- extra source columns are dropped (they are the feed's business, not
  the table's).

Scale shape: the output is a single SELECT of casts/aliases/typed
NULLs — map-only, whole-stage codegen, no shuffle; the decision logic
runs entirely on the driver against the schemas, never the data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_INT_ORDER = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
_FLOAT_ORDER = (T.FloatType, T.DoubleType)


def _rank(t: T.DataType, order) -> int | None:
    for i, cls in enumerate(order):
        if isinstance(t, cls):
            return i
    return None


def _widens(src: T.DataType, dst: T.DataType) -> bool:
    si, di = _rank(src, _INT_ORDER), _rank(dst, _INT_ORDER)
    if si is not None and di is not None:
        return si <= di
    sf, df_ = _rank(src, _FLOAT_ORDER), _rank(dst, _FLOAT_ORDER)
    if sf is not None and df_ is not None:
        return sf <= df_
    if isinstance(src, T.DateType) and isinstance(dst, T.TimestampType):
        return True
    if isinstance(src, T.DecimalType) and isinstance(dst, T.DecimalType):
        return (
            dst.scale >= src.scale
            and dst.precision - dst.scale >= src.precision - src.scale
        )
    return False


def conform_schema(
    df: DataFrame,
    target: T.StructType,
    renames: dict[str, str] | None = None,
) -> DataFrame:
    """Align ``df`` to ``target`` (rename -> fill -> widen -> verify);
    output columns in target order. Raises ValueError on any mapping
    the widening policy cannot justify."""
    if renames:
        missing = [c for c in renames if c not in df.columns]
        if missing:
            raise ValueError(f"conform_schema: rename sources absent: {missing}")
        for old, new in renames.items():
            df = df.withColumnRenamed(old, new)
    # resolve names the way Spark does by default: CASE-INSENSITIVELY.
    # A case-sensitive dict here would treat a feed's 'O_OrderKey' as
    # missing and silently null out the whole column — the exact silent
    # poisoning this module exists to refuse.
    src_types = {f.name: f.dataType for f in df.schema.fields}
    by_folded: dict[str, list[str]] = {}
    for n in src_types:
        by_folded.setdefault(n.lower(), []).append(n)
    ambiguous = {k: v for k, v in by_folded.items() if len(v) > 1}
    if ambiguous:
        raise ValueError(
            "conform_schema: source columns differ only by case "
            f"(ambiguous under Spark's default resolver): {ambiguous}"
        )
    out: list[F.Column] = []
    for field in target.fields:
        name, want = field.name, field.dataType
        src_name = by_folded.get(name.lower(), [None])[0]
        if src_name is None:
            out.append(F.lit(None).cast(want).alias(name))
            continue
        have = src_types[src_name]
        if have == want:
            out.append(F.col(src_name).alias(name))
        elif _widens(have, want):
            out.append(F.col(src_name).cast(want).alias(name))
        else:
            raise ValueError(
                f"conform_schema: column {name!r} is {have.simpleString()} "
                f"but target wants {want.simpleString()} — not a safe "
                "widening; fix the feed or the target"
            )
    return df.select(*out)
