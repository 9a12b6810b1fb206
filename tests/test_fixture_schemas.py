"""Fixture-schema contract: the driver regenerates its testdata parquet
between rounds, and a silent dtype change can produce silently-WRONG
results rather than loud errors (r05: events.ts flipped TIMESTAMP(NANOS)
-> timestamp[us] and the streaming reader misread µs as ns, collapsing
two years into minutes). This pins the schema of every table AS SPARK
RESOLVES IT, so any regeneration drift fails here first with a message
naming the table — then decide per-column whether to normalize in a
reader (the events pattern: sources/readers.py normalize_event_ts) or
to update queries.

Timestamp-typed columns are asserted as "some timestamp flavor" rather
than an exact NTZ/LTZ/long pin — that axis is exactly what the readers
normalize — while every other column is pinned exactly.
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

# column -> simpleString type; "TS" = any timestamp flavor (see above)
_CONTRACT = {
    "region": {"r_regionkey": "int", "r_name": "string"},
    "nation": {"n_nationkey": "int", "n_name": "string", "n_regionkey": "int"},
    "customer": {
        "c_custkey": "bigint",
        "c_name": "string",
        "c_nationkey": "int",
        "c_acctbal": "double",
        "c_mktsegment": "string",
    },
    "supplier": {
        "s_suppkey": "bigint",
        "s_name": "string",
        "s_nationkey": "int",
        "s_acctbal": "double",
    },
    "part": {
        "p_partkey": "bigint",
        "p_name": "string",
        "p_brand": "string",
        "p_type": "string",
        "p_size": "int",
        "p_retailprice": "double",
    },
    "orders": {
        "o_orderkey": "bigint",
        "o_custkey": "bigint",
        "o_orderstatus": "string",
        "o_totalprice": "double",
        "o_orderdate": "TS",
        "o_orderpriority": "string",
    },
    "lineitem": {
        "l_orderkey": "bigint",
        "l_partkey": "bigint",
        "l_suppkey": "bigint",
        "l_linenumber": "int",
        "l_quantity": "double",
        "l_extendedprice": "double",
        "l_discount": "double",
        "l_tax": "double",
        "l_returnflag": "string",
        "l_linestatus": "string",
        "l_shipdate": "TS",
    },
    "events": {
        "event_id": "bigint",
        "ts": "TS",
        "user_id": "bigint",
        "event_type": "string",
        "value": "double",
        "props": "string",
    },
    "documents": {
        "doc_id": "bigint",
        "text": "string",
        "lang": "string",
        "source": "string",
        "n_chars": "bigint",
    },
    "embeddings": {
        "vec_id": "bigint",
        "embedding": "array<float>",
        "label": "int",
    },
}

_TS_TYPES = (T.TimestampType, T.TimestampNTZType, T.LongType)


@pytest.mark.parametrize("table", sorted(_CONTRACT))
def test_fixture_schema_contract(spark, sf_dir, table):
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{table}.parquet")
    got = {f.name: f for f in df.schema.fields}
    want = _CONTRACT[table]
    assert sorted(got) == sorted(want), (
        f"{table}: column set drifted — fixture regenerated? "
        f"got {sorted(got)}, expected {sorted(want)}"
    )
    for col, typ in want.items():
        actual = got[col].dataType
        if typ == "TS":
            assert isinstance(actual, _TS_TYPES), (
                f"{table}.{col}: expected a timestamp flavor, got "
                f"{actual.simpleString()} — extend the reader "
                f"normalization (see sources/readers.py normalize_event_ts)"
            )
        else:
            assert actual.simpleString() == typ, (
                f"{table}.{col}: dtype drifted to {actual.simpleString()} "
                f"(expected {typ}) — fixture regenerated; audit queries "
                f"reading this column"
            )
