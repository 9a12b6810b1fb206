"""Generate a larger test SF by deterministic K-fold replication of
/root/testdata/sf0.1 — the third decade for the scaling audit
(sf0.01 -> sf0.1 -> sf1), since /root/testdata is read-only and ships
no sf1.

Replication model (the TPC-H scale-up idiom): K shifted copies of every
fact/dim table, all keys offset by copy * (max_key + 1) so foreign keys
stay consistent within a copy and the per-order/per-user/per-doc
distributions (basket sizes, lines-per-order, event cadence, document
length) are EXACTLY those of the source. Region/nation stay fixed
(their keys are referenced unshifted). Two tables get per-copy
perturbation so replication doesn't fabricate cross-copy duplicate
structure the real distribution wouldn't have:

- documents: copies > 0 suffix EVERY token with a copy tag — a
  bijection on the vocabulary, so each copy's shingle space is
  disjoint from every other copy's while the WITHIN-copy collision
  structure (per-shingle df, k-gram windows, near-dup pairs) is
  exactly isomorphic to the source: pair counts replicate linearly.
  (Verbatim copies would create 10-way exact-dup cliques and 10x
  shingle df; the first r15 attempt — interleaving a tag token every
  2nd word — kept copies disjoint but diluted k-gram specificity,
  inflating within-copy collisions ~100x on the 8-gram winnow join.
  Both are replication artifacts, not properties of 10x real data.)
- embeddings: copy i circularly shifts each vector by i components —
  norms and all WITHIN-copy cosines are preserved exactly, cross-copy
  cosines decorrelate, so near-dup groups and cluster structure scale
  linearly instead of every vector gaining 9 exact clones.

Deterministic (pure SQL over the source parquet, no RNG). Output goes
inside the repo (default scratch/sf1/) because /root/testdata must not
be written.

Usage: python tools/gen_sf.py [K] [DST_DIR] [SRC_DIR]
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC_DEFAULT = "/root/testdata/sf0.1"
DST_DEFAULT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "scratch", "sf1",
)


def _copy(con: duckdb.DuckDBPyConnection, sql: str, dst: str) -> None:
    con.execute(f"COPY ({sql}) TO '{dst}' (FORMAT PARQUET)")


def generate(k: int, src: str, dst: str) -> None:
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    for t in (
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}/{t}.parquet')"
        )
    # offsets: copy * (max+1), computed once per keyed table
    off = {
        t: con.execute(f"SELECT MAX({c}) + 1 FROM {t}").fetchone()[0]
        for t, c in (
            ("customer", "c_custkey"), ("supplier", "s_suppkey"),
            ("part", "p_partkey"), ("orders", "o_orderkey"),
            ("events", "event_id"), ("documents", "doc_id"),
            ("embeddings", "vec_id"),
        )
    }
    uoff = con.execute("SELECT MAX(user_id) + 1 FROM events").fetchone()[0]
    rep = f"CROSS JOIN range({k}) r(i)"

    _copy(con, "SELECT * FROM region", f"{dst}/region.parquet")
    _copy(con, "SELECT * FROM nation", f"{dst}/nation.parquet")
    _copy(
        con,
        f"""SELECT c_custkey + i * {off['customer']} AS c_custkey,
                   c_name, c_nationkey, c_acctbal, c_mktsegment
            FROM customer {rep}""",
        f"{dst}/customer.parquet",
    )
    _copy(
        con,
        f"""SELECT s_suppkey + i * {off['supplier']} AS s_suppkey,
                   s_name, s_nationkey, s_acctbal
            FROM supplier {rep}""",
        f"{dst}/supplier.parquet",
    )
    _copy(
        con,
        f"""SELECT p_partkey + i * {off['part']} AS p_partkey,
                   p_name, p_brand, p_type, p_size, p_retailprice
            FROM part {rep}""",
        f"{dst}/part.parquet",
    )
    _copy(
        con,
        f"""SELECT o_orderkey + i * {off['orders']} AS o_orderkey,
                   o_custkey + i * {off['customer']} AS o_custkey,
                   o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
            FROM orders {rep}""",
        f"{dst}/orders.parquet",
    )
    _copy(
        con,
        f"""SELECT l_orderkey + i * {off['orders']} AS l_orderkey,
                   l_partkey + i * {off['part']} AS l_partkey,
                   l_suppkey + i * {off['supplier']} AS l_suppkey,
                   l_linenumber, l_quantity, l_extendedprice, l_discount,
                   l_tax, l_returnflag, l_linestatus, l_shipdate
            FROM lineitem {rep}""",
        f"{dst}/lineitem.parquet",
    )
    _copy(
        con,
        f"""SELECT event_id + i * {off['events']} AS event_id, ts,
                   user_id + i * {uoff} AS user_id,
                   event_type, value, props
            FROM events {rep}""",
        f"{dst}/events.parquet",
    )
    # documents: copy 0 verbatim; copies > 0 suffix every token with
    # 'zq<i>' (vocabulary bijection per copy, see module doc)
    _copy(
        con,
        f"""WITH t AS (
              SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w,
                     text, lang, source, i
              FROM documents {rep}),
            tagged AS (
              SELECT doc_id + i * {off['documents']} AS doc_id,
                     CASE WHEN i = 0 THEN text ELSE
                       array_to_string(list_transform(
                         w, x -> x || 'zq' || CAST(i AS VARCHAR)), ' ')
                     END AS text,
                     lang, source
              FROM t)
            SELECT doc_id, text, lang, source,
                   CAST(length(text) AS BIGINT) AS n_chars
            FROM tagged""",
        f"{dst}/documents.parquet",
    )
    # embeddings: copy i = circular shift by i components (norm- and
    # within-copy-cosine-preserving; see module doc)
    _copy(
        con,
        f"""SELECT vec_id + i * {off['embeddings']} AS vec_id,
                   CASE WHEN i = 0 THEN embedding ELSE
                     embedding[CAST(i AS INT) + 1:] ||
                     embedding[:CAST(i AS INT)]
                   END AS embedding,
                   label
            FROM embeddings {rep}""",
        f"{dst}/embeddings.parquet",
    )
    for t in ("lineitem", "orders", "documents", "embeddings"):
        n = con.execute(
            f"SELECT COUNT(*) FROM read_parquet('{dst}/{t}.parquet')"
        ).fetchone()[0]
        print(f"{t}: {n}")


if __name__ == "__main__":
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    dst = sys.argv[2] if len(sys.argv) > 2 else DST_DEFAULT
    src = sys.argv[3] if len(sys.argv) > 3 else SRC_DEFAULT
    generate(k, src, dst)
