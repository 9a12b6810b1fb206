"""TPC-H completion pack: the 16 classic ad-hoc decision-support query
shapes not yet covered by catalog_ext's Q1/Q3/Q5/Q10/Q14/Q18 styles,
adapted to the fixture star schema (no partsupp table, no
l_shipmode/l_commitdate/l_receiptdate/c_phone columns — each query notes
its stand-in). Together with catalog_ext these cover all 22 TPC-H query
shapes, i.e. the full ad-hoc OLAP surface a warehouse engine is expected
to serve (the reference's SQL scripts are Redshift warehouse loads:
dynamic_upsert.py:110-152, populate_fact.py:89-136 — these are the read
side of the same warehouse).

House rules (same as plans/catalog.py):
- every money/quantity SUM is exact DECIMAL internally and cast to
  DOUBLE once at the output boundary, so the DuckDB oracle reproduces
  values bit-for-bit regardless of partial-agg addition order;
- double DIVISIONS happen once per output row, in the same association
  on both engines;
- small dimensions broadcast explicitly; the fact table (lineitem)
  shuffles at most once per query, on its join or group key;
- LIMIT only under a total order (no ties).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..sources.readers import load_table
from .catalog import _q


def _dec_rev() -> F.Column:
    """Exact decimal revenue l_extendedprice*(1-l_discount) — the shared
    money expression (same shape as catalog_ext's Q1/Q3/Q5/Q10)."""
    return F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1.0) - F.col("l_discount")
    ).cast("decimal(9,4)")


_SQL_REV = (
    "CAST(l_extendedprice AS DECIMAL(18,2)) * "
    "CAST(1.0 - l_discount AS DECIMAL(9,4))"
)


# --------------------------------------------------------------------------
# Q2-style: min-cost supplier per part (correlated MIN, decorrelated)
# --------------------------------------------------------------------------

_X_Q2_SQL = f"""
WITH pairs AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
eu AS (
    SELECT s_suppkey, s_name, s_acctbal, n_name
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
                  JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'EUROPE'
)
SELECT p_partkey, p_name, s_name, n_name,
       CAST(s_acctbal AS DOUBLE) AS acctbal
FROM pairs JOIN eu ON l_suppkey = s_suppkey
           JOIN part ON l_partkey = p_partkey
WHERE p_type = 'LARGE' AND p_size <= 10
  AND s_acctbal = (
        SELECT MIN(e2.s_acctbal) FROM pairs p2 JOIN eu e2
            ON p2.l_suppkey = e2.s_suppkey
        WHERE p2.l_partkey = pairs.l_partkey)
"""


@_q("x_olap_q2_style", _X_Q2_SQL)
def x_olap_q2_style(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2-shaped minimum-cost-supplier query. No partsupp table in
    the fixture, so 'who can supply part p' = the DISTINCT
    (l_partkey, l_suppkey) pairs observed in lineitem, and s_acctbal
    stands in for ps_supplycost. The correlated MIN subquery is
    decorrelated into a per-part window MIN over the (part, supplier)
    pair set — one shuffle on l_partkey, no second scan, no join back
    (the classic decorrelation a warehouse optimizer applies). The
    supplier⋈nation⋈region side is dimension-sized and broadcasts;
    part is filtered before its broadcast ships. MIN equality on
    DOUBLE is exact (same stored values both engines)."""
    pairs = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    r = F.broadcast(
        load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    )
    eu = F.broadcast(
        load_table(spark, sf_dir, "supplier")
        .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(r, F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    p = F.broadcast(
        load_table(spark, sf_dir, "part").filter(
            (F.col("p_type") == "LARGE") & (F.col("p_size") <= 10)
        )
    )
    w = W.partitionBy("l_partkey")
    return (
        pairs.join(eu, F.col("l_suppkey") == F.col("s_suppkey"))
        .withColumn("_min_bal", F.min("s_acctbal").over(w))
        .filter(F.col("s_acctbal") == F.col("_min_bal"))
        .join(p, F.col("l_partkey") == F.col("p_partkey"))
        .select(
            "p_partkey",
            "p_name",
            "s_name",
            "n_name",
            F.col("s_acctbal").cast("double").alias("acctbal"),
        )
    )


# --------------------------------------------------------------------------
# Q4-style: order-priority checking (EXISTS semi-join)
# --------------------------------------------------------------------------

_X_Q4_SQL = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1996-07-01'
  AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey
          AND CAST(l_shipdate AS DATE) > CAST(o_orderdate AS DATE) + 30)
GROUP BY o_orderpriority
"""


@_q("x_olap_q4_style", _X_Q4_SQL)
def x_olap_q4_style(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4-shaped priority check: how many orders per priority had
    at least one line shipped >30 days after order date (ship-lag
    stands in for l_commitdate < l_receiptdate). The EXISTS becomes a
    LEFT SEMI join — Spark keeps it a semi at the physical level, so
    multi-late orders never duplicate, and the date filter prunes the
    orders scan before the join. One shuffle on orderkey, then a tiny
    5-group aggregate."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    cond = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate").cast("date")
        > F.date_add(F.col("o_orderdate").cast("date"), 30)
    )
    return (
        o.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


# --------------------------------------------------------------------------
# Q6-style: forecast revenue change (pure filtered scan-agg)
# --------------------------------------------------------------------------

_X_Q6_SQL = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
              CAST(l_discount AS DECIMAL(9,4))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM lineitem
WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
  AND CAST(l_shipdate AS DATE) < DATE '1997-01-01'
  AND l_discount >= 0.045 AND l_discount <= 0.075
  AND l_quantity < 24
"""


@_q("x_olap_q6_style", _X_Q6_SQL)
def x_olap_q6_style(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6-shaped what-if scan: revenue that would vanish if small
    mid-discount orders lost their discount. No join, no group key —
    the canonical predicate-pushdown + single global partial-agg query
    (every filter reaches the parquet scan; one row crosses the
    network per partition). The discount band uses open tolerances
    (0.045..0.075) rather than equality on binary doubles."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_rev = F.col("l_extendedprice").cast("decimal(18,2)") * F.col(
        "l_discount"
    ).cast("decimal(9,4)")
    return (
        li.filter(
            (F.col("l_shipdate").cast("date") >= F.lit("1996-01-01").cast("date"))
            & (F.col("l_shipdate").cast("date") < F.lit("1997-01-01").cast("date"))
            & (F.col("l_discount") >= 0.045)
            & (F.col("l_discount") <= 0.075)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(disc_rev).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# --------------------------------------------------------------------------
# Q7-style: volume shipping between two nations
# --------------------------------------------------------------------------

_X_Q7_SQL = f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(EXTRACT(year FROM l_shipdate) AS INTEGER) AS l_year,
       CAST(SUM({_SQL_REV}) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
  AND CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
  AND CAST(l_shipdate AS DATE) < DATE '1998-01-01'
GROUP BY 1, 2, 3
"""


@_q("x_olap_q7_style", _X_Q7_SQL)
def x_olap_q7_style(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7-shaped bilateral trade volume: revenue shipped between
    two named nations, by direction and year. Supplier and both nation
    aliases broadcast (supplier is pre-filtered to the two nations
    before its broadcast ships, which also shrinks the lineitem ⋈
    supplier probe); lineitem ⋈ orders is the one fact shuffle. The
    nation-pair disjunction is applied after both sides are labeled."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate").cast("date") >= F.lit("1996-01-01").cast("date"))
        & (F.col("l_shipdate").cast("date") < F.lit("1998-01-01").cast("date"))
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    nat = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_1", "NATION_2")
    )
    s = F.broadcast(
        load_table(spark, sf_dir, "supplier")
        .join(nat, F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    c = F.broadcast(
        load_table(spark, sf_dir, "customer")
        .join(nat, F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    return (
        li.join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(F.sum(_dec_rev()).cast("double").alias("revenue"))
    )


# --------------------------------------------------------------------------
# Q8-style: national market share
# --------------------------------------------------------------------------

_X_Q8_SQL = f"""
SELECT CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS o_year,
       CAST(SUM(CASE WHEN n1.n_name = 'NATION_3'
                     THEN {_SQL_REV} ELSE CAST(0 AS DECIMAL(18,2)) END)
            AS DOUBLE)
       / CAST(SUM({_SQL_REV}) AS DOUBLE) AS mkt_share
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
JOIN region   ON n2.n_regionkey = r_regionkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN part     ON l_partkey = p_partkey
WHERE r_name = 'ASIA' AND p_type = 'STANDARD'
  AND o_orderdate >= TIMESTAMP '1995-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY 1
"""


@_q("x_olap_q8_style", _X_Q8_SQL)
def x_olap_q8_style(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8-shaped market share: NATION_3 suppliers' slice of
    STANDARD-part revenue sold into ASIA, per order year. Numerator
    and denominator are both exact decimal sums over the same grouped
    rows (single aggregation, CASE inside SUM — not two passes); the
    one double division happens per output year. part, supplier+nation
    and customer+nation+region all broadcast pre-filtered; lineitem ⋈
    orders is the only fact-fact shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    c = F.broadcast(
        load_table(spark, sf_dir, "customer")
        .join(n, F.col("c_nationkey") == F.col("n_nationkey"))
        .join(r, F.col("n_regionkey") == F.col("r_regionkey"))
        .select("c_custkey")
    )
    s = F.broadcast(
        load_table(spark, sf_dir, "supplier")
        .join(
            n.select(
                F.col("n_nationkey").alias("sn_key"),
                F.col("n_name").alias("supp_nation"),
            ),
            F.col("s_nationkey") == F.col("sn_key"),
        )
        .select("s_suppkey", "supp_nation")
    )
    p = F.broadcast(
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_type") == "STANDARD")
        .select("p_partkey")
    )
    nation_rev = F.sum(
        F.when(F.col("supp_nation") == "NATION_3", _dec_rev()).otherwise(
            F.lit(0).cast("decimal(18,2)")
        )
    )
    return (
        li.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            nation_rev.cast("double").alias("_num"),
            F.sum(_dec_rev()).cast("double").alias("_den"),
        )
        .select(
            "o_year", (F.col("_num") / F.col("_den")).alias("mkt_share")
        )
    )


# --------------------------------------------------------------------------
# Q9-style: product-type profit by nation and year
# --------------------------------------------------------------------------

_X_Q9_SQL = f"""
SELECT n_name AS nation,
       CAST(EXTRACT(year FROM l_shipdate) AS INTEGER) AS o_year,
       CAST(SUM({_SQL_REV}) AS DOUBLE)
       - CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2)) *
                  CAST(l_quantity AS DECIMAL(9,2))) AS DOUBLE) AS profit
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_name LIKE '%widget%'
GROUP BY 1, 2
"""


@_q("x_olap_q9_style", _X_Q9_SQL)
def x_olap_q9_style(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9-shaped product-line profit: revenue minus cost for all
    'widget' parts, by supplier nation and ship year. p_retailprice ×
    l_quantity stands in for ps_supplycost × l_quantity (no partsupp
    table). Revenue and cost stay exact decimals through their SUMs
    and are subtracted once per group in double; part (pre-filtered by
    the LIKE) and supplier⋈nation broadcast, so the fact table's only
    shuffle is the final 2-key groupBy."""
    li = load_table(spark, sf_dir, "lineitem")
    p = F.broadcast(
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%widget%"))
        .select("p_partkey", "p_retailprice")
    )
    n = load_table(spark, sf_dir, "nation")
    s = F.broadcast(
        load_table(spark, sf_dir, "supplier")
        .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("nation"))
    )
    cost = F.col("p_retailprice").cast("decimal(18,2)") * F.col(
        "l_quantity"
    ).cast("decimal(9,2)")
    return (
        li.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("nation", F.year("l_shipdate").alias("o_year"))
        .agg(
            F.sum(_dec_rev()).cast("double").alias("_rev"),
            F.sum(cost).cast("double").alias("_cost"),
        )
        .select(
            "nation", "o_year", (F.col("_rev") - F.col("_cost")).alias("profit")
        )
    )


# --------------------------------------------------------------------------
# Q11-style: important stock identification (HAVING vs global scalar)
# --------------------------------------------------------------------------

_X_Q11_SQL = f"""
WITH val AS (
    SELECT l_partkey, SUM({_SQL_REV}) AS v
    FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
                  JOIN nation ON s_nationkey = n_nationkey
                  JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'AMERICA'
    GROUP BY l_partkey)
SELECT l_partkey, CAST(v AS DOUBLE) AS value
FROM val
WHERE CAST(v AS DOUBLE)
      > (SELECT CAST(SUM(v) AS DOUBLE) / COUNT(*) FROM val) * 2.0
"""


@_q("x_olap_q11_style", _X_Q11_SQL)
def x_olap_q11_style(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11-shaped important-stock query: parts whose AMERICA-
    supplied revenue exceeds 2x the average per-part value (lineitem
    revenue stands in for partsupp stock value). Real Q11's fraction
    is SF-adaptive (0.0001/SF) precisely because a fixed global
    fraction empties at scale; 'multiple of the average' is the
    scale-free equivalent. The scalar is an aggregate OVER the
    per-part aggregate — one row per part, never a lineitem rescan —
    and joins back as a broadcast; the comparison happens in double
    with identical association on both engines (sums exact decimal
    first)."""
    li = load_table(spark, sf_dir, "lineitem")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    s = F.broadcast(
        load_table(spark, sf_dir, "supplier")
        .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(r, F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey")
    )
    per_part = (
        li.join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(F.sum(_dec_rev()).alias("_v"))
    )
    total = per_part.agg(
        (F.sum("_v").cast("double") / F.count(F.lit(1))).alias("_avg")
    )
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("_v").cast("double") > F.col("_avg") * F.lit(2.0))
        .select("l_partkey", F.col("_v").cast("double").alias("value"))
    )


# --------------------------------------------------------------------------
# Q12-style: shipping-lag / priority cross-tab
# --------------------------------------------------------------------------

_X_Q12_SQL = """
SELECT l_linestatus,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE CAST(l_shipdate AS DATE) > CAST(o_orderdate AS DATE) + 45
  AND CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
  AND CAST(l_shipdate AS DATE) < DATE '1998-01-01'
GROUP BY l_linestatus
"""


@_q("x_olap_q12_style", _X_Q12_SQL)
def x_olap_q12_style(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12-shaped late-shipment cross-tab: lines shipped >45 days
    after ordering, split by line status (stands in for l_shipmode)
    and counted by order-priority class — two conditional counts in ONE
    aggregation pass. The ship-window filter prunes the lineitem scan;
    the join condition references both sides (ship lag), so it rides on
    the orderkey equi-join and filters post-probe."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate").cast("date") >= F.lit("1996-01-01").cast("date"))
        & (F.col("l_shipdate").cast("date") < F.lit("1998-01-01").cast("date"))
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(
            F.col("l_shipdate").cast("date")
            > F.date_add(F.col("o_orderdate").cast("date"), 45)
        )
        .groupBy("l_linestatus")
        .agg(
            # BIGINT pinned on BOTH engines: DuckDB widens SUM(int) to
            # HUGEINT, which pandas renders as float64 (2.0 vs 2) and the
            # driver hash-mismatches even when values are equal (r07 red).
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("long").alias("low_line_count"),
        )
    )


# --------------------------------------------------------------------------
# Q13-style: customer order-count distribution (incl. zero)
# --------------------------------------------------------------------------

_X_Q13_SQL = """
SELECT c_count, COUNT(*) AS custdist
FROM (
    SELECT c_custkey, COUNT(o_orderkey) AS c_count
    FROM customer LEFT OUTER JOIN orders
        ON c_custkey = o_custkey
        AND o_orderpriority <> '4-NOT SPECIFIED'
    GROUP BY c_custkey)
GROUP BY c_count
"""


@_q("x_olap_q13_style", _X_Q13_SQL)
def x_olap_q13_style(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13-shaped customer distribution: histogram of per-customer
    order counts, customers with zero qualifying orders included —
    which is exactly why the join must be LEFT OUTER with the priority
    filter INSIDE the join condition (a WHERE would silently drop the
    zero bucket; the NOT-SPECIFIED priority stands in for the
    'special requests' comment filter). COUNT(o_orderkey) counts
    non-null matches only. Two cascaded aggregations: custkey (fact
    shuffle), then the tiny count-of-counts."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "4-NOT SPECIFIED"
    )
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


# --------------------------------------------------------------------------
# Q15-style: top supplier (agg == global MAX of the same agg)
# --------------------------------------------------------------------------

_X_Q15_SQL = f"""
WITH revenue AS (
    SELECT l_suppkey AS supplier_no, SUM({_SQL_REV}) AS total_rev
    FROM lineitem
    WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
      AND CAST(l_shipdate AS DATE) < DATE '1996-04-01'
    GROUP BY l_suppkey)
SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_rev
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_rev = (SELECT MAX(total_rev) FROM revenue)
"""


@_q("x_olap_q15_style", _X_Q15_SQL)
def x_olap_q15_style(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15-shaped top supplier: the supplier(s) whose quarterly
    revenue equals the global maximum. The revenue 'view' is computed
    once; the scalar MAX aggregates its ~|suppliers| rows and joins
    back as a broadcast — no rescan, no global sort, and the equality
    is on the exact DECIMAL (doubles only at the output boundary), so
    '== MAX' cannot be perturbed by addition order."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate").cast("date") >= F.lit("1996-01-01").cast("date"))
        & (F.col("l_shipdate").cast("date") < F.lit("1996-04-01").cast("date"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_dec_rev()).alias("_rev")
    )
    mx = revenue.agg(F.max("_rev").alias("_mx"))
    s = F.broadcast(
        load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    )
    return (
        revenue.crossJoin(F.broadcast(mx))
        .filter(F.col("_rev") == F.col("_mx"))
        .join(s, F.col("supplier_no") == F.col("s_suppkey"))
        .select(
            "s_suppkey", "s_name", F.col("_rev").cast("double").alias("total_rev")
        )
    )


# --------------------------------------------------------------------------
# Q16-style: supplier-relationship count (NOT IN + COUNT DISTINCT)
# --------------------------------------------------------------------------

_X_Q16_SQL = """
SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) pairs
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#3' AND p_type <> 'PROMO'
  AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
"""


@_q("x_olap_q16_style", _X_Q16_SQL)
def x_olap_q16_style(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16-shaped supplier-relationship count: how many distinct
    suppliers can deliver each qualifying (brand, type, size) — the
    observed lineitem (part, supplier) pairs stand in for partsupp,
    and negative account balance stands in for the complaints filter.
    The NOT IN is a broadcast LEFT ANTI join (NULL-safe here: keys are
    non-null), part broadcasts pre-filtered, and the COUNT DISTINCT
    rides Spark's two-phase distinct-aggregate expansion on the
    3-attribute group key."""
    pairs = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    bad = F.broadcast(
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    p = F.broadcast(
        load_table(spark, sf_dir, "part").filter(
            (F.col("p_brand") != "Brand#3")
            & (F.col("p_type") != "PROMO")
            & (F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35))
        )
    )
    return (
        pairs.join(bad, F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(p, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


# --------------------------------------------------------------------------
# Q17-style: small-quantity-order revenue (correlated AVG, decorrelated)
# --------------------------------------------------------------------------

_X_Q17_SQL = """
WITH thr AS (
    SELECT l_partkey AS tp,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
             / COUNT(*) * 0.2 AS qty_thr
    FROM lineitem GROUP BY l_partkey)
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
         AS avg_yearly,
       COUNT(*) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
              JOIN thr ON l_partkey = tp
WHERE p_brand = 'Brand#3' AND p_type = 'SMALL'
  AND l_quantity < qty_thr
"""


@_q("x_olap_q17_style", _X_Q17_SQL)
def x_olap_q17_style(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17-shaped small-quantity revenue: lines of Brand#3 SMALL
    parts ordered below 20% of that part's average quantity. The
    correlated AVG decorrelates into one per-part aggregate joined
    back on partkey — both sides share the l_partkey shuffle. The
    threshold is exact-decimal SUM / COUNT * 0.2 evaluated in double
    with identical association on both engines (quantities are
    integer-valued, so the decimal SUM is exact and the double is a
    single rounding); fixture quantities are integers, so no value
    sits within one ulp of its threshold."""
    li = load_table(spark, sf_dir, "lineitem")
    thr = li.groupBy(F.col("l_partkey").alias("tp")).agg(
        (
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double")
            / F.count(F.lit(1))
            * F.lit(0.2)
        ).alias("qty_thr")
    )
    p = F.broadcast(
        load_table(spark, sf_dir, "part")
        .filter((F.col("p_brand") == "Brand#3") & (F.col("p_type") == "SMALL"))
        .select("p_partkey")
    )
    return (
        li.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .join(thr, F.col("l_partkey") == F.col("tp"))
        .filter(F.col("l_quantity") < F.col("qty_thr"))
        .agg(
            (
                F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast(
                    "double"
                )
                / F.lit(7.0)
            ).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# --------------------------------------------------------------------------
# Q19-style: discounted revenue under disjunctive bracket predicates
# --------------------------------------------------------------------------

_X_Q19_SQL = f"""
SELECT CAST(SUM({_SQL_REV}) AS DOUBLE) AS revenue, COUNT(*) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10
       AND l_quantity >= 1 AND l_quantity <= 11)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 20
       AND l_quantity >= 10 AND l_quantity <= 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 30
       AND l_quantity >= 20 AND l_quantity <= 30)
"""


@_q("x_olap_q19_style", _X_Q19_SQL)
def x_olap_q19_style(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19-shaped disjunctive-bracket revenue: three OR-ed
    (brand, size, quantity) brackets spanning both join sides. The
    single-table conjuncts are factored out so they push down BEFORE
    the join (part pre-filtered to the bracket union, lineitem to the
    quantity hull 1..30) — the classic Q19 optimization that turns an
    un-pushable OR into scan-level pruning — and the full disjunction
    re-applies post-join for exactness. Part broadcasts; lineitem
    never shuffles (map-side join + global partial agg)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_quantity") >= 1) & (F.col("l_quantity") <= 30)
    )
    p = F.broadcast(
        load_table(spark, sf_dir, "part").filter(
            (
                (F.col("p_brand") == "Brand#1")
                & F.col("p_size").between(1, 10)
            )
            | (
                (F.col("p_brand") == "Brand#2")
                & F.col("p_size").between(1, 20)
            )
            | (
                (F.col("p_brand") == "Brand#3")
                & F.col("p_size").between(1, 30)
            )
        )
    )
    bracket = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 20)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 30)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        li.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .filter(bracket)
        .agg(
            F.sum(_dec_rev()).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# --------------------------------------------------------------------------
# Q20-style: suppliers with excess stock (nested IN over an aggregate)
# --------------------------------------------------------------------------

_X_Q20_SQL = """
WITH per_sp AS (
    SELECT l_suppkey, l_partkey,
           SUM(CAST(l_quantity AS DECIMAL(18,2))) AS supp_qty
    FROM lineitem
    WHERE l_partkey IN (SELECT p_partkey FROM part
                        WHERE p_name LIKE 'red%')
    GROUP BY l_suppkey, l_partkey),
totals AS (
    SELECT l_partkey AS pt_key, SUM(supp_qty) AS total_qty,
           COUNT(*) AS n_supp
    FROM per_sp GROUP BY l_partkey),
big_suppliers AS (
    SELECT DISTINCT l_suppkey
    FROM per_sp JOIN totals ON l_partkey = pt_key
    WHERE n_supp >= 3
      AND CAST(supp_qty AS DOUBLE)
          > CAST(total_qty AS DOUBLE) / n_supp * 3.0)
SELECT s_suppkey, s_name
FROM supplier JOIN nation ON s_nationkey = n_nationkey
WHERE n_name IN ('NATION_2', 'NATION_3', 'NATION_5')
  AND s_suppkey IN (SELECT l_suppkey FROM big_suppliers)
"""


@_q("x_olap_q20_style", _X_Q20_SQL)
def x_olap_q20_style(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20-shaped excess-stock supplier list: suppliers in a
    3-nation panel who shipped >3x the average per-supplier volume of
    some contested (>=3 suppliers) 'red' part (dominant shipped share
    stands in for ps_availqty > half of sold quantity — no partsupp
    table; the multiple-of-average threshold is scale-free, same
    rationale as x_olap_q11_style). The nested IN-over-aggregate
    becomes two cascaded aggregates sharing the (suppkey, partkey)
    shuffle: per-(supplier, part) quantity, then per-part totals
    re-aggregated FROM the first result (no lineitem rescan), joined
    back on partkey, with the final supplier membership a LEFT SEMI
    against the dimension. The red-part filter broadcasts and prunes
    the fact scan before any shuffle. Threshold compare in double,
    identical association both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    red = F.broadcast(
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("red%"))
        .select("p_partkey")
    )
    per_sp = (
        li.join(red, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("supp_qty"))
    )
    totals = per_sp.groupBy(F.col("l_partkey").alias("pt_key")).agg(
        F.sum("supp_qty").alias("total_qty"),
        F.count(F.lit(1)).alias("n_supp"),
    )
    big = (
        per_sp.join(totals, F.col("l_partkey") == F.col("pt_key"))
        .filter(
            (F.col("n_supp") >= 3)
            & (
                F.col("supp_qty").cast("double")
                > F.col("total_qty").cast("double")
                / F.col("n_supp")
                * F.lit(3.0)
            )
        )
        .select("l_suppkey")
        .distinct()
    )
    n = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_2", "NATION_3", "NATION_5")
    )
    return (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(big, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
    )


# --------------------------------------------------------------------------
# Q21-style: suppliers who kept orders waiting (EXISTS + NOT EXISTS)
# --------------------------------------------------------------------------

_X_Q21_SQL = """
WITH late AS (
    SELECT l_orderkey, l_suppkey
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderstatus = 'F'
      AND CAST(l_shipdate AS DATE) > CAST(o_orderdate AS DATE) + 60),
nsupp AS (
    SELECT l_orderkey AS ok_all, COUNT(DISTINCT l_suppkey) AS n_all
    FROM lineitem GROUP BY l_orderkey),
nlate AS (
    SELECT l_orderkey AS ok_late, COUNT(DISTINCT l_suppkey) AS n_late
    FROM late GROUP BY l_orderkey)
SELECT s_name, COUNT(DISTINCT l_orderkey) AS numwait
FROM late
JOIN nsupp ON l_orderkey = ok_all
JOIN nlate ON l_orderkey = ok_late
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE n_all > 1 AND n_late = 1 AND n_name = 'NATION_4'
GROUP BY s_name
"""


@_q("x_olap_q21_style", _X_Q21_SQL)
def x_olap_q21_style(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21-shaped waiting-orders query: NATION_4 suppliers who
    were the SOLE late supplier on a finalized multi-supplier order
    (ship-lag > 60 days stands in for receipt-after-commit). The
    classic EXISTS (another supplier on the order) + NOT EXISTS
    (another LATE supplier) pair is decorrelated into per-order
    distinct-supplier counts — n_all > 1 encodes the EXISTS, n_late = 1
    the NOT EXISTS. Both counts come out of ONE conditional aggregation
    over the lineitem ⋈ F-orders base (the oracle's two separate CTEs
    are equivalent: every order in `late` has status F, so restricting
    n_all's scan to F-orders changes nothing), so the fact table
    shuffles once for the join and once for the per-order stats, and
    the stats join back on the same orderkey layout. numwait counts
    distinct orders per supplier."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    is_late = F.col("l_shipdate").cast("date") > F.date_add(
        F.col("o_orderdate").cast("date"), 60
    )
    base = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .select("l_orderkey", "l_suppkey", is_late.alias("_late"))
    )
    stats = base.groupBy(F.col("l_orderkey").alias("ok")).agg(
        F.countDistinct("l_suppkey").alias("n_all"),
        F.countDistinct(
            F.when(F.col("_late"), F.col("l_suppkey"))
        ).alias("n_late"),
    )
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_4")
    s = F.broadcast(
        load_table(spark, sf_dir, "supplier")
        .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name")
    )
    return (
        base.filter(F.col("_late"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(stats, F.col("l_orderkey") == F.col("ok"))
        .filter((F.col("n_all") > 1) & (F.col("n_late") == 1))
        .groupBy("s_name")
        .agg(F.countDistinct("l_orderkey").alias("numwait"))
    )


# --------------------------------------------------------------------------
# Q22-style: global sales opportunity (scalar AVG + NOT EXISTS)
# --------------------------------------------------------------------------

# single source of truth for the 7-nation panel: the SQL text and the
# Spark filter both derive from this tuple, so they cannot desync
_Q22_NATION_KEYS = (1, 3, 5, 7, 9, 11, 13)
_X_Q22_NATIONS = "(" + ", ".join(str(k) for k in _Q22_NATION_KEYS) + ")"

_X_Q22_SQL = f"""
WITH avg_bal AS (
    SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
             / COUNT(*) AS ab
    FROM customer
    WHERE c_acctbal > 0 AND c_nationkey IN {_X_Q22_NATIONS})
SELECT c_nationkey AS cntrycode, COUNT(*) AS numcust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
FROM customer, avg_bal
WHERE c_nationkey IN {_X_Q22_NATIONS}
  AND c_acctbal > ab
  AND NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey
          AND o_orderdate >= TIMESTAMP '1999-01-01')
GROUP BY c_nationkey
"""


@_q("x_olap_q22_style", _X_Q22_SQL)
def x_olap_q22_style(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22-shaped sales-opportunity query: well-funded customers
    in a 7-nation panel (nationkey stands in for the phone country
    code) with above-average balances and NO recent orders. The scalar
    AVG broadcasts (exact-decimal sum / count, single double division,
    same association both engines); 'no order since 1999' is a LEFT
    ANTI join against the date-pruned orders scan — never a correlated
    probe. Customer's only shuffle is the anti-join on custkey."""
    nations = list(_Q22_NATION_KEYS)
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_nationkey").isin(nations)
    )
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(
        (
            F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double")
            / F.count(F.lit(1))
        ).alias("ab")
    )
    recent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp")
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
            .cast("double")
            .alias("totacctbal"),
        )
    )
