"""Behavioral/statistical analytics pack: the event-funnel, cohort
retention, and correlation-matrix query shapes every warehouse serves
on an events table (the reference's star schema is an order-events
warehouse; these are its read-side analytics, same family as the
Q-pack in tpch_pack.py).

House rules as plans/catalog.py: exact decimal sums internally, double
once at the boundary; multi-step funnels/cohorts shuffle on user_id
once per stage and reuse the key; no collects, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.readers import load_events, load_table
from .catalog import _q

# --------------------------------------------------------------------------
# Ordered event funnel: view -> click -> purchase
# --------------------------------------------------------------------------

_X_FUNNEL_SQL = """
WITH v AS (
    SELECT user_id, MIN(CAST(ts AS TIMESTAMP)) AS t1
    FROM events WHERE event_type = 'view' GROUP BY user_id),
c AS (
    SELECT e.user_id, MIN(CAST(e.ts AS TIMESTAMP)) AS t2
    FROM events e JOIN v ON e.user_id = v.user_id
    WHERE e.event_type = 'click' AND CAST(e.ts AS TIMESTAMP) > v.t1
    GROUP BY e.user_id),
p AS (
    SELECT e.user_id, MIN(CAST(e.ts AS TIMESTAMP)) AS t3
    FROM events e JOIN c ON e.user_id = c.user_id
    WHERE e.event_type = 'purchase' AND CAST(e.ts AS TIMESTAMP) > c.t2
    GROUP BY e.user_id)
SELECT (SELECT COUNT(*) FROM v) AS n_view,
       (SELECT COUNT(*) FROM c) AS n_click_after,
       (SELECT COUNT(*) FROM p) AS n_purchase_after
"""


@_q("x_events_funnel", _X_FUNNEL_SQL)
def x_events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strictly-ordered 3-step funnel (view -> click -> purchase): a
    user converts at step k only with an event AFTER their step-k-1
    time. Each stage is a user-keyed MIN over the (type-pruned) events
    scan joined to the previous stage's survivors — every shuffle is
    on user_id, so at scale the three stages reuse one hash layout
    under AQE, and the per-stage join input shrinks monotonically.
    First-touch attribution (MIN), so the result is deterministic.
    The three scalar counts cross-join into one output row."""
    ev = load_events(spark, sf_dir)
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    return (
        v.agg(F.count(F.lit(1)).alias("n_view"))
        .crossJoin(c.agg(F.count(F.lit(1)).alias("n_click_after")))
        .crossJoin(p.agg(F.count(F.lit(1)).alias("n_purchase_after")))
    )


# --------------------------------------------------------------------------
# Cohort retention: first-seen week x weeks-since-cohort
# --------------------------------------------------------------------------

_X_RETENTION_SQL = """
WITH first_seen AS (
    SELECT user_id,
           CAST(date_trunc('week', MIN(CAST(ts AS TIMESTAMP))) AS DATE)
             AS cohort_week
    FROM events GROUP BY user_id),
activity AS (
    SELECT DISTINCT e.user_id, f.cohort_week,
           CAST(date_trunc('week', CAST(e.ts AS TIMESTAMP)) AS DATE)
             AS act_week
    FROM events e JOIN first_seen f ON e.user_id = f.user_id)
SELECT cohort_week,
       CAST(date_diff('day', cohort_week, act_week) // 7 AS INTEGER)
         AS week_offset,
       COUNT(*) AS n_users
FROM activity
GROUP BY 1, 2
"""


@_q("x_events_retention", _X_RETENTION_SQL)
def x_events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention triangle: users bucketed by first-seen
    week, counted once per (cohort, weeks-since-cohort) they were
    active in. The cohort assignment is a user-keyed MIN; activity
    dedups on (user, week) BEFORE the count so a chatty user weighs
    once — classic two-level aggregation, both stages keyed on
    user_id then the tiny (cohort, offset) pair. Both engines
    truncate weeks to Monday; the offset is whole days // 7 (week
    starts differ by exact multiples of 7 days)."""
    ev = load_events(spark, sf_dir)
    first_seen = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_week")
    )
    activity = (
        ev.join(first_seen, "user_id")
        .select(
            "user_id",
            "cohort_week",
            F.date_trunc("week", F.col("ts")).cast("date").alias("act_week"),
        )
        .distinct()
    )
    return (
        activity.groupBy(
            "cohort_week",
            F.floor(
                F.datediff(F.col("act_week"), F.col("cohort_week")) / 7
            )
            .cast("integer")
            .alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


# --------------------------------------------------------------------------
# Algebraic Pearson correlation (exact-decimal co-moments)
# --------------------------------------------------------------------------

# Co-moments accumulate in INTEGER units (quantity counts, price
# cents) as scale-0 decimals. Scale matters: a DECIMAL(38,4) -> DOUBLE
# cast is DOUBLE-ROUNDED by DuckDB ((double)unscaled / 10^scale) but
# single-rounded by Spark (BigDecimal.doubleValue), and for co-moments
# past 2^53 the two differ by one ulp — measured on this fixture at
# sf0.001 (syy 7096786968835.868 vs .869). Scale-0 has no division, so
# both engines perform one correctly-rounded int->double conversion.
# Pearson r is unit-invariant, so cents cancel; the covariance is
# rescaled by /100 at the boundary.
_X_CORR_SQL = """
WITH s AS (
    SELECT l_returnflag,
           COUNT(*) AS n,
           CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(9,0)) AS DECIMAL(38,0)))
                AS DOUBLE) AS sx,
           CAST(SUM(CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                              AS DECIMAL(20,0)) AS DECIMAL(38,0)))
                AS DOUBLE) AS sy,
           CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(9,0)) *
                         CAST(l_quantity AS DECIMAL(9,0)) AS DECIMAL(38,0)))
                AS DOUBLE) AS sxx,
           CAST(SUM(CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                              AS DECIMAL(20,0)) *
                         CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                              AS DECIMAL(20,0)) AS DECIMAL(38,0)))
                AS DOUBLE) AS syy,
           CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(9,0)) *
                         CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                              AS DECIMAL(20,0)) AS DECIMAL(38,0)))
                AS DOUBLE) AS sxy
    FROM lineitem GROUP BY l_returnflag)
SELECT l_returnflag, n,
       (n * sxy - sx * sy)
         / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
         AS corr_qty_price,
       (n * sxy - sx * sy) / (CAST(n AS DOUBLE) * (n - 1)) / 100.0
         AS cov_qty_price
FROM s
"""


@_q("x_olap_corr", _X_CORR_SQL)
def x_olap_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped Pearson correlation + sample covariance of quantity vs
    price from ALGEBRAIC co-moments: the five sums accumulate exactly
    in integer units (quantities, price cents) as scale-0 decimals —
    order-insensitive, partial-agg friendly, and convertible to double
    with ONE rounding on both engines (see the scale note above the
    SQL) — then the correlation assembles in double with identical
    expression text on both engines. Built-in corr()/covar_samp() use
    streaming co-moment updates whose rounding depends on partitioning
    — unusable under a value-hash oracle; this formulation is
    bit-stable and one map-side-combined pass at any scale."""
    li = load_table(spark, sf_dir, "lineitem")
    qi = F.col("l_quantity").cast("decimal(9,0)")
    pc = (F.col("l_extendedprice").cast("decimal(18,2)") * F.lit(100)).cast(
        "decimal(20,0)"
    )
    s = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(qi.cast("decimal(38,0)")).cast("double").alias("sx"),
        F.sum(pc.cast("decimal(38,0)")).cast("double").alias("sy"),
        F.sum((qi * qi).cast("decimal(38,0)")).cast("double").alias("sxx"),
        F.sum((pc * pc).cast("decimal(38,0)")).cast("double").alias("syy"),
        F.sum((qi * pc).cast("decimal(38,0)")).cast("double").alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    return s.select(
        "l_returnflag",
        "n",
        (
            (n * sxy - sx * sy)
            / F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
        ).alias("corr_qty_price"),
        (
            (n * sxy - sx * sy)
            / (n.cast("double") * (n - F.lit(1)))
            / F.lit(100.0)
        ).alias("cov_qty_price"),
    )


# --------------------------------------------------------------------------
# OHLC downsampling (hourly bars, single-aggregation argmin/argmax)
# --------------------------------------------------------------------------

_X_OHLC_SQL = """
WITH e AS (
    SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS bar_ts,
           event_type, value, CAST(ts AS TIMESTAMP) AS ts, event_id
    FROM events),
rn AS (
    SELECT *,
           ROW_NUMBER() OVER (PARTITION BY bar_ts, event_type
                              ORDER BY ts, event_id) AS ro,
           ROW_NUMBER() OVER (PARTITION BY bar_ts, event_type
                              ORDER BY ts DESC, event_id DESC) AS rc
    FROM e)
SELECT bar_ts, event_type,
       MAX(CASE WHEN ro = 1 THEN value END) AS open_value,
       MAX(CASE WHEN rc = 1 THEN value END) AS close_value,
       MAX(value) AS high_value,
       MIN(value) AS low_value,
       COUNT(*) AS n_events
FROM rn GROUP BY 1, 2
"""


@_q("x_ts_ohlc", _X_OHLC_SQL)
def x_ts_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly OHLC bars per event type — the canonical time-series
    downsampling shape. Open/close are argmin/argmax by (ts, event_id)
    computed as MIN/MAX over a (ts, event_id, value) struct (Spark
    orders structs lexicographically), so the WHOLE bar is ONE
    map-side-combined aggregation — no window, no sort, one shuffle on
    the bar key. The oracle spells the same argmin/argmax as
    row_number windows; (ts, event_id) is a total order so both pick
    the same row. Values are raw doubles (picked, min'd, max'd — never
    summed), so no decimal staging is needed."""
    ev = load_events(spark, sf_dir)
    tagged = ev.select(
        F.date_trunc("hour", F.col("ts")).alias("bar_ts"),
        "event_type",
        F.struct("ts", "event_id", "value").alias("_s"),
        "value",
    )
    return (
        tagged.groupBy("bar_ts", "event_type")
        .agg(
            F.min("_s").alias("_open"),
            F.max("_s").alias("_close"),
            F.max("value").alias("high_value"),
            F.min("value").alias("low_value"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            "bar_ts",
            "event_type",
            F.col("_open.value").alias("open_value"),
            F.col("_close.value").alias("close_value"),
            "high_value",
            "low_value",
            "n_events",
        )
    )


# --------------------------------------------------------------------------
# Time-weighted average (TWAP) per type and day
# --------------------------------------------------------------------------

_X_TWAP_SQL = """
WITH e AS (
    SELECT event_type,
           CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
           CAST(value AS DECIMAL(18,2)) AS v,
           epoch_us(CAST(ts AS TIMESTAMP)) AS tus,
           event_id
    FROM events),
l AS (
    SELECT *,
           LEAD(tus) OVER (PARTITION BY event_type, day
                           ORDER BY tus, event_id) AS nxt
    FROM e)
SELECT event_type, day,
       CAST(SUM(v * (nxt - tus)) AS DOUBLE) / SUM(nxt - tus) AS twap_value,
       CAST(SUM(nxt - tus) AS BIGINT) AS total_dt_us
FROM l WHERE nxt IS NOT NULL GROUP BY 1, 2
"""


@_q("x_ts_twap", _X_TWAP_SQL)
def x_ts_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average value per (type, day) for irregular event
    streams: each observation holds until the next one, so its weight
    is the microsecond gap to the next event in the group (the day's
    last event carries no weight — interval-interior convention). One
    lead() window and one aggregation, both on the same (type, day)
    key. The weighted sum accumulates as DECIMAL (value quantized to
    cents × exact integer microseconds), so partial-agg order can't
    move the hash; the single double division is the boundary. At
    100 TB the decimal(38) headroom is the constraint to watch:
    microsecond weights × 9-digit values need ~33 digits per day-group
    — repartition to finer bars (hour) before the group grows past
    that."""
    ev = load_events(spark, sf_dir)
    from pyspark.sql import Window as W

    e = ev.select(
        "event_type",
        F.date_trunc("day", F.col("ts")).cast("date").alias("day"),
        F.col("value").cast("decimal(18,2)").alias("v"),
        F.unix_micros(F.col("ts")).alias("tus"),
        "event_id",
    )
    w = W.partitionBy("event_type", "day").orderBy("tus", "event_id")
    l = e.withColumn("nxt", F.lead("tus").over(w)).filter(
        F.col("nxt").isNotNull()
    )
    dt = F.col("nxt") - F.col("tus")
    return (
        l.groupBy("event_type", "day")
        .agg(
            F.sum(F.col("v") * dt).alias("_num"),
            F.sum(dt).alias("_den"),
        )
        .select(
            "event_type",
            "day",
            (F.col("_num").cast("double") / F.col("_den")).alias("twap_value"),
            # BIGINT pinned on both engines (DuckDB SUM(int) widens to
            # HUGEINT -> pandas float64 -> driver hash mismatch).
            F.col("_den").cast("long").alias("total_dt_us"),
        )
    )


# --------------------------------------------------------------------------
# Distribution windows: percent_rank / cume_dist / ntile
# --------------------------------------------------------------------------

_X_DISTWIN_SQL = """
SELECT o_orderpriority, o_orderkey,
       PERCENT_RANK() OVER w AS pr,
       CUME_DIST() OVER w AS cd,
       CAST(NTILE(4) OVER w AS INTEGER) AS quartile
FROM orders
WHERE o_orderdate >= TIMESTAMP '2000-01-01'
WINDOW w AS (PARTITION BY o_orderpriority
             ORDER BY o_totalprice, o_orderkey)
"""


@_q("x_olap_distribution_window", _X_DISTWIN_SQL)
def x_olap_distribution_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions (percent_rank, cume_dist, ntile)
    per priority group — one partitioned sort serves all three. The
    window orders by (totalprice, orderkey), a total order, so rank
    positions — and hence the (rank-1)/(n-1) and rank/n divisions,
    single double ops — are engine-independent; with ties allowed the
    three functions would still agree (rank semantics) but ntile's
    assignment within a tie would not."""
    from pyspark.sql import Window as W

    w = W.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
        .select(
            "o_orderpriority",
            "o_orderkey",
            F.percent_rank().over(w).alias("pr"),
            F.cume_dist().over(w).alias("cd"),
            F.ntile(4).over(w).cast("integer").alias("quartile"),
        )
    )


# --------------------------------------------------------------------------
# Winsorization: clamp outliers to exact per-group percentile bounds
# --------------------------------------------------------------------------

_X_WINSORIZE_SQL = """
WITH bounds AS (
    SELECT event_type AS bt,
           quantile_cont(value, 0.05) AS lo,
           quantile_cont(value, 0.95) AS hi
    FROM events GROUP BY event_type)
SELECT event_id, event_type,
       CASE WHEN value < lo THEN lo
            WHEN value > hi THEN hi
            ELSE value END AS value_winsorized,
       CAST(value < lo OR value > hi AS INTEGER) AS clipped
FROM events JOIN bounds ON event_type = bt
"""


@_q("x_events_winsorize", _X_WINSORIZE_SQL)
def x_events_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type winsorization at the exact [p5, p95] — the robust-stats
    pre-processing step before z-scoring/feature extraction. The
    bounds are exact interpolated percentiles (bit-identical to
    DuckDB's quantile_cont, same guarantee x_olap_percentiles pins)
    computed once per type and broadcast back; each row then takes a
    pure comparison/select — no arithmetic on the clamped value, so the
    output doubles are either original values or the shared bound,
    both hash-stable. Fact side never shuffles: group bounds are
    5 rows."""
    ev = load_events(spark, sf_dir)
    bounds = F.broadcast(
        ev.groupBy(F.col("event_type").alias("bt")).agg(
            F.expr("percentile(value, 0.05)").alias("lo"),
            F.expr("percentile(value, 0.95)").alias("hi"),
        )
    )
    v = F.col("value")
    return (
        ev.join(bounds, F.col("event_type") == F.col("bt"))
        .select(
            "event_id",
            "event_type",
            F.when(v < F.col("lo"), F.col("lo"))
            .when(v > F.col("hi"), F.col("hi"))
            .otherwise(v)
            .alias("value_winsorized"),
            ((v < F.col("lo")) | (v > F.col("hi")))
            .cast("integer")
            .alias("clipped"),
        )
    )


# --------------------------------------------------------------------------
# PageRank over the co-purchase graph (iterative; rows-only)
# --------------------------------------------------------------------------


def _pagerank_grid_sql(iterations: int = 8, scale: int = 1 << 40) -> str:
    """The full integer-grid PageRank chain unrolled as SQL CTEs over
    the co-purchase edge derivation (see graph.pagerank_int_grid for
    the arithmetic proof). Nonnegative integer division only, so
    DuckDB's // and Spark's div agree bit-for-bit."""
    parts = [
        """op AS MATERIALIZED (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
e0 AS MATERIALIZED (
  SELECT a.pk AS src, b.pk AS dst
  FROM op a JOIN op b ON a.ok = b.ok AND a.pk < b.pk
  GROUP BY 1, 2),
e AS MATERIALIZED (SELECT src, dst FROM e0 UNION ALL SELECT dst AS src, src AS dst FROM e0),
nodes AS MATERIALIZED (SELECT DISTINCT node FROM (
  SELECT src AS node FROM e UNION ALL SELECT dst AS node FROM e)),
nn AS MATERIALIZED (SELECT COUNT(*) AS n FROM nodes),
deg AS MATERIALIZED (SELECT src AS node, COUNT(*) AS deg FROM e GROUP BY src),
r0 AS MATERIALIZED (SELECT node, CAST({s} // nn.n AS BIGINT) AS r FROM nodes, nn)""".format(
            s=scale
        )
    ]
    for t in range(1, iterations + 1):
        parts.append(
            """c{t} AS MATERIALIZED (
  SELECT e.dst AS node, SUM(r.r // d.deg) AS contrib
  FROM e JOIN r{p} r ON r.node = e.src JOIN deg d ON d.node = e.src
  GROUP BY e.dst),
d{t} AS MATERIALIZED (
  SELECT COALESCE(SUM(r.r), 0) AS dm
  FROM r{p} r LEFT JOIN deg d ON d.node = r.node WHERE d.node IS NULL),
r{t} AS MATERIALIZED (
  SELECT n.node,
         CAST((3 * {s}) // (20 * nn.n)
              + (17 * ((dd.dm // nn.n) + COALESCE(c.contrib, 0))) // 20
              AS BIGINT) AS r
  FROM nodes n
  LEFT JOIN c{t} c ON c.node = n.node
  CROSS JOIN d{t} dd CROSS JOIN nn)""".format(t=t, p=t - 1, s=scale)
        )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"\nSELECT node, r AS rank_scaled FROM r{iterations}\n"
    )


@_q("x_graph_pagerank", _pagerank_grid_sql())
def x_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the part co-purchase graph: parts are linked when
    they appear in the same order (both directions), edge list bounded
    at per-order-lines^2 — the 'important products' ranking. 8 damped
    power iterations with dangling-mass redistribution.

    ORACLE-CHECKED since r14: the registered tier runs
    graph.pagerank_int_grid — ranks as 2^40-scaled integers, the
    damped update restated in nonnegative integer division — so the
    fixed 8-iteration chain unrolls into SQL CTEs
    (_pagerank_grid_sql) and the driver hash-checks every rank. The
    float tier (graph.pagerank, rows-only forever: per-node double
    sums depend on partial-agg merge order) remains for callers
    wanting textbook semantics; both tiers' agreement on ordering and
    a pure-Python differential are pinned in tests/test_graph.py."""
    from ..operators.graph import pagerank_int_grid
    from .mining_pack import _staged_pair_weights

    # symmetric digraph = the staged canonical (src < dst) edge table
    # plus its flipped half — the quadratic self-join runs once per
    # process (r14; see _staged_pair_weights), not once per consumer
    pw = _staged_pair_weights(spark, sf_dir).select("src", "dst")
    edges = pw.union(
        pw.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    return pagerank_int_grid(edges, iterations=8)
