"""Advanced query shapes: as-of join and deep multi-table analytics.

These exercise the operator compositions that matter at 100 TB: the as-of
join's union+window plan (no range-join blowup), a 6-table star join where
dimension broadcast + one fact shuffle is the right physical plan, and an
aggregation-of-aggregation distribution query.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..datasets import load_table
from ..operators.asof import asof_join
from . import query
from .relational import _dsum

US_PER_DAY = 86_400_000_000


@query(
    "asof_events_orders",
    oracle="""
    WITH e AS (SELECT event_id, user_id, event_type, epoch_us(ts) AS t FROM events),
         o AS (SELECT o_custkey, epoch_us(o_orderdate) AS ot FROM orders)
    SELECT e.event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(m.ot) AS BIGINT) AS n_matched,
           CAST(SUM(CASE WHEN m.ot IS NOT NULL
                         THEN (e.t - m.ot) // 86400000000 END) AS BIGINT) AS sum_lag_days
    FROM e ASOF LEFT JOIN o m ON e.user_id = m.o_custkey AND e.t >= m.ot
    GROUP BY e.event_type ORDER BY e.event_type
    """,
)
def asof_events_orders(spark, sf_dir):
    """As-of join: each event matched to the user's latest order at-or-before
    the event time.  Our implementation (operators/asof.py) is union+window:
    one shuffle on the key, zero row expansion — the plan a banded range
    join cannot beat.  Oracle uses DuckDB's native ASOF JOIN."""
    events = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp_ltz")).alias("t"),
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.unix_micros(F.col("o_orderdate").cast("timestamp_ltz")).alias("ot"),
    )
    joined = asof_join(
        events,
        orders,
        left_key="user_id",
        right_key="o_custkey",
        left_time="t",
        right_time="ot",
        right_values=["ot"],
    )
    lag_days = F.expr("(t - ot) div 86400000000")
    return (
        joined.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count("ot").alias("n_matched"),
            F.sum(F.when(F.col("ot").isNotNull(), lag_days)).alias("sum_lag_days"),
        )
        .orderBy("event_type")
    )


@query(
    "q3_shipping_priority",
    oracle="""
    SELECT l.l_orderkey,
           CAST(SUM(CAST(CAST(l.l_extendedprice AS DECIMAL(18,2))
                         * (1 - CAST(l.l_discount AS DECIMAL(4,2)))
                         AS DECIMAL(30,4))) AS DOUBLE) AS revenue,
           strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
           o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1998-06-01 00:00:00'
    GROUP BY l.l_orderkey, strftime(o.o_orderdate, '%Y-%m-%d'), o.o_orderpriority
    ORDER BY revenue DESC, l_orderkey LIMIT 10
    """,
)
def q3_shipping_priority(spark, sf_dir):
    """TPC-H Q3 shape: 3-table join, filtered both sides, top-10 by revenue.
    customer is broadcast-sized; orders⋈lineitem shuffles on orderkey;
    TakeOrdered caps the result — no global sort materialization."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cutoff = F.lit("1998-06-01 00:00:00").cast("timestamp")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .where((o.o_orderdate < cutoff) & (li.l_shipdate > cutoff))
        .groupBy(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .agg(_dsum(rev, 4).alias("revenue"))
        .select("l_orderkey", "revenue", "orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


@query(
    "q5_local_supplier_volume",
    oracle="""
    SELECT r.r_name, n.n_name,
           CAST(SUM(CAST(CAST(l.l_extendedprice AS DECIMAL(18,2))
                         * (1 - CAST(l.l_discount AS DECIMAL(4,2)))
                         AS DECIMAL(30,4))) AS DOUBLE) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, n.n_name ORDER BY r_name, n_name
    """,
)
def q5_local_supplier_volume(spark, sf_dir):
    """TPC-H Q5 shape: 6-table star join (customer-orders-lineitem-supplier-
    nation-region) with the local-supplier correlation.  nation/region/
    supplier/customer are broadcast-sized dims; the single big shuffle is
    lineitem⋈orders on orderkey."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            _dsum(rev, 4).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("r_name", "n_name")
    )


@query(
    "q13_customer_distribution",
    oracle="""
    WITH per_cust AS (
        SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
        FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        GROUP BY c.c_custkey)
    SELECT CAST(c_count AS BIGINT) AS c_count,
           CAST(COUNT(*) AS BIGINT) AS custdist
    FROM per_cust GROUP BY c_count ORDER BY custdist DESC, c_count DESC
    """,
)
def q13_customer_distribution(spark, sf_dir):
    """TPC-H Q13 shape: aggregation of an aggregation (order-count
    distribution over customers), outer join preserving zero-order
    customers."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .select(F.col("c_count").cast("bigint"), F.col("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@query(
    "q10_returned_items",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 10000)
                         AS BIGINT)) AS DOUBLE) / 10000 AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name
    ORDER BY revenue DESC, c_custkey LIMIT 20
    """,
)
def q10_returned_items(spark, sf_dir):
    """TPC-H Q10 shape: revenue lost to returns per customer, top 20.
    The returnflag filter pushes to the lineitem scan; customer is
    broadcast-sized; TakeOrdered caps the output."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.where(F.col("l_returnflag") == "R")
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), c.c_custkey == o.o_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(
            _dsum(rev, 4).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@query(
    "q18_large_orders",
    oracle="""
    WITH big AS (
        SELECT l_orderkey,
               CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS DOUBLE)
                   / 100 AS total_qty
        FROM lineitem GROUP BY l_orderkey
        HAVING SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) > 21200)
    SELECT c.c_custkey, o.o_orderkey,
           strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
           o.o_totalprice, b.total_qty
    FROM big b
    JOIN orders o ON o.o_orderkey = b.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    ORDER BY o.o_totalprice DESC, o.o_orderkey LIMIT 100
    """,
)
def q18_large_orders(spark, sf_dir):
    """TPC-H Q18 shape: large-volume orders — aggregate lineitem per order,
    HAVING threshold, then enrich via joins.  The big fact aggregates FIRST
    (one shuffle on orderkey), and only the few surviving orders join onward
    — never the raw fact rows."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(
            _dsum(F.col("l_quantity"), 2).alias("total_qty"),
            F.sum(F.round(F.col("l_quantity") * 100, 0).cast("long")).alias("_cents"),
        )
        .where(F.col("_cents") > 21200)
        .drop("_cents")
    )
    return (
        big.join(o, o.o_orderkey == big.l_orderkey)
        .join(F.broadcast(c), c.c_custkey == o.o_custkey)
        .select(
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_totalprice",
            "total_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(100)
    )


@query(
    "q14_promo_revenue",
    oracle="""
    WITH j AS (
        SELECT p.p_type,
               CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 10000)
                    AS BIGINT) AS rev_scaled
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey)
    SELECT 100.0 * (CAST(SUM(CASE WHEN p_type LIKE 'PROMO%'
                                  THEN rev_scaled ELSE 0 END) AS DOUBLE) / 10000)
               / (CAST(SUM(rev_scaled) AS DOUBLE) / 10000) AS promo_revenue_pct,
           CAST(SUM(CASE WHEN p_type LIKE 'PROMO%' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_promo_items
    FROM j
    """,
)
def q14_promo_revenue(spark, sf_dir):
    """TPC-H Q14 shape: promo revenue share — conditional aggregation over a
    fact⋈dim join.  part broadcasts; the percent is one double division over
    exact scaled-long sums (identical on both engines)."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    is_promo = F.col("p_type").startswith("PROMO")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    return j.agg(
        (
            100.0
            * _dsum(F.when(is_promo, rev).otherwise(0.0), 4)
            / _dsum(rev, 4)
        ).alias("promo_revenue_pct"),
        F.sum(F.when(is_promo, 1).otherwise(0)).alias("n_promo_items"),
    )
