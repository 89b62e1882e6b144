"""Join suite + flagship aggregation over the star schema.

The reference has no relational equi-joins (SURVEY §2.12) but the Spark
engine implements/tests the standard suite: broadcast dimension chains,
semi/anti for frontier-vs-seen dedup, and the TPC-H-Q1-shaped pricing
summary as the flagship aggregate.

Sums of doubles go through DECIMAL internally (order-independent, exact)
and come out as DOUBLE so both engines hash identically regardless of
parallel aggregation order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .base import register, t

from .base import dsum_wide as _dsum_wide  # revenue-scale sums (>2^53/1e6 bound)
from .base import dsum_wide_sql as _dw
from .base import dsum_wide_expr as _dwe  # unaliased (composites)
from .base import dsum_wide_expr_sql as _dwes


@register(
    "pricing_summary",
    # r11 (caught by the first sf1.0-equivalent magnitude gate): the
    # price sums cross dsum's 9.007e9 one-step-cast engine-identity
    # bound at sf1.0 (~3e11) — all four sums ride the floor-split wide
    # form on both sides (base.dsum_wide docstring has the proof)
    oracle=f"""
SELECT l_returnflag,
       l_linestatus,
       {_dw('l_quantity', 'sum_qty')},
       {_dw('l_extendedprice', 'sum_base_price')},
       {_dw('l_extendedprice * (1 - l_discount)', 'sum_disc_price')},
       {_dw('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 'sum_charge')},
       CAST(count(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: TPC-H Q1-shaped pricing summary (one scan, one shuffle,
    map-side partial aggregation; the shipdate filter pushes into the
    parquet scan)."""
    li = t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dsum_wide(F.col("l_quantity"), "sum_qty"),
            _dsum_wide(F.col("l_extendedprice"), "sum_base_price"),
            _dsum_wide(disc_price, "sum_disc_price"),
            _dsum_wide(charge, "sum_charge"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "revenue_by_region",
    # r11 magnitude-gate fix: per-region revenue ~6e10 at sf1.0 crosses
    # the dsum one-step-cast bound — wide form (see pricing_summary)
    oracle=f"""
SELECT r.r_name,
       {_dw('l.l_extendedprice * (1 - l.l_discount)', 'revenue')},
       CAST(count(*) AS BIGINT) AS n_items
FROM lineitem l
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
JOIN region r   ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name
""",
)
def revenue_by_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast dimension chain (J2 analogue): every dim side is small ->
    Catalyst broadcasts; the only shuffle is the final tiny groupBy."""
    li = t(spark, sf_dir, "lineitem")
    od = t(spark, sf_dir, "orders")
    cu = t(spark, sf_dir, "customer")
    na = t(spark, sf_dir, "nation")
    re = t(spark, sf_dir, "region")
    joined = (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .join(F.broadcast(cu), od.o_custkey == cu.c_custkey)
        .join(F.broadcast(na), cu.c_nationkey == na.n_nationkey)
        .join(F.broadcast(re), na.n_regionkey == re.r_regionkey)
    )
    return joined.groupBy("r_name").agg(
        _dsum_wide(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


@register(
    "seen_urls_semi_join",
    oracle="""
SELECT c.c_custkey, c.c_name
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
""",
)
def seen_urls_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI — the 'already-seen frontier' membership check."""
    cu = t(spark, sf_dir, "customer")
    od = t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return cu.join(od, cu.c_custkey == od.o_custkey, "left_semi").select("c_custkey", "c_name")


@register(
    "new_urls_anti_join",
    oracle="""
SELECT c.c_custkey, c.c_mktsegment
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 250000)
""",
)
def new_urls_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI — 'never-seen URLs' (new outlinks not in the URL DB)."""
    cu = t(spark, sf_dir, "customer")
    od = t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 250000)
    return cu.join(od, cu.c_custkey == od.o_custkey, "left_anti").select(
        "c_custkey", "c_mktsegment"
    )


@register(
    "orders_priority_rollup",
    # r12 sweep: every oracle sum rides the guarded floor-split wide
    # form (base.dsum_wide) so engine identity holds to |sum| < 9.0e15
    oracle=f"""
SELECT o_orderpriority,
       o_orderstatus,
       CAST(count(*) AS BIGINT) AS n,
       {_dw('o_totalprice', 'total')}
FROM orders
WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
GROUP BY o_orderpriority, o_orderstatus
""",
)
def orders_priority_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = t(spark, sf_dir, "orders")
    return (
        od.filter(F.col("o_orderdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp_ntz"))
        .groupBy("o_orderpriority", "o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"), _dsum_wide(F.col("o_totalprice"), "total"))
    )


@register(
    "shipping_priority_q3",
    oracle=f"""
SELECT l.l_orderkey,
       {_dw('l.l_extendedprice * (1 - l.l_discount)', 'revenue')},
       o.o_orderdate, o.o_orderpriority
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
  AND l.l_shipdate  > TIMESTAMP '1995-03-15 00:00:00'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, o.o_orderdate ASC, l.l_orderkey ASC
LIMIT 10
""",
)
def shipping_priority_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter broadcast into a fact join,
    aggregate, global top-10 (TakeOrderedAndProject). The two date
    filters push into the scans."""
    cu = t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    od = t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1995-03-15 00:00:00").cast("timestamp_ntz")
    )
    li = t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15 00:00:00").cast("timestamp_ntz")
    )
    joined = li.join(od, li.l_orderkey == od.o_orderkey).join(
        F.broadcast(cu), od.o_custkey == cu.c_custkey
    )
    return (
        joined.groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(_dsum_wide(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("o_orderdate").asc(), F.col("l_orderkey").asc())
        .limit(10)
    )


@register(
    "returned_items_q10",
    oracle=f"""
SELECT c.c_custkey, c.c_name,
       {_dw('l.l_extendedprice * (1 - l.l_discount)', 'revenue')},
       round(c.c_acctbal, 6) AS c_acctbal, n.n_name
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
  AND l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
ORDER BY revenue DESC, c.c_custkey ASC
LIMIT 20
""",
)
def returned_items_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: returned-item revenue per customer over a date
    window, top-20. Fact-fact join shuffles on the order key; dims
    broadcast."""
    cu = t(spark, sf_dir, "customer")
    na = t(spark, sf_dir, "nation")
    od = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-04-01 00:00:00").cast("timestamp_ntz"))
    )
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    joined = (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .join(cu, od.o_custkey == cu.c_custkey)
        .join(F.broadcast(na), cu.c_nationkey == na.n_nationkey)
    )
    return (
        joined.groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(_dsum_wide(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .select(
            "c_custkey", "c_name", "revenue", F.round("c_acctbal", 6).alias("c_acctbal"), "n_name"
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


@register(
    "revenue_rollup",
    # r11 magnitude-gate fix: the ROLLUP grand-total row is the whole
    # corpus revenue (~3e11 at sf1.0) — wide form (see pricing_summary)
    oracle=f"""
SELECT r.r_name, n.n_name,
       {_dw('l.l_extendedprice * (1 - l.l_discount)', 'revenue')}
FROM lineitem l
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
JOIN region r   ON n.n_regionkey = r.r_regionkey
GROUP BY ROLLUP (r.r_name, n.n_name)
""",
)
def revenue_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical ROLLUP aggregate (region -> nation -> grand total) —
    one pass, Spark expands the grouping sets map-side."""
    li = t(spark, sf_dir, "lineitem")
    od = t(spark, sf_dir, "orders")
    cu = t(spark, sf_dir, "customer")
    na = t(spark, sf_dir, "nation")
    re = t(spark, sf_dir, "region")
    joined = (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .join(F.broadcast(cu), od.o_custkey == cu.c_custkey)
        .join(F.broadcast(na), cu.c_nationkey == na.n_nationkey)
        .join(F.broadcast(re), na.n_regionkey == re.r_regionkey)
    )
    return joined.rollup("r_name", "n_name").agg(
        _dsum_wide(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue")
    )


@register(
    "large_orders_q18",
    # r12: HAVING compares the SAME wide double both engines filter on
    oracle=f"""
SELECT o.o_orderkey, o.o_custkey,
       {_dw('l.l_quantity', 'total_qty')}
FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderkey, o.o_custkey
HAVING {_dwes('l.l_quantity')} > 250
ORDER BY total_qty DESC, o.o_orderkey ASC
LIMIT 100
""",
)
def large_orders_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: group-filter on an aggregate (HAVING) + top-k —
    the frontier-style 'hot keys above a threshold' query."""
    od = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    g = (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .groupBy("o_orderkey", "o_custkey")
        .agg(_dsum_wide(F.col("l_quantity"), "total_qty"))
        .filter(F.col("total_qty") > 250)
    )
    return g.orderBy(F.col("total_qty").desc(), F.col("o_orderkey").asc()).limit(100)


@register(
    "small_quantity_revenue_q17",
    oracle=f"""
WITH pa AS (
  SELECT l_partkey, avg(l_quantity) AS avg_qty FROM lineitem GROUP BY l_partkey
)
SELECT {_dwes('l.l_extendedprice')} / 7.0 AS avg_yearly,
       CAST(count(*) AS BIGINT) AS n_items
FROM lineitem l JOIN pa ON l.l_partkey = pa.l_partkey
WHERE l.l_quantity < 0.5 * pa.avg_qty
""",
)
def small_quantity_revenue_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated per-key average as a self-join
    (Catalyst decorrelates the subquery to exactly this plan)."""
    li = t(spark, sf_dir, "lineitem")
    pa = li.groupBy("l_partkey").agg(F.avg("l_quantity").alias("avg_qty"))
    j = li.join(pa, "l_partkey").filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
    return j.agg(
        (_dwe(F.col("l_extendedprice")) / 7.0).alias("avg_yearly"),
        F.count(F.lit(1)).alias("n_items"),
    )


@register(
    "topk_orders_global",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 100
""",
)
def topk_orders_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k (FetchQueue T1 shape on raw data) ->
    TakeOrderedAndProject, no full sort at any scale."""
    od = t(spark, sf_dir, "orders")
    return (
        od.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(100)
    )
