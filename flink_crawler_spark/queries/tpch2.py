"""SQL-breadth batch 2: the remaining TPC-H query shapes, adapted to the
driver's TPC-H-ish schema (no partsupp / l_commitdate / l_shipmode /
p_container — substitutes noted per query).

Each shape exercises a distinct planner/operator capability the reference
engine never had (SURVEY §4.1 "free upgrades"): correlated EXISTS,
scalar subqueries, conditional aggregation, disjunctive predicate
pushdown, window-argmax, count-distinct grouping sets, and
anti-join-with-aggregate. All sums of doubles go through the guarded
floor-split wide discipline (base.dsum_wide, r12 sweep) so Spark and
DuckDB hash identically regardless of aggregation order up to
|sum| < 9.0e15 — and fail loudly past it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .base import register, t


from .base import dsum_wide as _dsum_wide  # single decimal-discipline definition
from .base import dsum_wide_expr as _dwe
from .base import dsum_wide_expr_sql as _dwes
from .base import dsum_wide_sql as _dw
from .base import ts_lit as _ts


# ---------------------------------------------------------------------------
# Q4 — order-priority checking via correlated EXISTS (semi join with a
# non-equi conjunct). Reference analogue: frontier membership checks (§2.12).
@register(
    "order_priority_exists_q4",
    oracle="""
SELECT o.o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate)
GROUP BY o.o_orderpriority
""",
)
def order_priority_exists_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (l_commitdate→o_orderdate): LEFT SEMI with a
    compound (equi + range) condition; the date filter prunes the orders
    scan before the shuffle."""
    od = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-01-01 00:00:00"))
        & (F.col("o_orderdate") < _ts("1996-04-01 00:00:00"))
    )
    li = t(spark, sf_dir, "lineitem")
    cond = (li.l_orderkey == od.o_orderkey) & (li.l_shipdate > od.o_orderdate)
    return (
        od.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


# ---------------------------------------------------------------------------
# Q6 — forecasting revenue change: pure scan + filter + scalar agg.
# The whole WHERE clause must reach the parquet reader as PushedFilters.
@register(
    "forecast_revenue_q6",
    oracle=f"""
SELECT {_dw('l_extendedprice * l_discount', 'revenue')},
       CAST(count(*) AS BIGINT) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount >= 0.04 AND l_discount <= 0.06
  AND l_quantity < 24
""",
)
def forecast_revenue_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= _ts("1996-01-01 00:00:00"))
            & (F.col("l_shipdate") < _ts("1997-01-01 00:00:00"))
            & (F.col("l_discount") >= 0.04)
            & (F.col("l_discount") <= 0.06)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            _dsum_wide(F.col("l_extendedprice") * F.col("l_discount"), "revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# ---------------------------------------------------------------------------
# Q7 — volume shipping between two nations, by year: double dim chain
# (supplier-nation and customer-nation) with a symmetric pair predicate.
@register(
    "volume_shipping_q7",
    oracle=f"""
SELECT supp_nation, cust_nation, l_year,
       {_dw('volume', 'revenue')}
FROM (
  SELECT n1.n_name AS supp_nation,
         n2.n_name AS cust_nation,
         CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
         l.l_extendedprice * (1 - l.l_discount) AS volume
  FROM lineitem l
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN orders o   ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n1  ON n1.n_nationkey = s.s_nationkey
  JOIN nation n2  ON n2.n_nationkey = c.c_nationkey
  WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
      OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
) shipping
GROUP BY supp_nation, cust_nation, l_year
""",
)
def volume_shipping_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    su = t(spark, sf_dir, "supplier")
    od = t(spark, sf_dir, "orders")
    cu = t(spark, sf_dir, "customer")
    n1 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    n2 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    j = (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .join(F.broadcast(su), li.l_suppkey == su.s_suppkey)
        .join(F.broadcast(cu), od.o_custkey == cu.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nkey"))
        .filter(
            ((F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7"))
            | ((F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3"))
        )
    )
    return (
        j.withColumn("l_year", F.year("l_shipdate").cast("long"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(_dsum_wide(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
    )


# ---------------------------------------------------------------------------
# Q8 — market share: share of one supplier-nation inside one region's
# PROMO-part trade per year. Conditional aggregation + exact division
# of two decimal-disciplined sums.
@register(
    "market_share_q8",
    oracle=f"""
SELECT o_year,
       CAST({_dwes("CASE WHEN supp_nation = 'NATION_2' THEN volume ELSE 0 END")}
          / {_dwes('volume')} AS DOUBLE) AS mkt_share
FROM (
  SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
         l.l_extendedprice * (1 - l.l_discount) AS volume,
         n1.n_name AS supp_nation
  FROM lineitem l
  JOIN part p     ON p.p_partkey = l.l_partkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN orders o   ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n1  ON n1.n_nationkey = s.s_nationkey
  JOIN nation n2  ON n2.n_nationkey = c.c_nationkey
  JOIN region r   ON r.r_regionkey = n2.n_regionkey
  WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO'
) all_nations
GROUP BY o_year
""",
)
def market_share_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    pa = t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    su = t(spark, sf_dir, "supplier")
    od = t(spark, sf_dir, "orders")
    cu = t(spark, sf_dir, "customer")
    n1 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    n2 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_regionkey").alias("c_rkey")
    )
    re = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    j = (
        li.join(F.broadcast(pa), li.l_partkey == pa.p_partkey)
        .join(od, li.l_orderkey == od.o_orderkey)
        .join(F.broadcast(su), li.l_suppkey == su.s_suppkey)
        .join(F.broadcast(cu), od.o_custkey == cu.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nkey"))
        .join(F.broadcast(re), F.col("c_rkey") == F.col("r_regionkey"), "left_semi")
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    nat_vol = F.when(F.col("supp_nation") == "NATION_2", vol).otherwise(F.lit(0.0))
    return (
        j.withColumn("o_year", F.year("o_orderdate").cast("long"))
        .groupBy("o_year")
        .agg(
            _dsum_wide(nat_vol, "nat"),
            _dsum_wide(vol, "tot"),
        )
        .select(
            "o_year", (F.col("nat") / F.col("tot")).cast("double").alias("mkt_share")
        )
    )


# ---------------------------------------------------------------------------
# Q9 — profit by nation and year (ps_supplycost → p_retailprice/100 as the
# unit-cost substitute; same join/agg topology).
@register(
    "profit_by_nation_q9",
    oracle=f"""
SELECT nation, o_year,
       {_dw('amount', 'sum_profit')}
FROM (
  SELECT n.n_name AS nation,
         CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
         l.l_extendedprice * (1 - l.l_discount) - (p.p_retailprice / 100.0) * l.l_quantity AS amount
  FROM lineitem l
  JOIN part p     ON p.p_partkey = l.l_partkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN orders o   ON o.o_orderkey = l.l_orderkey
  JOIN nation n   ON n.n_nationkey = s.s_nationkey
  WHERE p.p_name LIKE '%red%'
) profit
GROUP BY nation, o_year
""",
)
def profit_by_nation_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    pa = t(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    su = t(spark, sf_dir, "supplier")
    od = t(spark, sf_dir, "orders")
    na = t(spark, sf_dir, "nation")
    j = (
        li.join(F.broadcast(pa), li.l_partkey == pa.p_partkey)
        .join(od, li.l_orderkey == od.o_orderkey)
        .join(F.broadcast(su), li.l_suppkey == su.s_suppkey)
        .join(F.broadcast(na), F.col("s_nationkey") == F.col("n_nationkey"))
    )
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - (
        F.col("p_retailprice") / F.lit(100.0)
    ) * F.col("l_quantity")
    return (
        j.select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
            amount.alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(_dsum_wide(F.col("amount"), "sum_profit"))
    )


# ---------------------------------------------------------------------------
# Q12 — shipmode priority classes (l_shipmode → l_returnflag as the mode
# column): conditional counts per class. G3 status-counter analogue with
# CASE WHEN instead of a second shuffle.
@register(
    "priority_class_counts_q12",
    oracle="""
SELECT l.l_returnflag,
       CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l.l_returnflag
""",
)
def priority_class_counts_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1998-01-01 00:00:00"))
    )
    od = t(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("long").alias("low_line_count"),
        )
    )


# ---------------------------------------------------------------------------
# Q13 — customer order-count distribution: LEFT OUTER join preserved
# through two levels of aggregation.
@register(
    "customer_distribution_q13",
    oracle="""
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM (
  SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS c_count
  FROM customer c
  LEFT JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY c.c_custkey
) c_orders
GROUP BY c_count
""",
)
def customer_distribution_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    cu = t(spark, sf_dir, "customer")
    od = t(spark, sf_dir, "orders")
    per_cust = (
        cu.join(od, cu.c_custkey == od.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


# ---------------------------------------------------------------------------
# Q14 — promo revenue share in one month: conditional agg + exact division.
@register(
    "promo_revenue_q14",
    oracle=f"""
SELECT CAST(100.0 * {_dwes("CASE WHEN p.p_type = 'PROMO' THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END")}
          / {_dwes('l.l_extendedprice * (1 - l.l_discount)')} AS DOUBLE) AS promo_revenue
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE l.l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
  AND l.l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
""",
)
def promo_revenue_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-03-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1997-04-01 00:00:00"))
    )
    pa = t(spark, sf_dir, "part")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", vol).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(pa), li.l_partkey == pa.p_partkey)
        .agg(_dsum_wide(promo, "promo"), _dsum_wide(vol, "total"))
        .select(
            (F.lit(100.0) * F.col("promo") / F.col("total"))
            .cast("double")
            .alias("promo_revenue")
        )
    )


# ---------------------------------------------------------------------------
# Q15 — top supplier(s) by quarterly revenue: window-max over an aggregate
# (the view + scalar-subquery formulation, expressed as argmax). Exact
# equality is safe because revenues are decimal-disciplined.
@register(
    "top_supplier_q15",
    oracle=f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         {_dw('l_extendedprice * (1 - l_discount)', 'total_revenue')}
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, r.total_revenue
FROM supplier s
JOIN revenue r ON r.supplier_no = s.s_suppkey
WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
""",
)
def top_supplier_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1996-04-01 00:00:00"))
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        _dsum_wide(F.col("l_extendedprice") * (1 - F.col("l_discount")), "total_revenue")
    )
    # scalar max + broadcast join instead of a global (single-partition)
    # window: at 100 TB the per-supplier aggregate is still millions of
    # rows, and an unpartitioned window would funnel them into one task
    mx = rev.agg(F.max("total_revenue").alias("max_revenue"))
    top = rev.join(F.broadcast(mx)).filter(
        F.col("total_revenue") == F.col("max_revenue")
    ).drop("max_revenue")
    su = t(spark, sf_dir, "supplier")
    return (
        su.join(F.broadcast(top), su.s_suppkey == top.supplier_no)
        .select("s_suppkey", "s_name", "total_revenue")
    )


# ---------------------------------------------------------------------------
# Q16 — supplier count by part descriptor: count-distinct after an
# exclusion anti-filter.
@register(
    "supplier_part_counts_q16",
    oracle="""
SELECT p.p_brand, p.p_type, p.p_size,
       CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand <> 'Brand#13'
  AND p.p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
GROUP BY p.p_brand, p.p_type, p.p_size
""",
)
def supplier_part_counts_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    pa = t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#13")
        & F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49)
    )
    li = t(spark, sf_dir, "lineitem")
    return (
        li.join(F.broadcast(pa), li.l_partkey == pa.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct(F.col("l_suppkey")).alias("supplier_cnt"))
    )


# ---------------------------------------------------------------------------
# Q19 — disjunctive predicate revenue: OR-of-ANDs over brand/size/quantity.
# Catalyst must still push the common part join and prune columns.
@register(
    "disjunctive_revenue_q19",
    oracle=f"""
SELECT {_dw('l.l_extendedprice * (1 - l.l_discount)', 'revenue')},
       CAST(count(*) AS BIGINT) AS n_items
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5  AND l.l_quantity >= 1  AND l.l_quantity <= 11)
   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10 AND l.l_quantity >= 10 AND l.l_quantity <= 20)
   OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 15 AND l.l_quantity >= 20 AND l.l_quantity <= 30)
""",
)
def disjunctive_revenue_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    pa = t(spark, sf_dir, "part")
    j = li.join(F.broadcast(pa), li.l_partkey == pa.p_partkey)
    c1 = (
        (F.col("p_brand") == "Brand#12")
        & F.col("p_size").between(1, 5)
        & F.col("l_quantity").between(1, 11)
    )
    c2 = (
        (F.col("p_brand") == "Brand#23")
        & F.col("p_size").between(1, 10)
        & F.col("l_quantity").between(10, 20)
    )
    c3 = (
        (F.col("p_brand") == "Brand#34")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(20, 30)
    )
    return j.filter(c1 | c2 | c3).agg(
        _dsum_wide(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


# ---------------------------------------------------------------------------
# Q20 — nested IN with a HAVING threshold: suppliers who shipped a large
# PROMO volume in 1997. Quantities are integral doubles -> exact sums.
@register(
    "promo_volume_suppliers_q20",
    oracle="""
SELECT s.s_suppkey, s.s_name
FROM supplier s
WHERE s.s_suppkey IN (
  SELECT l.l_suppkey
  FROM lineitem l
  JOIN part p ON p.p_partkey = l.l_partkey
  WHERE p.p_type = 'PROMO'
    AND l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  GROUP BY l.l_suppkey
  HAVING sum(l.l_quantity) > 300
)
""",
)
def promo_volume_suppliers_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1998-01-01 00:00:00"))
    )
    pa = t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    big = (
        li.join(F.broadcast(pa), li.l_partkey == pa.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 300)
    )
    su = t(spark, sf_dir, "supplier")
    return su.join(
        F.broadcast(big), su.s_suppkey == big.l_suppkey, "left_semi"
    ).select("s_suppkey", "s_name")


# ---------------------------------------------------------------------------
# Q21 — waiting suppliers (adapted: l_commitdate unavailable): suppliers of
# NATION_1 that were the LAST shipper in multi-supplier orders. Uses a
# per-order aggregate joined back to the fact — the exists/not-exists pair
# of the original becomes max-shipdate + distinct-supplier-count.
@register(
    "last_shipper_q21",
    oracle="""
WITH per_order AS (
  SELECT l_orderkey,
         max(l_shipdate) AS max_ship,
         count(DISTINCT l_suppkey) AS nsupp
  FROM lineitem GROUP BY l_orderkey
),
last_ship AS (
  SELECT DISTINCT l.l_orderkey, l.l_suppkey
  FROM lineitem l
  JOIN per_order po ON po.l_orderkey = l.l_orderkey
  WHERE l.l_shipdate = po.max_ship AND po.nsupp >= 2
)
SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
FROM last_ship ls
JOIN supplier s ON s.s_suppkey = ls.l_suppkey
JOIN nation n   ON n.n_nationkey = s.s_nationkey
WHERE n.n_name = 'NATION_1'
GROUP BY s.s_name
""",
)
def last_shipper_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    per_order = li.groupBy("l_orderkey").agg(
        F.max("l_shipdate").alias("max_ship"),
        F.count_distinct("l_suppkey").alias("nsupp"),
    )
    last_ship = (
        li.join(per_order, "l_orderkey")
        .filter((F.col("l_shipdate") == F.col("max_ship")) & (F.col("nsupp") >= 2))
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    su = t(spark, sf_dir, "supplier")
    na = t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_1")
    return (
        last_ship.join(F.broadcast(su), last_ship.l_suppkey == su.s_suppkey)
        .join(F.broadcast(na), F.col("s_nationkey") == F.col("n_nationkey"), "left_semi")
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


# ---------------------------------------------------------------------------
# Q22 — idle customers (adapted: every synthetic customer has >=1 order, so
# "no orders at all" is vacuous — the anti side is orders above a price
# threshold instead): scalar subquery threshold + NOT EXISTS anti join.
# The average threshold is decimal-disciplined so the > comparison is
# bit-identical across engines.
@register(
    "idle_customers_q22",
    oracle=f"""
SELECT c.c_mktsegment,
       CAST(count(*) AS BIGINT) AS numcust,
       {_dw('c.c_acctbal', 'totacctbal')}
FROM customer c
WHERE c.c_acctbal > (
        SELECT {_dwes('c2.c_acctbal')}
               / CAST(count(*) AS DOUBLE)
        FROM customer c2 WHERE c2.c_acctbal > 0.0)
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
GROUP BY c.c_mktsegment
""",
)
def idle_customers_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    cu = t(spark, sf_dir, "customer")
    pos = cu.filter(F.col("c_acctbal") > 0.0).agg(
        (_dwe(F.col("c_acctbal")) / F.count(F.lit(1)).cast("double")).alias("thr")
    )
    od = t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    rich = cu.join(F.broadcast(pos)).filter(F.col("c_acctbal") > F.col("thr"))
    no_orders = rich.join(od, rich.c_custkey == od.o_custkey, "left_anti")
    return no_orders.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("numcust"),
        _dsum_wide(F.col("c_acctbal"), "totacctbal"),
    )


# ---------------------------------------------------------------------------
# Q2-shape substitute (no partsupp): per-nation argmax — the "min-cost
# supplier per part" correlated-subquery pattern as a deterministic
# window-argmax (ties broken by key).
@register(
    "top_customer_per_nation",
    oracle="""
SELECT n_name, c_custkey, c_name, round(c_acctbal, 6) AS acctbal
FROM (
  SELECT n.n_name, c.c_custkey, c.c_name, c.c_acctbal,
         row_number() OVER (PARTITION BY n.n_name
                            ORDER BY c.c_acctbal DESC, c.c_custkey ASC) AS rn
  FROM customer c
  JOIN nation n ON n.n_nationkey = c.c_nationkey
)
WHERE rn = 1
""",
)
def top_customer_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    cu = t(spark, sf_dir, "customer")
    na = t(spark, sf_dir, "nation")
    j = cu.join(F.broadcast(na), cu.c_nationkey == na.n_nationkey)
    w = Window.partitionBy("n_name").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey").asc()
    )
    return (
        j.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "n_name", "c_custkey", "c_name", F.round("c_acctbal", 6).alias("acctbal")
        )
    )


# ---------------------------------------------------------------------------
# Q11-shape substitute (no partsupp): nation share of global supplier
# account balance with a scalar-subquery HAVING threshold.
@register(
    "nation_balance_share_q11",
    oracle=f"""
SELECT n.n_name,
       {_dw('s.s_acctbal', 'balance')}
FROM supplier s
JOIN nation n ON n.n_nationkey = s.s_nationkey
GROUP BY n.n_name
HAVING {_dwes('s.s_acctbal')} >
       (SELECT {_dwes('s2.s_acctbal')} * 0.04
        FROM supplier s2)
""",
)
def nation_balance_share_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    su = t(spark, sf_dir, "supplier")
    na = t(spark, sf_dir, "nation")
    per_nation = (
        su.join(F.broadcast(na), su.s_nationkey == na.n_nationkey)
        .groupBy("n_name")
        .agg(_dsum_wide(F.col("s_acctbal"), "balance"))
    )
    total = su.agg((_dwe(F.col("s_acctbal")) * F.lit(0.04)).alias("thr"))
    return per_nation.join(F.broadcast(total)).filter(
        F.col("balance") > F.col("thr")
    ).select("n_name", "balance")


# ---------------------------------------------------------------------------
# Q2 — minimum-cost supplier (the one TPC-H shape previously missing).
# No partsupp table in the synthetic schema, so supply cost is derived
# from lineitem as the minimum observed unit price per (part, supplier).
# The correlated "= (SELECT min(...))" is expressed as a window-min +
# filter — semantically identical, and Catalyst keeps the window on the
# same partitioning as the preceding aggregate. Dimension filters (part
# type/size, supplier region) are broadcast-joined BEFORE the big
# aggregate so the lineitem scan is pruned early (§4.1 early-filtering).
# Costs compared as DECIMAL(28,6) so min/equality are exact across engines.
@register(
    "min_cost_supplier_q2",
    oracle="""
WITH ps AS (
  SELECT l.l_partkey, l.l_suppkey,
         min(CAST(round(l.l_extendedprice / l.l_quantity, 6) AS DECIMAL(28,6))) AS supplycost
  FROM lineitem l GROUP BY l.l_partkey, l.l_suppkey
), elig AS (
  SELECT p.p_partkey, p.p_brand, s.s_name, n.n_name, ps.supplycost,
         min(ps.supplycost) OVER (PARTITION BY p.p_partkey) AS mincost
  FROM part p
  JOIN ps ON ps.l_partkey = p.p_partkey
  JOIN supplier s ON s.s_suppkey = ps.l_suppkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  JOIN region r ON r.r_regionkey = n.n_regionkey
  WHERE p.p_type = 'PROMO' AND p.p_size <= 10 AND r.r_name = 'ASIA'
)
SELECT p_partkey, p_brand, s_name, n_name,
       CAST(supplycost AS DOUBLE) AS supplycost
FROM elig WHERE supplycost = mincost
""",
)
def min_cost_supplier_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    pa = t(spark, sf_dir, "part").filter(
        (F.col("p_type") == "PROMO") & (F.col("p_size") <= 10)
    )
    re = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    na = t(spark, sf_dir, "nation").join(
        F.broadcast(re), F.col("n_regionkey") == F.col("r_regionkey")
    )
    su = t(spark, sf_dir, "supplier").join(
        F.broadcast(na), F.col("s_nationkey") == F.col("n_nationkey")
    )
    pruned = (
        li.join(F.broadcast(pa), li.l_partkey == pa.p_partkey)
        .join(F.broadcast(su), li.l_suppkey == su.s_suppkey)
    )
    ps = pruned.groupBy("p_partkey", "p_brand", "s_name", "n_name").agg(
        F.min(
            F.round(F.col("l_extendedprice") / F.col("l_quantity"), 6).cast(
                "decimal(28,6)"
            )
        ).alias("supplycost")
    )
    w = Window.partitionBy("p_partkey")
    return (
        ps.withColumn("mincost", F.min("supplycost").over(w))
        .filter(F.col("supplycost") == F.col("mincost"))
        .select(
            "p_partkey",
            "p_brand",
            "s_name",
            "n_name",
            F.col("supplycost").cast("double").alias("supplycost"),
        )
    )
