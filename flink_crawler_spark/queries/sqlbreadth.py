"""SQL-breadth batch 4: planner surfaces the earlier batches didn't touch
— explicit GROUPING SETS, pivot, INTERSECT/EXCEPT set ops, date-spine
gap-fill (sequence + explode), and rank-distribution windows.

All are Catalyst built-ins ("free upgrades" per SURVEY §4.1 — the
reference engine has none of these); each gets a full DuckDB value
oracle. Grouping-set outputs label super-aggregate rows via
coalesce(col,'ALL') instead of grouping_id() so the oracle never depends
on engine-specific grouping-bitmask conventions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .base import register, t
from .base import dsum as _dsum

_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]


# ---------------------------------------------------------------------------
# Explicit GROUPING SETS (finer than CUBE/ROLLUP, both already covered):
# the four marginal views of the orders fact in ONE aggregation pass —
# Spark expands the sets map-side, so the fact table is still scanned once.
@register(
    "grouping_sets_priority_status",
    oracle="""
SELECT coalesce(o_orderpriority, 'ALL') AS priority,
       coalesce(o_orderstatus, 'ALL') AS status,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(round(o_totalprice, 6) AS DECIMAL(28,6))) AS DOUBLE) AS revenue
FROM orders
GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus),
                        (o_orderpriority, o_orderstatus), ())
""",
)
def grouping_sets_priority_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = t(spark, sf_dir, "orders")
    g = od.groupingSets(
        [["o_orderpriority"], ["o_orderstatus"], ["o_orderpriority", "o_orderstatus"], []],
        "o_orderpriority",
        "o_orderstatus",
    ).agg(
        F.count(F.lit(1)).alias("n"),
        _dsum(F.col("o_totalprice"), "revenue"),
    )
    return g.select(
        F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
        F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
        "n",
        "revenue",
    )


# ---------------------------------------------------------------------------
# Pivot: order counts per year × priority, priorities as columns. The
# value list is pinned so Spark skips the extra distinct-values job (at
# scale an unpinned pivot is TWO passes over the fact table).
@register(
    "pivot_priority_by_year",
    oracle="""
SELECT CAST(date_part('year', o_orderdate) AS BIGINT) AS year,
       CAST(count(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS BIGINT) AS "1-URGENT",
       CAST(count(*) FILTER (WHERE o_orderpriority = '2-HIGH') AS BIGINT) AS "2-HIGH",
       CAST(count(*) FILTER (WHERE o_orderpriority = '3-MEDIUM') AS BIGINT) AS "3-MEDIUM",
       CAST(count(*) FILTER (WHERE o_orderpriority = '4-NOT SPECIFIED') AS BIGINT) AS "4-NOT SPECIFIED",
       CAST(count(*) FILTER (WHERE o_orderpriority = '5-LOW') AS BIGINT) AS "5-LOW"
FROM orders GROUP BY year
""",
)
def pivot_priority_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = t(spark, sf_dir, "orders")
    return (
        od.select(F.year("o_orderdate").cast("bigint").alias("year"), "o_orderpriority")
        .groupBy("year")
        .pivot("o_orderpriority", _PRIORITIES)
        .agg(F.count(F.lit(1)))
    )


# ---------------------------------------------------------------------------
# INTERSECT / EXCEPT (distinct set semantics) — the remaining §2.11 set
# ops beyond union: customers active in both 1996 and 1997, only-1996,
# and only-1997, tagged in one frame.
@register(
    "customer_set_ops",
    oracle="""
WITH y96 AS (SELECT DISTINCT o_custkey FROM orders
             WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
               AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'),
y97 AS (SELECT DISTINCT o_custkey FROM orders
        WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00')
SELECT o_custkey, 'both' AS tag FROM (SELECT o_custkey FROM y96 INTERSECT SELECT o_custkey FROM y97)
UNION ALL
SELECT o_custkey, 'only_1996' FROM (SELECT o_custkey FROM y96 EXCEPT SELECT o_custkey FROM y97)
UNION ALL
SELECT o_custkey, 'only_1997' FROM (SELECT o_custkey FROM y97 EXCEPT SELECT o_custkey FROM y96)
""",
)
def customer_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = t(spark, sf_dir, "orders")

    def year(y):
        return od.filter(
            (F.col("o_orderdate") >= F.lit(f"{y}-01-01 00:00:00").cast("timestamp_ntz"))
            & (F.col("o_orderdate") < F.lit(f"{y + 1}-01-01 00:00:00").cast("timestamp_ntz"))
        ).select("o_custkey").distinct()

    y96, y97 = year(1996), year(1997)
    return (
        y96.intersect(y97).withColumn("tag", F.lit("both"))
        .unionByName(y96.subtract(y97).withColumn("tag", F.lit("only_1996")))
        .unionByName(y97.subtract(y96).withColumn("tag", F.lit("only_1997")))
    )


# ---------------------------------------------------------------------------
# Date-spine gap-fill: generate the full daily calendar between the first
# and last order (sequence + explode — no driver-side loop, the spine is
# a single-row aggregate expanded executor-side) and zero-fill days with
# no orders. The time-series densification every monitoring/training
# pipeline needs; missing days are invisible to a plain groupBy.
@register(
    "gap_fill_daily_revenue",
    oracle="""
WITH bounds AS (SELECT CAST(min(o_orderdate) AS DATE) lo, CAST(max(o_orderdate) AS DATE) hi FROM orders),
spine AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY))::DATE AS d FROM bounds),
daily AS (SELECT CAST(o_orderdate AS DATE) AS d,
                 count(*) AS n,
                 CAST(sum(CAST(round(o_totalprice, 6) AS DECIMAL(28,6))) AS DOUBLE) AS rev
          FROM orders GROUP BY 1)
SELECT strftime(s.d, '%Y-%m-%d') AS day,
       CAST(coalesce(daily.n, 0) AS BIGINT) AS n_orders,
       CAST(coalesce(daily.rev, 0.0) AS DOUBLE) AS revenue
FROM spine s LEFT JOIN daily ON daily.d = s.d
""",
)
def gap_fill_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = t(spark, sf_dir, "orders").select(
        F.to_date("o_orderdate").alias("d"), "o_totalprice"
    )
    bounds = od.agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
    spine = bounds.select(F.explode(F.sequence("lo", "hi")).alias("d"))
    daily = od.groupBy("d").agg(
        F.count(F.lit(1)).alias("n"), _dsum(F.col("o_totalprice"), "rev")
    )
    return spine.join(daily, "d", "left").select(
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        F.coalesce("n", F.lit(0)).cast("bigint").alias("n_orders"),
        F.coalesce("rev", F.lit(0.0)).cast("double").alias("revenue"),
    )


# ---------------------------------------------------------------------------
# Rank distributions: percent_rank + cume_dist of order value within each
# priority class — the remaining ranking-window family (row_number, rank,
# ntile, percentiles are covered elsewhere). Both are deterministic under
# ties (equal values get equal ranks), so doubles hash identically.
@register(
    "order_rank_distributions",
    oracle="""
SELECT o_orderkey, o_orderpriority,
       round(percent_rank() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice), 6) AS pr,
       round(cume_dist() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice), 6) AS cd
FROM orders
""",
)
def order_rank_distributions(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice")
    return od.select(
        "o_orderkey",
        "o_orderpriority",
        F.round(F.percent_rank().over(w), 6).alias("pr"),
        F.round(F.cume_dist().over(w), 6).alias("cd"),
    )
