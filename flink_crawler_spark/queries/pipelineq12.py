"""Wave 13: skyline queries and sequential changepoint detection.

  * pareto_skyline_orders — the 2-D skyline (Pareto frontier) operator
    (Borzsony/Kossmann/Stocker 2001): orders not dominated on
    (minimize price, maximize order date), via a distributed prefix-MAX
    instead of the textbook single-pass sort-filter scan.
  * event_cusum_alarms — per-user CUSUM changepoint detection (Page
    1954) over daily value sums, with the max(0, .) recurrence
    rewritten as cumsum-minus-running-min so it becomes pure window
    algebra (exact decimals, no sequential state).

Both exact-value DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.partitioning import distributed_running_max
from .base import dec_to_double_wide as _d2dw
from .base import dec_to_double_wide_sql as _d2dws
from .base import register, t

# ---------------------------------------------------------------------------
# pareto_skyline_orders
# ---------------------------------------------------------------------------


@register(
    "pareto_skyline_orders",
    oracle="""
WITH o AS (
  SELECT o_orderkey, o_totalprice AS price,
         CAST(epoch_ms(o_orderdate) AS BIGINT) AS order_ms
  FROM orders
),
p AS (SELECT price, max(order_ms) AS maxd FROM o GROUP BY price),
q AS (
  SELECT price, maxd,
         max(maxd) OVER (ORDER BY price
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prevmax
  FROM p
),
s AS (SELECT price, maxd FROM q WHERE prevmax IS NULL OR maxd > prevmax)
SELECT o.o_orderkey, o.price, o.order_ms
FROM o JOIN s ON s.price = o.price AND s.maxd = o.order_ms
""",
)
def pareto_skyline_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline: the orders no other order dominates on (cheaper OR
    equal, newer OR equal, strictly better somewhere) — the Pareto
    frontier operator of Borzsony/Kossmann/Stocker (ICDE 2001), the
    "best tradeoffs" query a quadratic NOT-EXISTS self-join answers at
    O(n^2).

    The linear formulation: collapse to one row per price (max date),
    then a row is on the frontier iff its date strictly exceeds the
    running max date over all STRICTLY lower prices (exclusive prefix
    max over the distinct-price domain) — equal-(price, date)
    duplicates stay mutually undominated and all survive. The prefix
    max is the new `distributed_running_max` two-phase operator (range
    partition + per-partition exclusive window + broadcast carry-ins),
    so no single-partition window exists anywhere; the final frontier
    is a small join back to the fact rows. The oracle runs the same
    algebra with a plain window (and the pytest pin cross-checks the
    quadratic dominance definition directly on a sample)."""
    o = t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_totalprice").alias("price"),
        F.unix_millis(F.col("o_orderdate").cast("timestamp_ltz")).alias("order_ms"),
    )
    p = o.groupBy("price").agg(F.max("order_ms").alias("maxd"))
    q = distributed_running_max(p, [F.col("price")], "maxd", out="prevmax")
    s = q.filter(F.col("prevmax").isNull() | (F.col("maxd") > F.col("prevmax")))
    return o.join(
        s.select("price", F.col("maxd").alias("order_ms")), ["price", "order_ms"]
    ).select("o_orderkey", "price", "order_ms")


# ---------------------------------------------------------------------------
# event_cusum_alarms
# ---------------------------------------------------------------------------

DAY_MS = 86_400_000


@register(
    "event_cusum_alarms",
    oracle=f"""
WITH daily AS (
  SELECT user_id, CAST(epoch_ms(ts) AS BIGINT) // {DAY_MS} AS dayn,
         CAST(sum(CAST(round(value, 6) AS DECIMAL(28,6))) AS DECIMAL(28,6)) AS x
  FROM events GROUP BY user_id, dayn
),
kk AS (
  SELECT CAST(round({_d2dws('sum(x)')} / count(*), 6) AS DECIMAL(28,6)) AS k
  FROM daily
),
d AS (
  SELECT user_id, dayn, x, daily_c.k,
         CAST(x - daily_c.k AS DECIMAL(28,6)) AS d
  FROM daily CROSS JOIN kk AS daily_c
),
c AS (
  SELECT user_id, dayn, k,
         CAST(sum(d) OVER (PARTITION BY user_id ORDER BY dayn
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS DECIMAL(28,6)) AS cc
  FROM d
),
s AS (
  SELECT user_id, dayn, k,
         CAST(cc - least(CAST(0 AS DECIMAL(28,6)),
                    min(cc) OVER (PARTITION BY user_id ORDER BY dayn
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
              AS DECIMAL(28,6)) AS ss
  FROM c
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_days,
       {_d2dws('max(ss)')} AS max_s,
       CAST(coalesce(min(CASE WHEN ss > 2 * k THEN dayn END), -1) AS BIGINT)
         AS alarm_day
FROM s GROUP BY user_id
""",
)
def event_cusum_alarms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user CUSUM changepoint detection over daily value sums (Page
    1954): S_t = max(0, S_(t-1) + x_t - k) with allowance k = the
    corpus-wide mean daily sum and alarm threshold h = 2k; report each
    user's peak statistic and first alarm day (-1 = never) — the
    burst/abuse detector a crawl or event pipeline runs per entity.

    The sequential max(0, .) recurrence is NOT window-expressible as
    written; the identity S_t = C_t - min(0, min_(j<=t) C_j) (C = the
    plain cumulative sum of x - k) turns it into two per-user window
    scans — exact DECIMAL algebra end to end, so both engines agree
    bit-for-bit including the knife-edge S > h comparisons. Windows
    partition by user (per-key volume is bounded; nothing global), the
    allowance is a broadcast scalar, and the final per-user aggregate
    is map-side combinable."""
    ev = t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "user_id",
        F.expr(f"unix_millis(cast(ts as timestamp_ltz)) div {DAY_MS}").alias("dayn"),
    ).agg(
        F.sum(F.round(F.col("value"), 6).cast("decimal(28,6)"))
        .cast("decimal(28,6)")
        .alias("x")
        # user-day rollup feeding the allowance scalar AND the series;
        # pin so the events scan + shuffle run once
    ).localCheckpoint(eager=True)
    kk = daily.agg(
        F.round(_d2dw(F.sum("x")) / F.count(F.lit(1)), 6)
        .cast("decimal(28,6)")
        .alias("k")
    )
    d = daily.crossJoin(F.broadcast(kk)).withColumn(
        "d", (F.col("x") - F.col("k")).cast("decimal(28,6)")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("dayn")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # r10 (caught by the first full sf0.1 oracle gate): both window
    # results are pinned back to DECIMAL(28,6). Without the down-cast,
    # sum() widens to DECIMAL(38,6) and the cc - least(...) subtraction
    # needs width 39 — over DuckDB's 38-digit maximum, so IT silently
    # promotes the whole ss expression to DOUBLE (Spark stays decimal),
    # and the ulp-level drift reorders equal-to-6dp ties at sf0.1
    # magnitudes. Values fit (28,6) by orders of magnitude, so the cast
    # is lossless and ss stays exact decimal algebra in both engines.
    # r11 (advice): the down-cast is non-ANSI, so on overflow Spark
    # yields silent NULLs while the DuckDB twin raises — divergent,
    # hard-to-diagnose failures. Guard the magnitude before each cast
    # (per-user cumulative sums are ~1e7 at sf0.1; 1e21 is one digit
    # inside DECIMAL(28,6)'s 1e22 cap, so the lossless claim holds
    # wherever the guard passes). One lazy CASE comparison per row.
    def _pin28(col, what):
        return (
            F.when(
                F.abs(col) >= F.lit(1e21),
                F.raise_error(
                    F.lit(
                        f"event_cusum_alarms: |{what}| >= 1e21 approaches "
                        "DECIMAL(28,6) overflow (silent NULL in Spark, raise "
                        "in DuckDB); widen the pinned precision"
                    )
                ),
            )
            .otherwise(col)
            .cast("decimal(28,6)")
        )

    c = d.withColumn("cc", _pin28(F.sum("d").over(w), "cc"))
    s = c.withColumn(
        "ss",
        _pin28(
            F.col("cc")
            - F.least(F.lit(0).cast("decimal(28,6)"), F.min("cc").over(w)),
            "ss",
        ),
    )
    return s.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_days"),
        _d2dw(F.max("ss")).alias("max_s"),
        F.coalesce(
            F.min(F.when(F.col("ss") > 2 * F.col("k"), F.col("dayn"))), F.lit(-1)
        )
        .cast("long")
        .alias("alarm_day"),
    )
