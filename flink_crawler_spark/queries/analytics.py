"""Analytics breadth: CUBE grouping sets, exact percentiles, ntile
deciles, running totals — aggregate/window shapes the reference engine
never had (SURVEY §4.1 "free upgrades" via Catalyst) that a
training-data pipeline leans on for corpus statistics.

Decimal discipline as everywhere: any summed double routes through
round(x,6)::DECIMAL(28,6) so partition order can't move a bit. Window
running sums accumulate in DECIMAL (associative), not double.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .base import EV_MS, register, t


from .base import dec_to_double_wide as _d2dw  # guarded floor-split cast
from .base import dec_to_double_wide_sql as _d2dws
from .base import dsum_wide as _dsum_wide  # single decimal-discipline definition
from .base import dsum_wide_sql as _dw


@register(
    "order_percentiles",
    oracle="""
SELECT o_orderpriority,
       quantile_cont(o_totalprice, 0.5) AS p50,
       quantile_cont(o_totalprice, 0.9) AS p90,
       quantile_cont(o_totalprice, 0.99) AS p99,
       CAST(count(*) AS BIGINT) AS n
FROM orders GROUP BY o_orderpriority
""",
)
def order_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear-interpolated percentiles (Spark `percentile` ==
    DuckDB `quantile_cont`, verified bit-for-bit): one shuffle, the
    per-group sort happens inside the aggregate. The approx path at
    100 TB is `approx_percentile` (t-digest) — same query shape."""
    od = t(spark, sf_dir, "orders")
    return od.groupBy("o_orderpriority").agg(
        F.expr("percentile(o_totalprice, 0.5)").alias("p50"),
        F.expr("percentile(o_totalprice, 0.9)").alias("p90"),
        F.expr("percentile(o_totalprice, 0.99)").alias("p99"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "revenue_cube",
    oracle=f"""
SELECT n.n_name,
       CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
       {_dw('o.o_totalprice', 'revenue')},
       CAST(count(*) AS BIGINT) AS n_orders
FROM orders o
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n   ON n.n_nationkey = c.c_nationkey
GROUP BY CUBE (n.n_name, CAST(year(o.o_orderdate) AS BIGINT))
""",
)
def revenue_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (nation, year): all four grouping sets in one pass —
    Catalyst expands to a single Expand + hash aggregate (one shuffle),
    not four scans."""
    od = t(spark, sf_dir, "orders")
    cu = t(spark, sf_dir, "customer")
    na = t(spark, sf_dir, "nation")
    j = (
        od.join(F.broadcast(cu), od.o_custkey == cu.c_custkey)
        .join(F.broadcast(na), cu.c_nationkey == na.n_nationkey)
        .select("n_name", F.year("o_orderdate").cast("long").alias("o_year"), "o_totalprice")
    )
    return j.cube("n_name", "o_year").agg(
        _dsum_wide(F.col("o_totalprice"), "revenue"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@register(
    "customer_deciles",
    oracle="""
SELECT decile,
       CAST(count(*) AS BIGINT) AS n,
       round(min(c_acctbal), 6) AS lo,
       round(max(c_acctbal), 6) AS hi
FROM (
  SELECT c_acctbal,
         ntile(10) OVER (ORDER BY c_acctbal ASC, c_custkey ASC) AS decile
  FROM customer
)
GROUP BY decile
""",
)
def customer_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT ntile decile assignment without a global window: the
    two-phase distributed rank gives each row its global position, and
    the SQL-standard ntile bucket is pure arithmetic on (rank, n) —
    the first n%10 buckets take ceil(n/10) rows, the rest floor(n/10)
    (identical to DuckDB/Spark ntile(10) with this total order). No
    row ever passes through a single-partition sort (r6 window lint);
    n joins in as a 1-row broadcast scalar."""
    from ..operators.partitioning import distributed_order_statistics

    cu = t(spark, sf_dir, "customer").select("c_acctbal", "c_custkey")

    # r12 (guide §1.2, the rfm/lift boundary idiom): the ntile cut needs
    # only the 9 bucket-boundary keys. Bucket sizes are pure arithmetic
    # on n (first n%10 buckets take n div 10 + 1 rows, rest n div 10);
    # bucket(rank) >= i+1 iff (c_acctbal, c_custkey) >= the key at the
    # first rank of bucket i+1, so one CASE-sum pass replaces the full
    # two-phase rank (and the separate count: n comes from the probe's
    # partition counts).
    def _positions(n_: int):
        big, size = n_ % 10, n_ // 10
        pos, cum = [], 0
        for i in range(1, 10):
            cum += size + 1 if i <= big else size
            pos.append(cum + 1)
        return pos

    probe, n = distributed_order_statistics(
        cu, ["c_acctbal", "c_custkey"], _positions
    )
    cases = " + ".join(
        f"(CASE WHEN c_acctbal > CAST('{r['c_acctbal']!r}' AS DOUBLE)"
        f" OR (c_acctbal = CAST('{r['c_acctbal']!r}' AS DOUBLE)"
        f" AND c_custkey >= {r['c_custkey']}L) THEN 1 ELSE 0 END)"
        for r in (probe[p] for p in _positions(n))
    )
    return (
        cu.select("c_acctbal", F.expr(f"CAST({cases} + 1 AS INT)").alias("decile"))
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("c_acctbal"), 6).alias("lo"),
            F.round(F.max("c_acctbal"), 6).alias("hi"),
        )
    )


_RUNNING_WIN = (
    "sum(CAST(round(o_totalprice, 6) AS DECIMAL(28,6))) OVER ("
    "PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
)


@register(
    "orders_running_total",
    oracle=f"""
SELECT o_custkey, o_orderkey,
       {_d2dws(_RUNNING_WIN)} AS running_total
FROM orders
WHERE o_custkey % 100 = 0
""",
)
def orders_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer running revenue: partitioned cumulative window (ROWS
    UNBOUNDED PRECEDING). The accumulator is DECIMAL so the prefix sums
    are exact and engine-independent; partitioning keeps window state
    per-customer, embarrassingly parallel across customers."""
    od = t(spark, sf_dir, "orders").filter(F.col("o_custkey") % 100 == 0)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return od.select(
        "o_custkey",
        "o_orderkey",
        _d2dw(
            F.sum(F.round("o_totalprice", 6).cast("decimal(28,6)")).over(w)
        ).alias("running_total"),
    )


@register(
    "events_asof_signup",
    oracle="""
SELECT c.event_id,
       c.user_id,
       s.event_id AS signup_event_id,
       CAST(epoch_ms(s.ts) AS BIGINT) AS signup_ms
FROM (SELECT * FROM events WHERE event_type = 'click') c
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') s
  ON c.user_id = s.user_id AND epoch_ms(c.ts) >= epoch_ms(s.ts)
""",
)
def events_asof_signup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time as-of join: each click picks the user's most recent
    prior-or-equal signup (operators/windows.py::as_of_join — union +
    one key shuffle + running last_value; no range-join explosion).
    DuckDB's native ASOF JOIN is the oracle."""
    from ..operators.windows import as_of_join

    ev = t(spark, sf_dir, "events")
    ms = F.expr(EV_MS)
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", ms.alias("c_ms")
    )
    signups = ev.filter(F.col("event_type") == "signup").select(
        F.col("user_id"),
        F.col("event_id").alias("signup_event_id"),
        ms.alias("signup_ms"),
    )
    out = as_of_join(
        clicks,
        signups,
        key="user_id",
        left_ts="c_ms",
        right_ts="signup_ms",
        right_cols=("signup_event_id", "signup_ms"),
    )
    return out.select("event_id", "user_id", "signup_event_id", "signup_ms")


@register(
    "distinct_users_salted",
    oracle="""
SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_distinct
FROM events GROUP BY event_type
""",
)
def distinct_users_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct-user counts via value-hash salting
    (operators/windows.py::salted_count_distinct) — COUNT DISTINCT has
    no partial aggregation, so a hot group bottlenecks one task; salting
    by the VALUE hash spreads it over 16 while summing to the exact
    answer (each distinct value lands in exactly one bucket)."""
    from ..operators.windows import salted_count_distinct

    ev = t(spark, sf_dir, "events")
    return salted_count_distinct(ev, group_col="event_type", value_col="user_id")


@register(
    "event_value_bands",
    oracle=f"""
WITH bands AS (
  SELECT n_nationkey AS band_id,
         n_nationkey * 4.0 AS lo,
         (n_nationkey + 1) * 4.0 AS hi
  FROM nation
)
SELECT b.band_id, CAST(count(*) AS BIGINT) AS n,
       {_dw('e.value', 'total')}
FROM events e
JOIN bands b ON e.value >= b.lo AND e.value < b.hi
GROUP BY b.band_id
""",
)
def event_value_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (banded) join: events land in value bands via a non-equi
    interval condition. The band table broadcasts, so the theta join is
    a BroadcastNestedLoopJoin over a 25-row build side — O(n·bands)
    with bands tiny, the right plan; at huge band counts the scale path
    is bucketizing the probe value (width_bucket) into an equi-join,
    which this query's fixed-width bands make trivial."""
    ev = t(spark, sf_dir, "events")
    na = t(spark, sf_dir, "nation")
    bands = na.select(
        F.col("n_nationkey").alias("band_id"),
        (F.col("n_nationkey") * 4.0).alias("lo"),
        ((F.col("n_nationkey") + 1) * 4.0).alias("hi"),
    )
    j = ev.join(
        F.broadcast(bands), (ev.value >= bands.lo) & (ev.value < bands.hi)
    )
    return j.groupBy("band_id").agg(
        F.count(F.lit(1)).alias("n"),
        _dsum_wide(F.col("value"), "total"),
    )


@register(
    "hierarchical_time_rollup",
    oracle=f"""
SELECT (epoch_ms(ts) // 3600000) * 3600000 AS hour_ms,
       event_type,
       CAST(count(*) AS BIGINT) AS n,
       {_dw('value', 'total')}
FROM events GROUP BY 1, 2
""",
)
def hierarchical_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous aggregate: the hourly rollup is
    computed FROM the 5-minute partial aggregate, not from raw events —
    the multi-resolution reuse pattern (materialize fine partials once,
    derive every coarser resolution). Exact because counts and
    decimal-disciplined sums re-aggregate losslessly; the oracle goes
    straight from raw events to hours and must agree."""
    ev = t(spark, sf_dir, "events")
    minute5 = (
        ev.select(
            (F.expr(EV_MS) - F.expr(EV_MS) % 300000).alias("m5_ms"),
            "event_type",
            "value",
        )
        .groupBy("m5_ms", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round("value", 6).cast("decimal(28,6)")).alias("total_dec"),
        )
    )
    return (
        minute5.withColumn("hour_ms", F.col("m5_ms") - F.col("m5_ms") % 3_600_000)
        .groupBy("hour_ms", "event_type")
        .agg(
            F.sum("n").alias("n"),
            _d2dw(F.sum("total_dec")).alias("total"),
        )
    )


_SALT_N = 8


@register(
    "skew_salted_join",
    oracle=f"""
SELECT c.c_mktsegment,
       CAST(count(*) AS BIGINT) AS n_events,
       {_dw('e.value', 'total_value')}
FROM events e JOIN customer c ON e.user_id = c.c_custkey
GROUP BY c.c_mktsegment
""",
)
def skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted fact-to-dim join: the fact side gets a deterministic salt
    (xxhash64 of the row id mod 8) and the dim side is exploded 8x, so a
    hot join key is spread over 8 tasks instead of landing on one — the
    manual companion to AQE's skew-join split, usable when the skew is
    known ahead of time (the reference's per-PLD keying has exactly this
    hazard on giant domains). The salt never changes the answer: every
    fact row still matches exactly one dim replica. Oracle is the plain
    unsalted join."""
    ev = t(spark, sf_dir, "events")
    cu = t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    fact = ev.select(
        "user_id",
        "value",
        F.pmod(F.xxhash64("event_id"), F.lit(_SALT_N)).alias("salt"),
    )
    dim = cu.select(
        "c_custkey",
        "c_mktsegment",
        F.explode(F.sequence(F.lit(0), F.lit(_SALT_N - 1))).alias("salt"),
    ).withColumn("salt", F.col("salt").cast("bigint"))
    joined = fact.join(
        dim, (fact.user_id == dim.c_custkey) & (fact.salt == dim.salt)
    )
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_events"),
        _dsum_wide(F.col("value"), "total_value"),
    )
