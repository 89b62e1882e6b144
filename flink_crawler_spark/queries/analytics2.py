"""Analytics breadth batch 3: event-funnel conversion and snapshot
diffing — the change-data-capture and behavioral-analytics shapes a
long-running crawl/state pipeline reports on.

Funnel = the crawl lifecycle's own observability shape (seeded → fetched
→ parsed is a funnel over the status stream, §2.9 G3); snapshot diff =
what the durable crawl_state table (§7 build plan) emits between ticks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .base import EV_MS, register, t
from .base import dsum_wide as _dsum_wide
from .base import dsum_wide_sql as _dws
from .base import ts_lit as _ts

_DAY_MS = 86_400_000


# ---------------------------------------------------------------------------
# Three-step funnel with a per-step conversion window: first view, first
# click within 1 day of that view, first purchase within 1 day of that
# click. Each step is a groupBy-min plus an equi-join with a range
# conjunct — no window functions, so every step partial-aggregates
# map-side and the joins stay key-partitioned on user_id.
# Timestamps compared at millisecond precision in both engines —
# ms is the shared grid between Spark's unix_millis and duckdb epoch_ms.
@register(
    "funnel_view_click_purchase",
    oracle=f"""
WITH e AS (SELECT user_id, event_type, epoch_ms(ts) AS ms FROM events),
v AS (SELECT user_id, min(ms) AS t0 FROM e WHERE event_type = 'view' GROUP BY user_id),
c AS (SELECT e.user_id, min(e.ms) AS t1 FROM e JOIN v ON e.user_id = v.user_id
       AND e.ms > v.t0 AND e.ms <= v.t0 + {_DAY_MS}
      WHERE e.event_type = 'click' GROUP BY e.user_id),
p AS (SELECT e.user_id, min(e.ms) AS t2 FROM e JOIN c ON e.user_id = c.user_id
       AND e.ms > c.t1 AND e.ms <= c.t1 + {_DAY_MS}
      WHERE e.event_type = 'purchase' GROUP BY e.user_id)
SELECT 'view' AS step, CAST(count(*) AS BIGINT) AS n_users FROM v
UNION ALL SELECT 'click', CAST(count(*) AS BIGINT) FROM c
UNION ALL SELECT 'purchase', CAST(count(*) AS BIGINT) FROM p
""",
)
def funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").select(
        "user_id", "event_type", F.expr(EV_MS).alias("ms")
    )
    v = ev.filter(F.col("event_type") == "view").groupBy("user_id").agg(
        F.min("ms").alias("t0")
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter((F.col("ms") > F.col("t0")) & (F.col("ms") <= F.col("t0") + _DAY_MS))
        .groupBy("user_id")
        .agg(F.min("ms").alias("t1"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter((F.col("ms") > F.col("t1")) & (F.col("ms") <= F.col("t1") + _DAY_MS))
        .groupBy("user_id")
        .agg(F.min("ms").alias("t2"))
    )
    steps = (
        v.select(F.lit("view").alias("step"), "user_id")
        .unionByName(c.select(F.lit("click").alias("step"), "user_id"))
        .unionByName(p.select(F.lit("purchase").alias("step"), "user_id"))
    )
    return steps.groupBy("step").agg(F.count(F.lit(1)).alias("n_users"))


# ---------------------------------------------------------------------------
# Snapshot diff (CDC shape): per-customer order state at an early cutoff
# vs. now, full-outer-joined and classified new/grown/unchanged with
# amount deltas. This is exactly what the durable crawl_state table
# produces between ticks (status-transition records, §2.5 side output) —
# expressed set-at-a-time. Both aggregates shuffle once on the same key,
# so the full-outer join is co-partitioned (no extra exchange under AQE).
@register(
    "customer_snapshot_diff",
    oracle=f"""
WITH a AS (SELECT o_custkey, count(*) AS n,
                  {_dws('o_totalprice', 'amt')}
           FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01 00:00:00' GROUP BY o_custkey),
b AS (SELECT o_custkey, count(*) AS n,
             {_dws('o_totalprice', 'amt')}
      FROM orders GROUP BY o_custkey)
SELECT CAST(coalesce(b.o_custkey, a.o_custkey) AS BIGINT) AS custkey,
       CASE WHEN a.o_custkey IS NULL THEN 'new'
            WHEN b.n = a.n THEN 'unchanged'
            ELSE 'grown' END AS change_type,
       CAST(coalesce(a.n, 0) AS BIGINT) AS n_before,
       CAST(coalesce(b.n, 0) AS BIGINT) AS n_after,
       CAST(coalesce(b.amt, 0) - coalesce(a.amt, 0) AS DOUBLE) AS amt_delta
FROM b FULL OUTER JOIN a ON a.o_custkey = b.o_custkey
""",
)
def customer_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = t(spark, sf_dir, "orders")

    def snap(df):
        return df.groupBy("o_custkey").agg(
            F.count(F.lit(1)).alias("n"), _dsum_wide(F.col("o_totalprice"), "amt")
        )

    a = snap(od.filter(F.col("o_orderdate") < _ts("1998-01-01 00:00:00"))).alias("a")
    b = snap(od).alias("b")
    j = b.join(a, F.col("b.o_custkey") == F.col("a.o_custkey"), "full_outer")
    return j.select(
        F.coalesce(F.col("b.o_custkey"), F.col("a.o_custkey")).cast("bigint").alias("custkey"),
        F.when(F.col("a.o_custkey").isNull(), "new")
        .when(F.col("b.n") == F.col("a.n"), "unchanged")
        .otherwise("grown")
        .alias("change_type"),
        F.coalesce(F.col("a.n"), F.lit(0)).cast("bigint").alias("n_before"),
        F.coalesce(F.col("b.n"), F.lit(0)).cast("bigint").alias("n_after"),
        (F.coalesce(F.col("b.amt"), F.lit(0.0)) - F.coalesce(F.col("a.amt"), F.lit(0.0)))
        .cast("double")
        .alias("amt_delta"),
    )


# ---------------------------------------------------------------------------
# Pearson correlation with EXACT cross-engine reproducibility: built-in
# corr() is association-order-sensitive (parallel co-moment merging), so
# instead the five co-moment sums go through the DECIMAL discipline and
# the closed-form formula runs on identical double operands in both
# engines (IEEE sqrt/division are correctly rounded, so the result is
# bit-identical). The pattern for any derived statistic at scale:
# exact-sum the moments, finish scalar.
# r12: price moments are computed in KILODOLLARS — correlation is
# unit-invariant, and the rescale keeps the squared-price sum (the
# largest moment, ~2e16 per group at sf1.0 in dollars) ~1e6 below the
# dsum_wide 9.0e15 guard through the sf1.0/x10 magnitude gate; past
# ~sf1e5 the guard still fires loudly instead of diverging silently.
@register(
    "corr_qty_price_exact",
    oracle=f"""
WITH s AS (
  SELECT l_returnflag,
         CAST(count(*) AS BIGINT) AS n,
         {_dws('l_quantity', 'sx')},
         {_dws('l_extendedprice / 1000', 'sy')},
         {_dws('l_quantity*l_quantity', 'sxx')},
         {_dws('(l_extendedprice / 1000)*(l_extendedprice / 1000)', 'syy', prec=38)},
         {_dws('l_quantity*(l_extendedprice / 1000)', 'sxy', prec=38)}
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, n,
       round((n*sxy - sx*sy) / (sqrt(n*sxx - sx*sx) * sqrt(n*syy - sy*sy)), 6) AS corr_qty_price
FROM s
""",
)
def corr_qty_price_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    qty, price = F.col("l_quantity"), F.col("l_extendedprice") / 1000

    def ds(col, prec, alias):
        return _dsum_wide(col, alias, prec=prec)

    s = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        ds(qty, 28, "sx"),
        ds(price, 28, "sy"),
        ds(qty * qty, 28, "sxx"),
        ds(price * price, 38, "syy"),
        ds(qty * price, 38, "sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    corr = (n * sxy - sx * sy) / (F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy))
    return s.select("l_returnflag", "n", F.round(corr, 6).alias("corr_qty_price"))


# ---------------------------------------------------------------------------
# MapType surface (the reference's ParsedUrl._parsedMeta
# Map<String,String>, pojos/ParsedUrl.java:6-12 → §1.4 mapping): build a
# metadata map per document, filter entries with a map HOF, explode to
# rows. The oracle flattens the same entries relationally.
@register(
    "doc_meta_map_explode",
    oracle="""
SELECT doc_id, 'lang' AS meta_key, lang AS meta_value FROM documents WHERE lang <> ''
UNION ALL
SELECT doc_id, 'source', source FROM documents WHERE source <> ''
""",
)
def doc_meta_map_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    meta = F.create_map(
        F.lit("lang"), F.col("lang"), F.lit("source"), F.col("source")
    )
    kept = F.map_filter(meta, lambda k, v: v != "")
    return docs.select(
        "doc_id", F.explode(kept).alias("meta_key", "meta_value")
    )


_WEEK_MS = 7 * 24 * 3600 * 1000


@register(
    "cohort_retention_weekly",
    oracle=f"""
WITH f AS (SELECT user_id, min(epoch_ms(ts) // {_WEEK_MS}) AS cohort_week
           FROM events GROUP BY user_id),
a AS (SELECT DISTINCT e.user_id, epoch_ms(e.ts) // {_WEEK_MS} AS w FROM events e),
cs AS (SELECT cohort_week, CAST(count(*) AS BIGINT) AS cohort_size FROM f GROUP BY cohort_week)
SELECT f.cohort_week, a.w - f.cohort_week AS week_age,
       CAST(count(*) AS BIGINT) AS n_active,
       CAST(count(*) AS DOUBLE) / cs.cohort_size AS retention
FROM a JOIN f USING (user_id) JOIN cs USING (cohort_week)
GROUP BY f.cohort_week, a.w - f.cohort_week, cs.cohort_size
""",
)
def cohort_retention_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention matrix: users grouped by first-seen week,
    counted per activity-week age, with the retention rate as an exact
    integer-ratio double. Three partial-aggregating passes over events
    (first-week per user, distinct user-weeks, cohort sizes) joined on
    user_id/cohort_week — cohort sizes are a tiny broadcast dim. The
    standard product-analytics shape every event warehouse needs."""
    ev = t(spark, sf_dir, "events").select(
        "user_id", (F.expr(EV_MS) / _WEEK_MS).cast("bigint").alias("w")
    )
    f = ev.groupBy("user_id").agg(F.min("w").alias("cohort_week"))
    a = ev.distinct()
    cs = f.groupBy("cohort_week").agg(F.count(F.lit(1)).alias("cohort_size"))
    return (
        a.join(f, "user_id")
        .groupBy("cohort_week", (F.col("w") - F.col("cohort_week")).alias("week_age"))
        .agg(F.count(F.lit(1)).alias("n_active"))
        .join(F.broadcast(cs), "cohort_week")
        .select(
            "cohort_week",
            "week_age",
            "n_active",
            (F.col("n_active").cast("double") / F.col("cohort_size")).alias("retention"),
        )
    )


_DAY_MS2 = 86_400_000


@register(
    "rolling_7d_distinct_users",
    oracle=f"""
WITH e AS (SELECT DISTINCT epoch_ms(ts) // {_DAY_MS2} AS day, user_id FROM events),
days AS (SELECT DISTINCT day FROM e)
SELECT d.day AS day,
       CAST(count(DISTINCT e.user_id) AS BIGINT) AS reach_7d
FROM days d JOIN e ON e.day BETWEEN d.day - 6 AND d.day
GROUP BY d.day
""",
)
def rolling_7d_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day distinct-user reach: sliding COUNT DISTINCT cannot
    be a window function (distinct state is not decomposable over
    frames), so the exact form is a bounded range join — each day joined
    to the (day, user) pairs of its trailing week, then one distinct
    count per day. Pre-deduping to daily (day, user) pairs first bounds
    the join at days x active-users-per-week, independent of raw event
    volume — the step that makes this viable at 100 TB (the raw-event
    join would be 7x the table). The sketch alternative is 7 daily HLLs
    merged per window; this is the exact tier."""
    ev = t(spark, sf_dir, "events").select(
        (F.expr(EV_MS) / _DAY_MS2).cast("bigint").alias("day"), "user_id"
    ).distinct()
    days = ev.select("day").distinct()
    j = days.alias("d").join(
        ev.alias("e"),
        (F.col("e.day") >= F.col("d.day") - 6) & (F.col("e.day") <= F.col("d.day")),
    )
    return j.groupBy(F.col("d.day").alias("day")).agg(
        F.countDistinct("e.user_id").alias("reach_7d")
    )
