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

from .base import EV_MS, register, t
from .base import dsum_wide as _dsum_wide
from .base import dsum_wide_sql as _dws

_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]


# ---------------------------------------------------------------------------
# Explicit GROUPING SETS (finer than CUBE/ROLLUP, both already covered):
# the four marginal views of the orders fact in ONE aggregation pass —
# Spark expands the sets map-side, so the fact table is still scanned once.
@register(
    "grouping_sets_priority_status",
    oracle=f"""
SELECT coalesce(o_orderpriority, 'ALL') AS priority,
       coalesce(o_orderstatus, 'ALL') AS status,
       CAST(count(*) AS BIGINT) AS n,
       {_dws('o_totalprice', 'revenue')}
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
        _dsum_wide(F.col("o_totalprice"), "revenue"),
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
    oracle=f"""
WITH bounds AS (SELECT CAST(min(o_orderdate) AS DATE) lo, CAST(max(o_orderdate) AS DATE) hi FROM orders),
spine AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY))::DATE AS d FROM bounds),
daily AS (SELECT CAST(o_orderdate AS DATE) AS d,
                 count(*) AS n,
                 {_dws('o_totalprice', 'rev')}
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
        F.count(F.lit(1)).alias("n"), _dsum_wide(F.col("o_totalprice"), "rev")
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


@register(
    "mad_price_by_flag",
    oracle="""
WITH m AS (SELECT l_returnflag, quantile_cont(l_extendedprice, 0.5) AS med
           FROM lineitem GROUP BY l_returnflag)
SELECT l.l_returnflag,
       round(m.med, 6) AS median_price,
       round(quantile_cont(abs(l.l_extendedprice - m.med), 0.5), 6) AS mad
FROM lineitem l JOIN m USING (l_returnflag)
GROUP BY l.l_returnflag, m.med
""",
)
def mad_price_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median absolute deviation per return flag — nested exact
    percentiles: group median (percentile == quantile_cont, proven by
    order_percentiles), broadcast back, then the median of absolute
    deviations. The robust-statistics outlier primitive (quality
    filtering by MAD-z-score is standard in training-data curation);
    two aggregation passes, the medians dim always broadcast-sized."""
    from ..operators import ensure_parallelism

    # r12 (guide §2.5): both exact-percentile partial aggregations build
    # their state on the scan's partitioning — ONE task on the
    # single-row-group sf corpus; spread the 2-column projection first
    li = ensure_parallelism(
        t(spark, sf_dir, "lineitem").select("l_returnflag", "l_extendedprice")
    )
    m = li.groupBy("l_returnflag").agg(
        F.percentile("l_extendedprice", F.lit(0.5)).alias("med")
    )
    return (
        li.join(F.broadcast(m), "l_returnflag")
        .groupBy("l_returnflag", "med")
        .agg(
            F.percentile(F.abs(F.col("l_extendedprice") - F.col("med")), F.lit(0.5)).alias("__mad")
        )
        .select(
            "l_returnflag",
            F.round("med", 6).alias("median_price"),
            F.round("__mad", 6).alias("mad"),
        )
    )


@register(
    "locf_fill_daily",
    oracle="""
WITH d AS (SELECT user_id, epoch_ms(ts) // 86400000 AS day,
                  round(max(value), 6) AS vmax
           FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
b AS (SELECT user_id, min(day) AS lo, max(day) AS hi FROM d GROUP BY user_id),
spine AS (SELECT user_id, unnest(generate_series(lo, hi)) AS day FROM b),
j AS (SELECT s.user_id, s.day, d.vmax FROM spine s
      LEFT JOIN d ON d.user_id = s.user_id AND d.day = s.day)
SELECT user_id, day,
       last_value(vmax IGNORE NULLS)
         OVER (PARTITION BY user_id ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled,
       CAST(vmax IS NULL AS BOOLEAN) AS was_gap
FROM j
""",
)
def locf_fill_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-observation-carried-forward over a per-user daily spine: the
    timeseries fill gap_fill_daily_revenue's zero-fill can't express —
    missing days inherit the last seen value (`last(..., ignorenulls)`
    over an unbounded-preceding window). Spine generation is per-key
    sequence+explode (never a global calendar cross join); the fill
    window is partitioned by user, so at scale it shuffles once on
    user_id and each partition fills independently."""
    ev = t(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    d = ev.select(
        "user_id", F.expr(EV_MS).alias("ms"), "value"
    ).groupBy("user_id", (F.col("ms") / 86400000).cast("bigint").alias("day")).agg(
        F.round(F.max("value"), 6).alias("vmax")
    )
    b = d.groupBy("user_id").agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
    spine = b.select("user_id", F.explode(F.sequence("lo", "hi")).alias("day"))
    j = spine.join(d, ["user_id", "day"], "left")
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return j.select(
        "user_id",
        "day",
        F.last("vmax", ignorenulls=True).over(w).alias("filled"),
        F.col("vmax").isNull().alias("was_gap"),
    )


@register(
    "order_gap_islands",
    oracle="""
WITH m AS (
  SELECT o_orderpriority AS prio,
         CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1 AS BIGINT) AS mi,
         CAST(count(*) AS BIGINT) AS n
  FROM orders GROUP BY 1, 2
),
avgd AS (SELECT prio, CAST(sum(n) AS DOUBLE) / count(*) AS avg_n FROM m GROUP BY prio),
hot AS (
  SELECT m.prio, m.mi, m.n,
         m.mi - row_number() OVER (PARTITION BY m.prio ORDER BY m.mi) AS grp
  FROM m JOIN avgd USING (prio) WHERE m.n > avgd.avg_n
)
SELECT prio,
       CAST(min(mi) AS BIGINT) AS island_start,
       CAST(max(mi) AS BIGINT) AS island_end,
       CAST(count(*) AS BIGINT) AS n_months,
       CAST(sum(n) AS BIGINT) AS total_orders
FROM hot GROUP BY prio, grp
""",
)
def order_gap_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: consecutive runs of above-average months per
    priority class, via the classic index-minus-row_number grouping key
    (consecutive rows share mi - rn). The run-detection primitive behind
    sessionization, outage windows, and hot-period reports — one
    window + one aggregation, both partitioned by the group key, so the
    plan is two key-local passes at any scale. The threshold is each
    priority's own mean (exact integer-ratio double), so the query is
    scale-factor-independent."""
    od = t(spark, sf_dir, "orders")
    m = od.groupBy(
        F.col("o_orderpriority").alias("prio"),
        (F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1).cast("bigint").alias("mi"),
    ).agg(F.count(F.lit(1)).alias("n"))
    avgd = m.groupBy("prio").agg(
        (F.sum("n").cast("double") / F.count(F.lit(1))).alias("avg_n")
    )
    w = Window.partitionBy("prio").orderBy("mi")
    hot = (
        m.join(F.broadcast(avgd), "prio")
        .filter(F.col("n") > F.col("avg_n"))
        .withColumn("grp", F.col("mi") - F.row_number().over(w))
    )
    return hot.groupBy("prio", "grp").agg(
        F.min("mi").alias("island_start"),
        F.max("mi").alias("island_end"),
        F.count(F.lit(1)).alias("n_months"),
        F.sum("n").alias("total_orders"),
    ).drop("grp")


@register(
    "scd2_versioned_revenue",
    oracle=f"""
WITH vq AS (
  SELECT DISTINCT l_partkey AS pk,
         CAST(year(l_shipdate) * 4 + quarter(l_shipdate) - 1 AS BIGINT) AS qi
  FROM lineitem
),
vers AS (
  SELECT pk, qi AS valid_from,
         lead(qi) OVER (PARTITION BY pk ORDER BY qi) AS valid_to,
         (100 + qi % 5) / 100.0 AS price_mult
  FROM vq
),
fact AS (
  SELECT l_partkey AS pk,
         CAST(year(l_shipdate) * 4 + quarter(l_shipdate) - 1 AS BIGINT) AS qi,
         CAST(year(l_shipdate) AS BIGINT) AS ship_year,
         l_quantity, l_partkey
  FROM lineitem
),
j AS (
  SELECT f.ship_year, f.l_quantity, p.p_retailprice, v.price_mult
  FROM fact f
  JOIN vers v ON v.pk = f.pk AND f.qi >= v.valid_from
             AND (v.valid_to IS NULL OR f.qi < v.valid_to)
  JOIN part p ON p.p_partkey = f.pk
)
SELECT ship_year,
       CAST(count(*) AS BIGINT) AS n_lines,
       {_dws('l_quantity * p_retailprice * price_mult', 'versioned_revenue')}
FROM j GROUP BY ship_year
""",
)
def scd2_versioned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension (type 2) temporal join: per-part price
    versions are constructed with lead() over the part's active
    quarters (valid_from inclusive, valid_to exclusive, NULL = open),
    then every lineitem matches EXACTLY ONE version by validity
    interval — the point-in-time dimension lookup every warehouse does
    for prices/rates/org-charts. The interval join is keyed on partkey,
    so it shuffles once on the key and the range predicate evaluates
    within the key group; version construction is one window over the
    (small) distinct (part, quarter) set."""
    li = t(spark, sf_dir, "lineitem")
    pt = t(spark, sf_dir, "part").select("p_partkey", "p_retailprice")
    qi = (F.year("l_shipdate") * 4 + F.quarter("l_shipdate") - 1).cast("bigint")
    vq = li.select(F.col("l_partkey").alias("pk"), qi.alias("qi")).distinct()
    w = Window.partitionBy("pk").orderBy("qi")
    vers = vq.select(
        "pk",
        F.col("qi").alias("valid_from"),
        F.lead("qi").over(w).alias("valid_to"),
        ((F.lit(100) + F.col("qi") % 5) / 100.0).alias("price_mult"),
    )
    fact = li.select(
        F.col("l_partkey").alias("pk"),
        qi.alias("fqi"),
        F.year("l_shipdate").cast("bigint").alias("ship_year"),
        "l_quantity",
    )
    j = (
        fact.join(
            vers,
            (fact.pk == vers.pk)
            & (F.col("fqi") >= F.col("valid_from"))
            & (F.col("valid_to").isNull() | (F.col("fqi") < F.col("valid_to"))),
        )
        .drop(vers.pk)
        .join(pt, F.col("pk") == F.col("p_partkey"))
    )
    return j.groupBy("ship_year").agg(
        F.count(F.lit(1)).alias("n_lines"),
        _dsum_wide(
            F.col("l_quantity") * F.col("p_retailprice") * F.col("price_mult"),
            "versioned_revenue",
        ),
    )


@register(
    "price_range_density",
    oracle="""
SELECT o_orderkey, o_orderpriority,
       CAST(count(*) OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice
                           RANGE BETWEEN 1000 PRECEDING AND 1000 FOLLOWING) AS BIGINT) AS n_near,
       CAST(sum(CAST(1 AS BIGINT)) OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice
                           RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS n_le
FROM orders
""",
)
def price_range_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-based RANGE window frames (vs the ROWS frames elsewhere):
    per order, how many same-priority orders fall within +-1000 of its
    price (local density), and the running count over the value axis.
    RANGE frames bound by VALUE distance evaluate in one sorted pass per
    partition with a sliding frame boundary — same single key-shuffle
    as a ROWS frame, so the plan scales identically; the semantic
    difference (ties and value gaps) is what the oracle pins down."""
    od = t(spark, sf_dir, "orders")
    wv = (
        Window.partitionBy("o_orderpriority")
        .orderBy("o_totalprice")
        .rangeBetween(-1000, 1000)
    )
    wc = (
        Window.partitionBy("o_orderpriority")
        .orderBy("o_totalprice")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return od.select(
        "o_orderkey",
        "o_orderpriority",
        F.count(F.lit(1)).over(wv).alias("n_near"),
        F.sum(F.lit(1).cast("bigint")).over(wc).alias("n_le"),
    )


@register(
    "unpivot_priority_metrics",
    oracle=f"""
WITH agg AS (
  SELECT o_orderpriority,
         CAST(count(*) AS DOUBLE) AS n_orders,
         {_dws('o_totalprice', 'revenue')},
         CAST(count(DISTINCT o_custkey) AS DOUBLE) AS n_customers
  FROM orders GROUP BY o_orderpriority
)
SELECT o_orderpriority, metric, value FROM (
  SELECT o_orderpriority, 'n_orders' AS metric, n_orders AS value FROM agg
  UNION ALL SELECT o_orderpriority, 'revenue', revenue FROM agg
  UNION ALL SELECT o_orderpriority, 'n_customers', n_customers FROM agg
) u
""",
)
def unpivot_priority_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt): the wide per-priority metric columns fold into
    (priority, metric, value) long form via the native `unpivot`
    operator — the inverse of pivot_priority_by_year, completing the
    reshape pair. Long form is what metric stores and plotting
    pipelines ingest; unpivot is a zero-shuffle projection (each input
    row expands to k output rows in place)."""
    od = t(spark, sf_dir, "orders")
    agg = od.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("double").alias("n_orders"),
        _dsum_wide(F.col("o_totalprice"), "revenue"),
        F.countDistinct("o_custkey").cast("double").alias("n_customers"),
    )
    return agg.unpivot(
        ids=["o_orderpriority"],
        values=["n_orders", "revenue", "n_customers"],
        variableColumnName="metric",
        valueColumnName="value",
    )


@register(
    "nullsafe_join_semantics",
    oracle="""
WITH lhs AS (
  SELECT o_orderkey,
         CASE WHEN o_totalprice > 200000 THEN o_orderpriority ELSE NULL END AS band
  FROM orders
),
rhs AS (
  SELECT DISTINCT CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                       THEN o_orderpriority ELSE NULL END AS band
  FROM orders
)
SELECT coalesce(l.band, '<null>') AS band,
       CAST(count(*) AS BIGINT) AS n_matched
FROM lhs l JOIN rhs r ON l.band IS NOT DISTINCT FROM r.band
GROUP BY l.band
""",
)
def nullsafe_join_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (`<=>` / IS NOT DISTINCT FROM): NULL
    keys MATCH each other instead of vanishing — the three-valued-logic
    edge every dedup/diff pipeline hits (a plain equi-join silently
    drops NULL keys; the snapshot-diff and merge paths rely on knowing
    which semantics they're using). The plan is still a hash join —
    null-safe equality is hashable — so nothing changes at scale except
    the (intended) answer."""
    od = t(spark, sf_dir, "orders")
    lhs = od.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 200000, F.col("o_orderpriority")).alias("band"),
    )
    rhs = (
        od.select(
            F.when(
                F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), F.col("o_orderpriority")
            ).alias("band")
        )
        .distinct()
    )
    j = lhs.join(rhs, lhs.band.eqNullSafe(rhs.band)).select(lhs.band.alias("lband"))
    return j.groupBy(F.coalesce("lband", F.lit("<null>")).alias("band")).agg(
        F.count(F.lit(1)).alias("n_matched")
    )


@register(
    "order_quantity_hof",
    oracle="""
WITH v AS (
  SELECT l_orderkey, list_sort(list(l_quantity)) AS q
  FROM lineitem GROUP BY l_orderkey
)
SELECT l_orderkey,
       CAST(len(q) AS BIGINT) AS n_items,
       round(list_aggregate(q, 'sum'), 6) AS qty_sum,
       round(list_aggregate(list_transform(q, (x, i) -> x * i), 'sum'), 6) AS pos_weighted
FROM v
""",
)
def order_quantity_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array collection + higher-order-function folds: per order, the
    quantity vector is collect_list'ed then array_sort'ed — THE
    determinism discipline for array aggregation (collect_list order is
    partition-dependent; sorting makes the array, and everything folded
    from it, identical on any cluster). Folds: plain sum and a
    positional weighted sum via an INDEXED lambda (transform's (x, i)
    form; DuckDB's 1-based i = Spark's i+1). Quantities are integral
    doubles, so the folds are exact regardless of association order."""
    li = t(spark, sf_dir, "lineitem")
    v = li.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_list("l_quantity")).alias("q")
    )
    return v.select(
        "l_orderkey",
        F.size("q").cast("bigint").alias("n_items"),
        F.round(
            F.aggregate("q", F.lit(0.0), lambda acc, x: acc + x), 6
        ).alias("qty_sum"),
        F.round(
            F.aggregate(
                F.transform("q", lambda x, i: x * (i + 1)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
            6,
        ).alias("pos_weighted"),
    )


@register(
    "weekday_revenue_profile",
    oracle=f"""
SELECT CAST(isodow(o_orderdate) AS BIGINT) AS iso_weekday,
       CAST(count(*) AS BIGINT) AS n_orders,
       {_dws('o_totalprice', 'revenue')},
       CAST(count(*) FILTER (WHERE date_diff('day', o_orderdate, last_day(o_orderdate)) <= 2)
            AS BIGINT) AS month_end_orders
FROM orders
GROUP BY 1
""",
)
def weekday_revenue_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-function surface: ISO weekday profile of order volume
    plus a month-end effect counter (orders within 2 days of their
    month's last day). Pins the cross-engine calendar conventions —
    Spark's weekday() is 0=Monday vs DuckDB isodow() 1=Monday (aligned
    by +1), last_day/date-diff arithmetic identical. Conditional count
    via FILTER-style when/sum. One scan, one small agg."""
    od = t(spark, sf_dir, "orders")
    return od.groupBy(
        (F.expr("weekday(o_orderdate)") + 1).cast("bigint").alias("iso_weekday")
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        _dsum_wide(F.col("o_totalprice"), "revenue"),
        F.sum(
            F.when(
                F.datediff(F.last_day("o_orderdate"), F.col("o_orderdate")) <= 2, 1
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("month_end_orders"),
    )


@register(
    "quantity_bag_ops",
    oracle="""
WITH a AS (SELECT CAST(l_quantity AS BIGINT) AS q FROM lineitem WHERE l_returnflag = 'A'),
b AS (SELECT CAST(l_quantity AS BIGINT) AS q FROM lineitem WHERE l_returnflag = 'R'),
i AS (SELECT q FROM a INTERSECT ALL SELECT q FROM b),
x AS (SELECT q FROM a EXCEPT ALL SELECT q FROM b)
SELECT 'intersect_all' AS op, q, CAST(count(*) AS BIGINT) AS n FROM i GROUP BY q
UNION ALL
SELECT 'except_all', q, CAST(count(*) AS BIGINT) FROM x GROUP BY q
""",
)
def quantity_bag_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-semantics set operations (INTERSECT ALL / EXCEPT ALL): the
    multiplicity-aware variants customer_set_ops' set semantics can't
    express — intersect keeps min(count_a, count_b) copies per value,
    except keeps max(0, count_a - count_b). Both plan as a single
    count-aggregate join per op (no row-pairing blowup), which is why
    they scale like a groupBy. Output folds to (op, value, multiplicity)
    so the multiplicities themselves are what the oracle checks."""
    li = t(spark, sf_dir, "lineitem")
    q = F.col("l_quantity").cast("bigint").alias("q")
    a = li.filter(F.col("l_returnflag") == "A").select(q)
    b = li.filter(F.col("l_returnflag") == "R").select(q)
    i = a.intersectAll(b).groupBy("q").agg(F.count(F.lit(1)).alias("n"))
    x = a.exceptAll(b).groupBy("q").agg(F.count(F.lit(1)).alias("n"))
    return i.select(F.lit("intersect_all").alias("op"), "q", "n").unionByName(
        x.select(F.lit("except_all").alias("op"), "q", "n")
    )


@register(
    "explode_outer_semantics",
    oracle="""
WITH arr AS (
  SELECT l_orderkey,
         list_filter(list_sort(list(CAST(l_quantity AS BIGINT))), x -> x > 45) AS big
  FROM lineitem GROUP BY l_orderkey
),
ex AS (
  SELECT l_orderkey,
         unnest(CASE WHEN len(big) = 0 THEN [NULL] ELSE big END) AS q
  FROM arr
)
SELECT CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(q) AS BIGINT) AS n_values,
       CAST(count(*) - count(q) AS BIGINT) AS n_preserved_empties,
       CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders
FROM ex
""",
)
def explode_outer_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode_outer null-preservation: orders whose filtered array is
    EMPTY still produce a row (with NULL) instead of vanishing — the
    semantics that keep a page with zero extracted outlinks visible in
    the parse output (ParseFunction emits the page regardless). plain
    explode would silently drop n_preserved_empties rows; the aggregate
    pins count(*) vs count(col) vs distinct-parent bookkeeping on both
    engines. (DuckDB has no unnest-outer; the oracle emulates it with a
    [NULL] substitution — same rows.)"""
    li = t(spark, sf_dir, "lineitem")
    arr = li.groupBy("l_orderkey").agg(
        F.filter(
            F.array_sort(F.collect_list(F.col("l_quantity").cast("bigint"))),
            lambda x: x > 45,
        ).alias("big")
    )
    ex = arr.select("l_orderkey", F.explode_outer("big").alias("q"))
    return ex.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("q").alias("n_values"),
        (F.count(F.lit(1)) - F.count("q")).alias("n_preserved_empties"),
        F.countDistinct("l_orderkey").alias("n_orders"),
    )


@register(
    "hourly_weekday_heatmap",
    oracle="""
SELECT CAST(isodow(ts) AS BIGINT) AS iso_weekday,
       CAST(hour(ts) AS BIGINT) AS hour_of_day,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM events GROUP BY 1, 2
""",
)
def hourly_weekday_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Activity heatmap in long form (weekday x hour): the standard
    operational-dashboard aggregate — one scan, partial-aggregating
    counts, 168 output cells regardless of input size. Calendar
    extraction on TIMESTAMP_NTZ under the UTC session matches duckdb's
    isodow/hour exactly (Spark weekday() is 0-based Monday, +1)."""
    ev = t(spark, sf_dir, "events")
    return ev.groupBy(
        (F.expr("weekday(ts)") + 1).cast("bigint").alias("iso_weekday"),
        F.hour("ts").cast("bigint").alias("hour_of_day"),
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
    )


@register(
    "price_histogram_buckets",
    oracle="""
SELECT CAST(CASE WHEN o_totalprice < 0 THEN 0
                 WHEN o_totalprice >= 600000 THEN 25
                 ELSE floor(o_totalprice / 25000) + 1 END AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n,
       round(min(o_totalprice), 6) AS lo,
       round(max(o_totalprice), 6) AS hi
FROM orders GROUP BY 1
""",
)
def price_histogram_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram via width_bucket(x, 0, 600000, 24) — the
    one-pass binning primitive (24 in-range buckets + under/overflow 0
    and 25). DuckDB has no width_bucket, so the oracle reproduces the
    exact floor arithmetic — pinning Spark's bucket-edge semantics
    (left-closed, overflow to n+1) rather than trusting the name. A
    histogram is a groupBy over a pure projection: partial-aggregates
    map-side, 26 cells out regardless of input size."""
    od = t(spark, sf_dir, "orders")
    return od.groupBy(
        F.width_bucket("o_totalprice", F.lit(0.0), F.lit(600000.0), F.lit(24))
        .cast("bigint")
        .alias("bucket")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.min("o_totalprice"), 6).alias("lo"),
        F.round(F.max("o_totalprice"), 6).alias("hi"),
    )


@register(
    "quartiles_one_pass",
    oracle="""
WITH q AS (
  SELECT l_returnflag,
         quantile_cont(l_extendedprice, [0.25, 0.5, 0.75]) AS qs,
         CAST(count(*) AS BIGINT) AS n
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, n,
       round(qs[1], 6) AS q25, round(qs[2], 6) AS q50, round(qs[3], 6) AS q75,
       round(qs[3] - qs[1], 6) AS iqr
FROM q
""",
)
def quartiles_one_pass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All three quartiles (+IQR) in ONE aggregation pass via the array
    form of percentile — one sort/accumulate per group instead of three
    (the single-pass multi-quantile every profiling job wants). The
    linear-interpolation parity between Spark percentile and DuckDB
    quantile_cont was proven by order_percentiles; this pins the array
    variant and derived IQR arithmetic on top."""
    li = t(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.percentile("l_extendedprice", F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75))).alias("qs"),
        F.count(F.lit(1)).alias("n"),
    )
    q = lambda i: F.element_at("qs", i)
    return agg.select(
        "l_returnflag",
        "n",
        F.round(q(1), 6).alias("q25"),
        F.round(q(2), 6).alias("q50"),
        F.round(q(3), 6).alias("q75"),
        F.round(q(3) - q(1), 6).alias("iqr"),
    )
