"""Wave 32: attribution models and engagement stickiness.

  * purchase_attribution_models — last-touch vs linear credit per
    channel for purchase events (the two baseline marketing-attribution
    models, side by side from one pass).
  * dau_mau_stickiness — DAU/MAU stickiness per month (the product
    engagement ratio).

All exact-value DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .base import EV_MS, register, t
from .base import dec_to_double_wide as _d2dw
from .base import dec_to_double_wide_sql as _d2dws

# ---------------------------------------------------------------------------
# purchase_attribution_models
# ---------------------------------------------------------------------------

ATTR_WINDOW_MS = 7 * 86_400_000  # 7-day lookback


@register(
    "purchase_attribution_models",
    oracle=f"""
WITH ev AS (
  SELECT user_id, event_id, event_type, CAST(epoch_ms(ts) AS BIGINT) AS ms
  FROM events
),
conv AS (
  SELECT user_id, event_id AS conv_id, ms AS conv_ms
  FROM ev WHERE event_type = 'purchase'
),
touch AS (
  SELECT conv.conv_id, ev.event_type AS channel, ev.ms, ev.event_id
  FROM conv JOIN ev ON ev.user_id = conv.user_id
   AND ev.ms >= conv.conv_ms - {ATTR_WINDOW_MS}
   AND (ev.ms < conv.conv_ms OR (ev.ms = conv.conv_ms AND ev.event_id < conv.conv_id))
   AND ev.event_type <> 'purchase'
),
sized AS (
  SELECT conv_id, channel, ms, event_id,
         CAST(count(*) OVER (PARTITION BY conv_id) AS BIGINT) AS n_touches,
         row_number() OVER (PARTITION BY conv_id ORDER BY ms DESC, event_id DESC) AS rn
  FROM touch
),
credit AS (
  SELECT channel,
         CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS last_touch,
         sum(CAST(round(1.0 / n_touches, 9) AS DECIMAL(38,9))) AS linear_raw
  FROM sized GROUP BY channel
),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n_conv_attributed
        FROM (SELECT DISTINCT conv_id FROM sized))
SELECT credit.channel, credit.last_touch,
       round({_d2dws('credit.linear_raw', 9)}, 6) AS linear_credit,
       tot.n_conv_attributed,
       round(CAST(credit.last_touch AS DOUBLE) / CAST(tot.n_conv_attributed AS DOUBLE), 9)
         AS last_touch_share
FROM credit CROSS JOIN tot
""",
)
def purchase_attribution_models(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marketing attribution baselines, side by side: for each purchase
    conversion, the non-purchase touches in a 7-day lookback window get
    (a) last-touch credit (the most recent touch takes the whole
    conversion) and (b) linear credit (1/k each) — the two models every
    attribution debate starts from, disagreeing exactly where channel
    mix differs by recency. The touch extraction is ONE user-keyed
    range join (both sides partitioned on user, a banded interval
    join); per-conversion windows are keyed by conversion id; linear
    credits are rounded once and DECIMAL-summed so the shares are
    engine-exact. Purchases with no prior touch drop out of BOTH
    models identically (the unattributable mass)."""
    ev = t(spark, sf_dir, "events").selectExpr(
        "user_id", "event_id", "event_type", f"{EV_MS} AS ms"
    ).localCheckpoint(eager=True)
    conv = ev.where(F.col("event_type") == "purchase").selectExpr(
        "user_id", "event_id AS conv_id", "ms AS conv_ms"
    )
    touch = (
        ev.where(F.col("event_type") != "purchase")
        .join(conv, "user_id")
        .where(
            (F.col("ms") >= F.col("conv_ms") - ATTR_WINDOW_MS)
            & (
                (F.col("ms") < F.col("conv_ms"))
                | ((F.col("ms") == F.col("conv_ms")) & (F.col("event_id") < F.col("conv_id")))
            )
        )
        .select("conv_id", F.col("event_type").alias("channel"), "ms", "event_id")
    )
    wc = Window.partitionBy("conv_id")
    wr = Window.partitionBy("conv_id").orderBy(F.desc("ms"), F.desc("event_id"))
    sized = (
        touch.withColumn("n_touches", F.count(F.lit(1)).over(wc).cast("long"))
        .withColumn("rn", F.row_number().over(wr))
        .localCheckpoint(eager=True)
    )
    credit = sized.groupBy("channel").agg(
        F.sum(F.when(F.col("rn") == 1, 1).otherwise(0)).cast("long").alias("last_touch"),
        F.sum(F.expr("CAST(round(1.0 / n_touches, 9) AS DECIMAL(38,9))")).alias(
            "linear_raw"
        ),
    )
    tot = sized.select("conv_id").distinct().agg(
        F.count(F.lit(1)).cast("long").alias("n_conv_attributed")
    )
    return credit.crossJoin(F.broadcast(tot)).withColumn(
        "lr_d", _d2dw(F.col("linear_raw"), 9)
    ).selectExpr(
        "channel",
        "last_touch",
        "round(lr_d, 6) AS linear_credit",
        "n_conv_attributed",
        "round(CAST(last_touch AS DOUBLE) / CAST(n_conv_attributed AS DOUBLE), 9)"
        " AS last_touch_share",
    )


# ---------------------------------------------------------------------------
# dau_mau_stickiness
# ---------------------------------------------------------------------------

@register(
    "dau_mau_stickiness",
    oracle="""
WITH ev AS (
  SELECT user_id,
         CAST(year(CAST(ts AS DATE)) AS BIGINT) AS yr,
         CAST(month(CAST(ts AS DATE)) AS BIGINT) AS mo,
         date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day_idx
  FROM events
),
dau AS (
  SELECT yr, mo, day_idx, CAST(count(DISTINCT user_id) AS BIGINT) AS dau
  FROM ev GROUP BY yr, mo, day_idx
),
mau AS (
  SELECT yr, mo, CAST(count(DISTINCT user_id) AS BIGINT) AS mau
  FROM ev GROUP BY yr, mo
),
d AS (
  SELECT yr, mo, CAST(count(*) AS BIGINT) AS n_days,
         CAST(sum(dau) AS BIGINT) AS sum_dau
  FROM dau GROUP BY yr, mo
)
SELECT d.yr AS year, d.mo AS month, d.n_days, mau.mau,
       round(CAST(d.sum_dau AS DOUBLE) / CAST(d.n_days AS DOUBLE), 6) AS avg_dau,
       round(CAST(d.sum_dau AS DOUBLE) / CAST(d.n_days AS DOUBLE)
             / CAST(mau.mau AS DOUBLE), 9) AS stickiness
FROM d JOIN mau ON mau.yr = d.yr AND mau.mo = d.mo
""",
)
def dau_mau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/MAU stickiness per calendar month — THE product-engagement
    ratio (what fraction of the monthly audience shows up on an average
    day). Two distinct-count aggregates (daily and monthly active
    users — both shuffle on the user key; at 100 TB these are the
    salted exact-distinct or HLL paths this repo already provides) and
    one exact-ratio division on the months-bounded table."""
    ev = t(spark, sf_dir, "events").selectExpr(
        "user_id",
        "CAST(year(CAST(ts AS DATE)) AS BIGINT) AS yr",
        "CAST(month(CAST(ts AS DATE)) AS BIGINT) AS mo",
        "datediff(CAST(ts AS DATE), DATE '1970-01-01') AS day_idx",
    )
    dau = ev.groupBy("yr", "mo", "day_idx").agg(
        F.countDistinct("user_id").cast("long").alias("dau")
    )
    mau = ev.groupBy("yr", "mo").agg(
        F.countDistinct("user_id").cast("long").alias("mau")
    )
    d = dau.groupBy("yr", "mo").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("dau").cast("long").alias("sum_dau"),
    )
    return d.join(F.broadcast(mau), ["yr", "mo"]).selectExpr(
        "yr AS year",
        "mo AS month",
        "n_days",
        "mau",
        "round(CAST(sum_dau AS DOUBLE) / CAST(n_days AS DOUBLE), 6) AS avg_dau",
        "round(CAST(sum_dau AS DOUBLE) / CAST(n_days AS DOUBLE)"
        " / CAST(mau AS DOUBLE), 9) AS stickiness",
    )
