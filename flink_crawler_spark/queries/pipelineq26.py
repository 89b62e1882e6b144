"""Wave 27: power-law fitting and temporal-dynamics statistics.

  * zipf_fit_slope — log-log OLS fit of the word rank-frequency curve
    (the Zipf exponent): composes the distributed rank with the
    closed-form regression.
  * user_burstiness_index — Goh-Barabasi burstiness B of per-user
    inter-event times (the temporal-dynamics read behind politeness
    and rate modeling).
  * fano_factor_daily — Fano factor (variance/mean of daily counts)
    per event type: over/under-dispersion vs a Poisson arrival model.

All exact-value DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .base import EV_MS, register, t
from .base import dec_to_double_wide as _d2dw
from .base import dec_to_double_wide_sql as _d2dws

# ---------------------------------------------------------------------------
# zipf_fit_slope
# ---------------------------------------------------------------------------

_DUCK_TOKS = "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')"


_ZIPF_SXX = (
    "sum(CAST(round(ln(CAST(rnk AS DOUBLE)) * ln(CAST(rnk AS DOUBLE)), 12)"
    " AS DECIMAL(38,12)))"
)
_ZIPF_SXY = (
    "sum(CAST(round(ln(CAST(rnk AS DOUBLE)) * ln(CAST(f AS DOUBLE)), 12)"
    " AS DECIMAL(38,12)))"
)


@register(
    "zipf_fit_slope",
    oracle=f"""
WITH tk AS (SELECT unnest({_DUCK_TOKS}) AS w FROM documents),
c AS (SELECT w, CAST(count(*) AS BIGINT) AS f FROM tk GROUP BY w),
r AS (
  SELECT w, f,
         CAST(row_number() OVER (ORDER BY f DESC, w ASC) AS BIGINT) AS rnk
  FROM c
),
m AS (
  SELECT CAST(CAST(count(*) AS BIGINT) AS DOUBLE) AS n,
         {_d2dws("sum(CAST(round(ln(CAST(rnk AS DOUBLE)), 12) AS DECIMAL(38,12)))", 12)} AS sx,
         {_d2dws("sum(CAST(round(ln(CAST(f AS DOUBLE)), 12) AS DECIMAL(38,12)))", 12)} AS sy,
         {_d2dws(_ZIPF_SXX, 12)} AS sxx,
         {_d2dws(_ZIPF_SXY, 12)} AS sxy
  FROM r
)
SELECT CAST(n AS BIGINT) AS vocab,
       round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS zipf_slope,
       round((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n, 6)
         AS log_intercept
FROM m
""",
)
def zipf_fit_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf exponent of the corpus word-frequency distribution: OLS of
    ln(frequency) on ln(rank) over the ranked vocabulary — the
    one-number heavy-tail summary that pairs with word_rank_curve (the
    raw curve) and hill_tail_index (the price-domain tail). The rank
    lives on the VOCABULARY table (bounded far below corpus size; at
    web scale the two-phase distributed rank the repo already uses),
    the regression is the closed-form moment solve with rounded-once
    DECIMAL co-moments, and the slope for natural text should sit near
    -1 (here the 31-token synthetic vocabulary is near-uniform, so the
    fitted slope reads the flatness instead — the query is the
    instrument, not the corpus)."""
    tk = t(spark, sf_dir, "documents").select(
        F.explode(
            F.filter(F.split(F.lower("text"), "[^a-z0-9]+"), lambda x: x != "")
        ).alias("w")
    )
    from ..operators.partitioning import distributed_row_number

    c = tk.groupBy("w").agg(F.count(F.lit(1)).cast("long").alias("f"))
    # rank over the VOCABULARY via the two-phase distributed row_number —
    # a web-scale vocab is 10^7+ tokens, never a single-task sort
    r = distributed_row_number(
        c.withColumn("neg_f", -F.col("f")), ["neg_f", "w"], out="rnk"
    ).withColumn("rnk", F.col("rnk").cast("long"))
    m = r.agg(
        F.count(F.lit(1)).cast("long").cast("double").alias("n"),
        _d2dw(
            F.sum(
                F.expr("CAST(round(ln(CAST(rnk AS DOUBLE)), 12) AS DECIMAL(38,12))")
            ),
            12,
        ).alias("sx"),
        _d2dw(
            F.sum(
                F.expr("CAST(round(ln(CAST(f AS DOUBLE)), 12) AS DECIMAL(38,12))")
            ),
            12,
        ).alias("sy"),
        _d2dw(
            F.sum(
                F.expr(
                    "CAST(round(ln(CAST(rnk AS DOUBLE)) * ln(CAST(rnk AS DOUBLE)), 12)"
                    " AS DECIMAL(38,12))"
                )
            ),
            12,
        ).alias("sxx"),
        _d2dw(
            F.sum(
                F.expr(
                    "CAST(round(ln(CAST(rnk AS DOUBLE)) * ln(CAST(f AS DOUBLE)), 12)"
                    " AS DECIMAL(38,12))"
                )
            ),
            12,
        ).alias("sxy"),
    )
    slope = "((n * sxy - sx * sy) / (n * sxx - sx * sx))"
    return m.selectExpr(
        "CAST(n AS BIGINT) AS vocab",
        f"round({slope}, 6) AS zipf_slope",
        f"round((sy - {slope} * sx) / n, 6) AS log_intercept",
    )


# ---------------------------------------------------------------------------
# user_burstiness_index
# ---------------------------------------------------------------------------

BURST_MIN_EVENTS = 5


@register(
    "user_burstiness_index",
    oracle=f"""
WITH ev AS (
  SELECT user_id, CAST(epoch_ms(ts) AS BIGINT) AS ms, event_id FROM events
),
gaps0 AS (
  SELECT user_id,
         ms - lag(ms) OVER (PARTITION BY user_id ORDER BY ms, event_id) AS gap0
  FROM ev
),
gaps AS (
  SELECT user_id,
         CAST(CASE WHEN gap0 >= 3000000000 THEN error(
           'user_burstiness: gap >= 3e9 ms breaches the int64 gap*gap bound; widen the split factor')
           ELSE gap0 END AS BIGINT) AS gap
  FROM gaps0
),
s AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n_gaps,
         CAST(sum(gap) AS BIGINT) AS sg,
         CAST(sum(gap * gap // 1000000) AS BIGINT) AS sgg_hi,
         CAST(sum(gap * gap % 1000000) AS BIGINT) AS sgg_lo
  FROM gaps WHERE gap IS NOT NULL
  GROUP BY user_id HAVING count(*) >= {BURST_MIN_EVENTS}
),
m AS (
  SELECT user_id, n_gaps,
         CAST(sg AS DOUBLE) / n_gaps AS mu,
         (CAST(sgg_hi AS DOUBLE) * 1000000e0 + CAST(sgg_lo AS DOUBLE)) / n_gaps
           AS msq
  FROM s
)
SELECT user_id, n_gaps,
       floor(mu * 1e6 + 0.5e0) / 1e6 AS mean_gap_ms,
       floor(sqrt(greatest(msq - mu * mu, 0.0)) * 1e6 + 0.5e0) / 1e6 AS std_gap_ms,
       floor((sqrt(greatest(msq - mu * mu, 0.0)) - mu)
             / (sqrt(greatest(msq - mu * mu, 0.0)) + mu) * 1e6 + 0.5e0) / 1e6
         AS burstiness
FROM m
""",
)
def user_burstiness_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Goh-Barabasi burstiness B = (sigma - mu) / (sigma + mu) of each
    user's inter-event times — the temporal-dynamics read that
    separates Poisson-like visitors (B ~ (sigma-mu)/(sigma+mu) near
    -1/3 for near-regular, 0 for Poisson, ->1 for bursty) and feeds
    politeness/rate models (the reference's per-domain timers assume a
    rate; this measures whether that assumption holds). Inter-arrival
    gaps come from a KEYED lag window (fully parallel on the user
    key); moments are exact integer/decimal sums per user, so sigma,
    mu, and B are engine-identical. Users with < 5 gaps are dropped in
    both engines.

    r11 (caught by the sf1.0 magnitude gate): the squared-gap sum is
    carried as TWO bigint sums split at 1e6 per row instead of one
    DECIMAL(38,0) — at ~4.5e20 the single decimal's DOUBLE cast is
    multi-step (hugeint hi*2^64+lo) in DuckDB but correctly-rounded in
    the JVM, a 1-ulp divergence; the hi/lo parts stay below 2^53
    (exact doubles, good to ~sf20) and recombine with two identical
    IEEE ops. Per-row gap*gap fits int64 because the events corpus
    spans 30 days (max gap 2.6e9 ms, square 6.7e18 < 2^63; DuckDB
    would error loudly on a wider span, Spark would wrap — revisit the
    split factor before pointing this at a multi-year event table)."""
    ev = t(spark, sf_dir, "events").selectExpr("user_id", f"{EV_MS} AS ms", "event_id")
    w = Window.partitionBy("user_id").orderBy("ms", "event_id")
    gap0 = F.col("ms") - F.lag("ms").over(w)
    # r12 (ADVICE): loud guard at the int64 gap*gap bound — Spark's
    # non-ANSI gap*gap wraps silently past 3e9 ms while the DuckDB twin
    # errors; the lazy CASE (cusum/ewma idiom) makes both engines fail
    # identically instead of diverging. Never fires on the 30-day corpus.
    gaps = ev.withColumn(
        "gap",
        F.when(
            gap0 >= F.lit(3_000_000_000),
            F.raise_error(
                F.lit(
                    "user_burstiness: gap >= 3e9 ms breaches the int64 "
                    "gap*gap bound; widen the split factor"
                )
            ).cast("long"),
        ).otherwise(gap0),
    )
    s = (
        gaps.where(F.col("gap").isNotNull())
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_gaps"),
            F.sum("gap").cast("long").alias("sg"),
            F.sum(F.expr("gap * gap DIV 1000000")).cast("long").alias("sgg_hi"),
            F.sum(F.expr("gap * gap % 1000000")).cast("long").alias("sgg_lo"),
        )
        .where(F.col("n_gaps") >= BURST_MIN_EVENTS)
    )
    # floor(x*1e6 + 0.5)/1e6 instead of round(x, 6): std scaled by 1e6
    # sits at ~3e13 where a double ulp is ~4e-3, so engine round()
    # implementations (BigDecimal HALF_UP vs multiply-then-nearest)
    # disagree on real draws at 15k users — the r10 ewma class; the
    # floor idiom is every-op-IEEE-identical at ANY magnitude
    mu = "CAST(sg AS DOUBLE) / n_gaps"
    msq = "(CAST(sgg_hi AS DOUBLE) * 1000000e0 + CAST(sgg_lo AS DOUBLE)) / n_gaps"
    sd = f"sqrt(greatest({msq} - ({mu}) * ({mu}), 0.0))"
    return s.selectExpr(
        "user_id",
        "n_gaps",
        f"floor(({mu}) * 1e6 + 0.5e0) / 1e6 AS mean_gap_ms",
        f"floor(({sd}) * 1e6 + 0.5e0) / 1e6 AS std_gap_ms",
        f"floor((({sd}) - ({mu})) / (({sd}) + ({mu})) * 1e6 + 0.5e0) / 1e6"
        " AS burstiness",
    )


# ---------------------------------------------------------------------------
# fano_factor_daily
# ---------------------------------------------------------------------------

@register(
    "fano_factor_daily",
    oracle="""
WITH d AS (
  SELECT event_type,
         date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day_idx,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY event_type, day_idx
),
s AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
         CAST(sum(c) AS BIGINT) AS sc,
         CAST(sum(c * c) AS BIGINT) AS scc
  FROM d GROUP BY event_type
)
SELECT event_type, n_days, sc AS n_events,
       round(CAST(sc AS DOUBLE) / n_days, 6) AS mean_daily,
       round((CAST(scc AS DOUBLE) / n_days
              - (CAST(sc AS DOUBLE) / n_days) * (CAST(sc AS DOUBLE) / n_days))
             / (CAST(sc AS DOUBLE) / n_days), 6) AS fano_factor
FROM s
""",
)
def fano_factor_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fano factor (variance-to-mean ratio of daily counts) per event
    type — the dispersion test against a Poisson arrival model (F = 1
    pure Poisson, > 1 overdispersed/bursty, < 1 regularized): the
    aggregate-level companion of user_burstiness_index, and the
    capacity-planning read for rate gauges. One (type, day) count
    aggregate (calendar-bounded output), INTEGER-exact count moments,
    one final exact-ratio division per type."""
    d = (
        t(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01").cast("date"))
            .cast("long")
            .alias("day_idx"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    s = d.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("c").cast("long").alias("sc"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("scc"),
    )
    mu = "CAST(sc AS DOUBLE) / n_days"
    return s.selectExpr(
        "event_type",
        "n_days",
        "sc AS n_events",
        f"round({mu}, 6) AS mean_daily",
        f"round((CAST(scc AS DOUBLE) / n_days - ({mu}) * ({mu})) / ({mu}), 6)"
        " AS fano_factor",
    )
