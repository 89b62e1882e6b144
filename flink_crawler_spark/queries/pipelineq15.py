"""Wave 16: statistical inference at scale.

  * poisson_bootstrap_ci — Poisson(1) bootstrap confidence interval for
    the mean order price (Chamandy et al., "Estimating Uncertainty for
    Massive Data Streams", Google 2012): B resamples in ONE pass, no
    per-replica shuffling of the data.
  * kaplan_meier_conversion — Kaplan-Meier product-limit survival curve
    for signup -> first high-value purchase, right-censored at the end
    of the observation window.
  * woe_iv_price_bins — weight-of-evidence / information-value binning
    of order price against the urgent-priority label (the credit-scoring
    feature-screening primitive).
  * theil_sen_trend — Theil-Sen robust trend (median of pairwise slopes)
    of the daily revenue series.

All exact-value DuckDB oracles.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .base import register, t
from .base import dec_to_double_wide as _d2dw
from .base import dec_to_double_wide_sql as _d2dws

DAY_MS = 86_400_000
_HEX = "0123456789abcdef"
_SCALE = 16**6

# ---------------------------------------------------------------------------
# poisson_bootstrap_ci
# ---------------------------------------------------------------------------

BOOT_B = 32

# Poisson(1) inverse-CDF thresholds over [0, 16^6): weight k for
# u in [T_{k-1}, T_k); computed once in Python and inlined as INTEGER
# literals into both engines' plans, so the resample weights are
# engine-exact by construction.
_POIS_T = []
_cum = 0.0
for _k in range(9):
    _cum += math.exp(-1.0) / math.factorial(_k)
    _POIS_T.append(min(int(_cum * _SCALE), _SCALE))


def _pois_case(u: str) -> str:
    branches = " ".join(
        f"WHEN {u} < {t} THEN {k}" for k, t in enumerate(_POIS_T)
    )
    return f"(CASE {branches} ELSE 9 END)"


def _md5_u_sql(key: str) -> str:
    """First 6 md5 hex digits of ``key`` as an integer in [0, 16^6) —
    DuckDB spelling (strpos); the Spark twin uses locate."""
    return (
        "("
        + " + ".join(
            f"(strpos('{_HEX}', substr(md5({key}), {i + 1}, 1)) - 1) * {16 ** (5 - i)}"
            for i in range(6)
        )
        + ")"
    )


@register(
    "poisson_bootstrap_ci",
    oracle=f"""
WITH o AS (
  SELECT o_orderkey, CAST(round(o_totalprice, 2) AS DECIMAL(18,2)) AS x
  FROM orders
),
r AS (
  SELECT o_orderkey, x, unnest(generate_series(0, {BOOT_B - 1})) AS b FROM o
),
w AS (
  SELECT b, x,
         {_pois_case(_md5_u_sql("CAST(o_orderkey AS VARCHAR) || '#' || CAST(b AS VARCHAR)"))} AS w
  FROM r
),
m AS (
  SELECT b,
         round({_d2dws('sum(CAST(w * x AS DECIMAL(38,2)))', 2)}
               / CAST(sum(w) AS BIGINT), 6) AS mean_b
  FROM w GROUP BY b
),
full_m AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         round({_d2dws('sum(x)', 2)} / count(*), 6) AS mean_price
  FROM o
)
SELECT full_m.n AS n_orders, full_m.mean_price,
       CAST(count(*) AS BIGINT) AS n_replicas,
       round(quantile_cont(mean_b, 0.025), 6) AS ci_lo,
       round(quantile_cont(mean_b, 0.975), 6) AS ci_hi
FROM m CROSS JOIN full_m
GROUP BY full_m.n, full_m.mean_price
""",
)
def poisson_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson bootstrap 95% CI for the mean order price — the
    uncertainty estimate that actually scales: instead of materializing
    B resampled datasets, every row contributes a Poisson(1) weight to each
    of B=32 replicas in ONE scan (Chamandy et al. 2012; the classic
    n-out-of-n bootstrap is a no-op at 100 TB, this is what replaces
    it). The weight is a deterministic inverse-CDF lookup on the first
    6 md5 hex digits of (orderkey, replica) — integer thresholds inlined
    identically into both engines — replica means are DECIMAL-summed
    exact ratios, and the CI is an exact interpolated quantile over the
    32 replica means. Plan shape: one 32x row explode feeding one
    map-side-combinable aggregate on the replica id; no data shuffle
    depends on corpus size."""
    o = t(spark, sf_dir, "orders").select(
        "o_orderkey", F.round("o_totalprice", 2).cast("decimal(18,2)").alias("x")
    )
    r = o.withColumn("b", F.explode(F.sequence(F.lit(0), F.lit(BOOT_B - 1))))
    key = "CAST(o_orderkey AS STRING) || '#' || CAST(b AS STRING)"
    u = "(" + " + ".join(
        f"(locate(substr(md5({key}), {i + 1}, 1), '{_HEX}') - 1) * {16 ** (5 - i)}"
        for i in range(6)
    ) + ")"
    w = r.withColumn("w", F.expr(_pois_case(u)))
    m = w.groupBy("b").agg(
        F.round(
            _d2dw(F.sum((F.col("w") * F.col("x")).cast("decimal(38,2)")), 2)
            / F.sum("w").cast("long"),
            6,
        ).alias("mean_b")
    )
    full_m = o.agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.round(_d2dw(F.sum("x"), 2) / F.count(F.lit(1)), 6).alias("mean_price"),
    )
    return (
        m.crossJoin(F.broadcast(full_m))
        .groupBy("n_orders", "mean_price")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_replicas"),
            F.round(F.expr("percentile(mean_b, 0.025)"), 6).alias("ci_lo"),
            F.round(F.expr("percentile(mean_b, 0.975)"), 6).alias("ci_hi"),
        )
    )


# ---------------------------------------------------------------------------
# kaplan_meier_conversion
# ---------------------------------------------------------------------------

KM_VALUE_MIN = 90.0  # "conversion" = first purchase with value >= this


@register(
    "kaplan_meier_conversion",
    oracle=f"""
WITH ev AS (
  SELECT user_id, event_type, value, CAST(epoch_ms(ts) AS BIGINT) AS ms FROM events
),
obs AS (SELECT max(ms) AS obs_end FROM ev),
s AS (SELECT user_id, min(ms) AS s_ms FROM ev WHERE event_type = 'signup' GROUP BY user_id),
p AS (
  SELECT s.user_id, min(ev.ms) AS p_ms
  FROM s JOIN ev ON ev.user_id = s.user_id AND ev.event_type = 'purchase'
              AND ev.value >= {KM_VALUE_MIN} AND ev.ms >= s.s_ms
  GROUP BY s.user_id
),
km_in AS (
  SELECT s.user_id,
         CASE WHEN p.p_ms IS NOT NULL THEN (p.p_ms - s.s_ms) // {DAY_MS}
              ELSE (obs.obs_end - s.s_ms) // {DAY_MS} END AS dur,
         CASE WHEN p.p_ms IS NOT NULL THEN 1 ELSE 0 END AS ev
  FROM s LEFT JOIN p ON p.user_id = s.user_id CROSS JOIN obs
),
g AS (
  SELECT dur, CAST(sum(ev) AS BIGINT) AS d, CAST(sum(1 - ev) AS BIGINT) AS c
  FROM km_in GROUP BY dur
),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM km_in),
rk AS (
  SELECT dur, d, c,
         nn.n - CAST(coalesce(sum(d + c) OVER (ORDER BY dur
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS at_risk
  FROM g CROSS JOIN nn
),
lf AS (
  SELECT dur, d, c, at_risk,
         CASE WHEN d = 0 THEN CAST(0 AS DECIMAL(38,12))
              WHEN d < at_risk
              THEN CAST(round(ln(CAST(at_risk - d AS DOUBLE) / at_risk), 12)
                        AS DECIMAL(38,12))
              ELSE NULL END AS lnf,
         CASE WHEN d >= at_risk THEN 1 ELSE 0 END AS hit0
  FROM rk
),
cum AS (
  SELECT dur, d, c, at_risk,
         sum(lnf) OVER (ORDER BY dur
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cl,
         CAST(sum(hit0) OVER (ORDER BY dur
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS z
  FROM lf
)
SELECT dur AS dur_day, at_risk, d AS n_event, c AS n_censored,
       CASE WHEN z > 0 THEN 0.0
            ELSE round(exp(CAST(cl AS DOUBLE)), 9) END AS survival
FROM cum
""",
)
def kaplan_meier_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier product-limit survival curve for the time from
    signup to first HIGH-VALUE purchase (value >= 90), right-censored
    at the end of the observation window — the time-to-event read
    (conversion lag, churn, crawl-refresh latency) that naive averages
    get wrong under censoring. The per-user duration extraction is two
    bounded aggregates + one keyed join; the curve itself lives on the
    duration-grouped table whose cardinality is OBSERVATION DAYS (time-
    bounded, ~31 here), so its ordered windows are tiny by construction.
    S(t) = prod (1 - d_i/n_i) is computed as exp(sum ln(.)) with the
    12dp-round-then-DECIMAL-sum discipline (the BM25/ln precedent), with
    an explicit zero clamp once d_i == n_i exhausts the risk set."""
    ev = t(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        "value",
        F.expr("unix_millis(cast(ts as timestamp_ltz))").alias("ms"),
    )
    obs = ev.agg(F.max("ms").alias("obs_end"))
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ms").alias("s_ms"))
        # per-user table feeding the purchase join AND the duration
        # projection; pin so the signup scan + shuffle run once
        .localCheckpoint(eager=True)
    )
    p = (
        s.join(ev, "user_id")
        .filter(
            (F.col("event_type") == "purchase")
            & (F.col("value") >= KM_VALUE_MIN)
            & (F.col("ms") >= F.col("s_ms"))
        )
        .groupBy("user_id")
        .agg(F.min("ms").alias("p_ms"))
    )
    km_in = (
        s.join(p, "user_id", "left")
        .crossJoin(F.broadcast(obs))
        .select(
            F.when(
                F.col("p_ms").isNotNull(),
                F.expr(f"(p_ms - s_ms) div {DAY_MS}"),
            )
            .otherwise(F.expr(f"(obs_end - s_ms) div {DAY_MS}"))
            .alias("dur"),
            F.when(F.col("p_ms").isNotNull(), 1).otherwise(0).alias("ev"),
        )
    )
    g = km_in.groupBy("dur").agg(
        F.sum("ev").cast("long").alias("d"),
        F.sum(1 - F.col("ev")).cast("long").alias("c"),
    )
    nn = km_in.agg(F.count(F.lit(1)).cast("long").alias("n"))
    # dur-grouped table is bounded by observation DAYS (~31 rows): the
    # prefix sums run as triangular broadcast self-joins instead of
    # unpartitioned windows (WindowExec-free — round-6 verdict task 7)
    from ..operators.windows import bounded_cumsum

    rk = (
        bounded_cumsum(
            g.withColumn("dc", F.col("d") + F.col("c")),
            [("dur", True)],
            [("dc", "cum_dc", False)],
        )
        .crossJoin(F.broadcast(nn))
        .withColumn(
            "at_risk",
            F.col("n") - F.coalesce(F.col("cum_dc"), F.lit(0)).cast("long"),
        )
    )
    lf = rk.withColumn(
        "lnf",
        F.when(F.col("d") == 0, F.lit(0).cast("decimal(38,12)"))
        .when(
            F.col("d") < F.col("at_risk"),
            F.round(
                F.log((F.col("at_risk") - F.col("d")).cast("double") / F.col("at_risk")),
                12,
            ).cast("decimal(38,12)"),
        )
        .otherwise(F.lit(None)),
    ).withColumn("hit0", F.when(F.col("d") >= F.col("at_risk"), 1).otherwise(0))
    cum = bounded_cumsum(
        lf, [("dur", True)], [("lnf", "cl", True), ("hit0", "z0", True)]
    ).withColumn("z", F.col("z0").cast("long"))
    return cum.select(
        F.col("dur").alias("dur_day"),
        "at_risk",
        F.col("d").alias("n_event"),
        F.col("c").alias("n_censored"),
        F.when(F.col("z") > 0, F.lit(0.0))
        .otherwise(F.round(F.exp(F.col("cl").cast("double")), 9))
        .alias("survival"),
    )


# ---------------------------------------------------------------------------
# woe_iv_price_bins
# ---------------------------------------------------------------------------

WOE_BINS = 10


@register(
    "woe_iv_price_bins",
    oracle=f"""
WITH o AS (
  SELECT o_totalprice AS p,
         CASE WHEN substr(o_orderpriority, 1, 1) IN ('1', '2') THEN 1 ELSE 0 END AS bad
  FROM orders
),
bx AS (SELECT min(p) AS p0, max(p) AS p1 FROM o),
bo AS (
  SELECT least(CAST(floor((p - bx.p0) * {WOE_BINS} / (bx.p1 - bx.p0)) AS BIGINT),
               {WOE_BINS - 1}) AS bin,
         bad
  FROM o CROSS JOIN bx
),
g AS (
  SELECT bin, CAST(sum(1 - bad) AS BIGINT) AS n_good,
         CAST(sum(bad) AS BIGINT) AS n_bad
  FROM bo GROUP BY bin
),
tt AS (SELECT CAST(sum(n_good) AS BIGINT) AS gg, CAST(sum(n_bad) AS BIGINT) AS bb FROM g)
SELECT g.bin, g.n_good, g.n_bad,
       round(ln(((g.n_good + 0.5) / (tt.gg + {WOE_BINS * 0.5}))
                / ((g.n_bad + 0.5) / (tt.bb + {WOE_BINS * 0.5}))), 9) AS woe,
       round(((g.n_good + 0.5) / (tt.gg + {WOE_BINS * 0.5})
              - (g.n_bad + 0.5) / (tt.bb + {WOE_BINS * 0.5}))
             * round(ln(((g.n_good + 0.5) / (tt.gg + {WOE_BINS * 0.5}))
                        / ((g.n_bad + 0.5) / (tt.bb + {WOE_BINS * 0.5}))), 9), 9)
         AS iv_term
FROM g CROSS JOIN tt
""",
)
def woe_iv_price_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-of-evidence / information-value screening of order price
    against the urgent-priority label — the univariate
    predictive-power read (credit scoring's standard feature gate,
    equally the quality-signal screen a curation pipeline runs before
    trusting a classifier feature). Ten equal-width bins via the
    price_histogram floor arithmetic, Laplace-smoothed (+0.5) class
    shares so empty cells never produce infinities, WoE =
    ln(pct_good/pct_bad) and the bin's IV contribution — every input to
    ln is an exact ratio of integers, computed identically on both
    engines and rounded to 9dp. Shape: one scan, one 10-key aggregate,
    broadcast min/max and totals."""
    o = t(spark, sf_dir, "orders").select(
        F.col("o_totalprice").alias("p"),
        F.when(F.substring("o_orderpriority", 1, 1).isin("1", "2"), 1)
        .otherwise(0)
        .alias("bad"),
    )
    bx = o.agg(F.min("p").alias("p0"), F.max("p").alias("p1"))
    g = (
        o.crossJoin(F.broadcast(bx))
        .select(
            F.least(
                F.floor((F.col("p") - F.col("p0")) * WOE_BINS / (F.col("p1") - F.col("p0"))),
                F.lit(WOE_BINS - 1),
            )
            .cast("long")
            .alias("bin"),
            "bad",
        )
        .groupBy("bin")
        .agg(
            F.sum(1 - F.col("bad")).cast("long").alias("n_good"),
            F.sum("bad").cast("long").alias("n_bad"),
        )
    )
    tt = g.agg(
        F.sum("n_good").cast("long").alias("gg"), F.sum("n_bad").cast("long").alias("bb")
    )
    half = WOE_BINS * 0.5
    pg = (F.col("n_good") + 0.5) / (F.col("gg") + half)
    pb = (F.col("n_bad") + 0.5) / (F.col("bb") + half)
    woe = F.round(F.log(pg / pb), 9)
    return g.crossJoin(F.broadcast(tt)).select(
        "bin",
        "n_good",
        "n_bad",
        woe.alias("woe"),
        F.round((pg - pb) * woe, 9).alias("iv_term"),
    )


# ---------------------------------------------------------------------------
# theil_sen_trend
# ---------------------------------------------------------------------------


@register(
    "theil_sen_trend",
    oracle=f"""
WITH daily AS (
  SELECT CAST(epoch_ms(o_orderdate) AS BIGINT) // {DAY_MS} AS dayn,
         CAST(sum(CAST(round(o_totalprice, 2) AS DECIMAL(18,2)))
              AS DECIMAL(28,2)) AS rev
  FROM orders GROUP BY dayn
),
pairs AS (
  SELECT {_d2dws('b.rev - a.rev', 2)} / (b.dayn - a.dayn) AS slope
  FROM daily a JOIN daily b ON b.dayn > a.dayn
),
rp AS (
  SELECT slope, row_number() OVER (ORDER BY slope) AS rn,
         CAST(count(*) OVER () AS BIGINT) AS n
  FROM pairs
),
sl AS (
  SELECT round((max(CASE WHEN rn = (n + 1) // 2 THEN slope END)
              + max(CASE WHEN rn = n // 2 + 1 THEN slope END)) / 2, 9) AS slope,
         CAST(max(n) AS BIGINT) AS n_pairs
  FROM rp
)
SELECT CAST((SELECT count(*) FROM daily) AS BIGINT) AS n_days,
       sl.n_pairs, sl.slope,
       round(quantile_cont({_d2dws('d.rev', 2)} - sl.slope * d.dayn, 0.5), 6)
         AS intercept
FROM daily d CROSS JOIN sl
GROUP BY sl.n_pairs, sl.slope
""",
)
def theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend of the daily revenue series: the median
    of all pairwise slopes (breakdown point 29% — outlier days cannot
    drag it the way OLS lets them), intercept = median residual at that
    slope. The pair join is quadratic ONLY in calendar days (time-
    bounded: ~2.4k days -> ~3M pairs whatever the fact-table volume),
    after a one-shuffle exact-DECIMAL daily rollup. The slope median is
    the EXACT ORDER-STATISTIC midpoint (x[(n+1) div 2] + x[n div 2 + 1])
    / 2 via the two-phase distributed rank — both engines evaluate the
    IDENTICAL IEEE expression on the identical two elements, and unlike
    the exact `percentile` aggregate it never concatenates 3M values
    into one merge buffer (measured 7.9 s -> sub-second at sf0.1); the
    2.4k-row intercept median stays an interpolated percentile (the
    order_percentiles precedent). Every slope is one IEEE division of a
    DECIMAL-exact revenue difference — bit-equal across engines."""
    daily = (
        t(spark, sf_dir, "orders")
        .groupBy(
            F.expr(f"unix_millis(cast(o_orderdate as timestamp_ltz)) div {DAY_MS}").alias(
                "dayn"
            )
        )
        .agg(
            F.sum(F.round("o_totalprice", 2).cast("decimal(18,2)"))
            .cast("decimal(28,2)")
            .alias("rev")
        )
        # day-level rollup feeding both pair-join sides, the intercept
        # median, and the day count; pin so the fact scan runs once
        .localCheckpoint(eager=True)
    )
    # AQE coalesces the 2.4k-row rollup to ONE post-shuffle partition;
    # the nested-loop pair join inherits the left side's partitioning,
    # so without this repartition the whole ~3M-pair expansion runs on
    # a single task (the measured single-split BNLJ trap — SCALE.md
    # round-5 perf note; 9.1 s -> 2.1 s at sf0.1). Broadcast the probe
    # side explicitly so the stream side keeps its 32 splits.
    a = daily.repartition(32).alias("a")
    b = F.broadcast(daily).alias("b")
    pairs = (
        a.join(b, F.col("b.dayn") > F.col("a.dayn"))
        .select(
            (
                _d2dw(F.col("b.rev") - F.col("a.rev"), 2)
                / (F.col("b.dayn") - F.col("a.dayn"))
            ).alias("slope")
        )
        # consumed three times (the two-phase rank's both passes + the
        # pair count) — pin the ~3M x 8-byte slope column so the BNLJ
        # expansion runs once
        .localCheckpoint(eager=True)
    )
    # r12 (guide §1.2/§8, the facility_location precedent): the pair set
    # is CALENDAR-bounded (~2.9M slopes at every SF — days², not fact
    # rows), so below TS_DRIVER_MAX the two exact order statistics come
    # from an O(n) numpy selection on the already-materialized slope
    # column instead of the two-pass distributed rank (which re-shuffled
    # and re-sorted all ~3M rows twice). Only the SELECTION moves to the
    # driver: the selected values re-enter the plan as double literals
    # and the midpoint/round/intercept arithmetic stays in Spark,
    # bit-identical. Corpora past the gate keep the distributed rank.
    TS_DRIVER_MAX = 20_000_000
    n_pairs = pairs.count()  # one cheap job over the pinned 8-byte column
    if n_pairs <= TS_DRIVER_MAX:
        import numpy as np

        sp = pairs.toPandas()["slope"].to_numpy()
        k1, k2 = (n_pairs + 1) // 2, n_pairs // 2 + 1
        s1 = float(np.partition(sp, k1 - 1)[k1 - 1])
        s2 = float(np.partition(sp, k2 - 1)[k2 - 1])
        sl = spark.range(1).select(
            F.round((F.lit(s1) + F.lit(s2)) / 2, 9).alias("slope"),
            F.lit(n_pairs).cast("long").alias("n_pairs"),
        )
    else:
        from ..operators.partitioning import distributed_row_number

        ranked = distributed_row_number(pairs, ["slope"], out="rn")
        np_ = pairs.agg(F.count(F.lit(1)).cast("long").alias("n"))
        sl = (
            ranked.crossJoin(F.broadcast(np_))
            .filter(
                (F.col("rn") == F.expr("(n + 1) div 2"))
                | (F.col("rn") == F.expr("n div 2 + 1"))
            )
            .agg(
                F.round(
                    (
                        F.max(
                            F.when(F.col("rn") == F.expr("(n + 1) div 2"), F.col("slope"))
                        )
                        + F.max(F.when(F.col("rn") == F.expr("n div 2 + 1"), F.col("slope")))
                    )
                    / 2,
                    9,
                ).alias("slope"),
                F.max("n").cast("long").alias("n_pairs"),
            )
        )
    nd = daily.agg(F.count(F.lit(1)).cast("long").alias("n_days"))
    return (
        daily.withColumn("rev_d", _d2dw(F.col("rev"), 2))
        .crossJoin(F.broadcast(sl))
        .crossJoin(F.broadcast(nd))
        .groupBy("n_days", "n_pairs", "slope")
        .agg(
            F.round(
                F.expr("percentile(rev_d - slope * dayn, 0.5)"), 6
            ).alias("intercept")
        )
    )
