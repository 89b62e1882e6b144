"""Wave 29: uncertainty quantification and experimentation statistics.

  * conformal_prediction_interval — split-conformal prediction interval
    for order price under a category-mean model, with measured test
    coverage (the distribution-free uncertainty wrapper).
  * cuped_variance_reduction — CUPED pre-period covariate adjustment
    (Deng et al. 2013): the variance-reduction trick every A/B platform
    runs, with the measured variance ratio.
  * mcnemar_gate_test — McNemar's paired test on two quality gates'
    discordant decisions (the paired-classifier comparison that raw
    accuracy deltas get wrong).

All exact-value DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .base import EV_MS, register, t
from .base import dec_to_double_wide as _d2dw
from .base import dec_to_double_wide_sql as _d2dws

# ---------------------------------------------------------------------------
# conformal_prediction_interval
# ---------------------------------------------------------------------------

CONF_ALPHA = 0.1  # 90% target coverage
# md5 thirds: '0'-'4' train (~5/16), '5'-'9' calibration, 'a'-'f' test.
# The key is SALTED ('conf#' prefix): the synthetic generator itself
# derives values from key hashes, so an unsalted first-digit split
# correlates with price and breaks exchangeability (measured: test
# coverage 0.81 at a 0.90 target; salted: on-target).
_SPLIT_DUCK = """CASE WHEN substr(md5('conf#' || CAST(o_orderkey AS VARCHAR)), 1, 1) <= '4' THEN 'train'
     WHEN substr(md5('conf#' || CAST(o_orderkey AS VARCHAR)), 1, 1) <= '9' THEN 'cal'
     ELSE 'test' END"""
_SPLIT_SPARK = _SPLIT_DUCK.replace("AS VARCHAR", "AS STRING")


@register(
    "conformal_prediction_interval",
    oracle=f"""
WITH o AS (
  SELECT o_orderkey, o_orderstatus AS cat,
         CAST(round(o_totalprice, 2) AS DECIMAL(18,2)) AS y,
         {_SPLIT_DUCK} AS split
  FROM orders
),
model AS (
  SELECT cat, round({_d2dws('sum(y)', 2)} / count(*), 6) AS pred
  FROM o WHERE split = 'train' GROUP BY cat
),
cal AS (
  SELECT o.o_orderkey, abs(CAST(o.y AS DOUBLE) - model.pred) AS resid
  FROM o JOIN model ON model.cat = o.cat WHERE o.split = 'cal'
),
ranked AS (
  SELECT resid,
         CAST(row_number() OVER (ORDER BY resid ASC, o_orderkey ASC) AS BIGINT) AS rnk
  FROM cal
),
nc AS (SELECT CAST(count(*) AS BIGINT) AS n_cal FROM cal),
qhat AS (
  -- conformal q_hat is the ceil((n+1)(1-alpha))-th ORDER STATISTIC of
  -- the calibration residuals (integer-exact index, no interpolation)
  SELECT nc.n_cal,
         max(CASE WHEN ranked.rnk <= least(nc.n_cal, (9 * (nc.n_cal + 1) + 9) // 10)
             THEN ranked.resid END) AS q
  FROM ranked CROSS JOIN nc
  GROUP BY nc.n_cal
),
test AS (
  SELECT CAST(count(*) AS BIGINT) AS n_test,
         CAST(sum(CASE WHEN abs(CAST(o.y AS DOUBLE) - model.pred) <= qhat.q
                  THEN 1 ELSE 0 END) AS BIGINT) AS n_covered
  FROM o JOIN model ON model.cat = o.cat CROSS JOIN qhat
  WHERE o.split = 'test'
)
SELECT qhat.n_cal, round(qhat.q, 6) AS q_hat,
       test.n_test, test.n_covered,
       round(CAST(test.n_covered AS DOUBLE) / CAST(test.n_test AS DOUBLE), 9)
         AS test_coverage
FROM qhat CROSS JOIN test
""",
)
def conformal_prediction_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal prediction interval (Vovk; Angelopoulos & Bates
    tutorial form): fit a trivial category-mean model on the train
    split, take the ceil((n+1)(1-alpha))/n calibration quantile of
    absolute residuals as the interval half-width q_hat, and MEASURE
    coverage on the held-out test split — the distribution-free
    uncertainty wrapper that needs no model internals, which is what
    makes it the production choice. All three splits are md5-gated
    (engine-identical); the model and q_hat are bounded aggregates
    broadcast back; coverage is one conditional count. Finite-sample
    guarantee says test coverage >= 1 - alpha in expectation — the
    pytest pins it within sampling noise."""
    o = t(spark, sf_dir, "orders").selectExpr(
        "o_orderkey",
        "o_orderstatus AS cat",
        "CAST(round(o_totalprice, 2) AS DECIMAL(18,2)) AS y",
        f"{_SPLIT_SPARK} AS split",
    ).localCheckpoint(eager=True)
    model = (
        o.where(F.col("split") == "train")
        .groupBy("cat")
        .agg(F.round(_d2dw(F.sum("y"), 2) / F.count(F.lit(1)), 6).alias("pred"))
    )
    from ..operators.partitioning import distributed_order_statistics

    cal = (
        o.where(F.col("split") == "cal")
        .join(F.broadcast(model), "cat")
        .selectExpr("o_orderkey", "abs(CAST(y AS DOUBLE) - pred) AS resid")
    )
    # q_hat = the ceil((n+1)(1-alpha))-th order statistic, integer-exact.
    # r12 (guide §1.2 step 1): the previous form ranked EVERY calibration
    # residual and scanned them all again under a running max just to
    # read this one rank; the targeted two-phase selection ranks only
    # the range partition holding it, and the value re-enters the plan
    # as a CAST('repr' AS DOUBLE) literal (bit-identical — it IS the
    # collected double; the winsorized/theil_sen idiom). rnk's (resid,
    # o_orderkey) tie-break order is unchanged.
    probe, n_cal = distributed_order_statistics(
        cal,
        ["resid", "o_orderkey"],
        lambda n: [min(n, (9 * (n + 1) + 9) // 10)],
    )
    k = min(n_cal, (9 * (n_cal + 1) + 9) // 10)
    q_lit = f"CAST('{float(probe[k]['resid'])!r}' AS DOUBLE)"
    test = (
        o.where(F.col("split") == "test")
        .join(F.broadcast(model), "cat")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_test"),
            F.sum(
                F.when(
                    F.expr("abs(CAST(y AS DOUBLE) - pred)") <= F.expr(q_lit), 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_covered"),
        )
    )
    return test.selectExpr(
        f"CAST({n_cal} AS BIGINT) AS n_cal",
        f"round({q_lit}, 6) AS q_hat",
        "n_test",
        "n_covered",
        "round(CAST(n_covered AS DOUBLE) / CAST(n_test AS DOUBLE), 9) AS test_coverage",
    )


# ---------------------------------------------------------------------------
# cuped_variance_reduction
# ---------------------------------------------------------------------------

CUPED_SPLIT_DAY = 15  # Jan 1-15 = pre-period, rest = experiment period


_CUPED_XX = (
    "sum(CAST(CAST(x AS DECIMAL(19,6)) * CAST(x AS DECIMAL(19,6))"
    " AS DECIMAL(38,12)))"
)
_CUPED_XY = (
    "sum(CAST(CAST(x AS DECIMAL(19,6)) * CAST(y AS DECIMAL(19,6))"
    " AS DECIMAL(38,12)))"
)
_CUPED_YY = (
    "sum(CAST(CAST(y AS DECIMAL(19,6)) * CAST(y AS DECIMAL(19,6))"
    " AS DECIMAL(38,12)))"
)


@register(
    "cuped_variance_reduction",
    oracle=f"""
WITH ev AS (
  SELECT user_id,
         CASE WHEN day(CAST(ts AS DATE)) <= {CUPED_SPLIT_DAY}
              AND month(CAST(ts AS DATE)) = 1 THEN 0 ELSE 1 END AS period,
         value
  FROM events
),
u AS (
  SELECT user_id,
         CAST(coalesce(sum(CASE WHEN period = 0
                  THEN CAST(round(value, 6) AS DECIMAL(18,6)) END), 0)
              AS DECIMAL(18,6)) AS x,
         CAST(coalesce(sum(CASE WHEN period = 1
                  THEN CAST(round(value, 6) AS DECIMAL(18,6)) END), 0)
              AS DECIMAL(18,6)) AS y
  FROM ev GROUP BY user_id
),
m AS (
  SELECT CAST(CAST(count(*) AS BIGINT) AS DOUBLE) AS n,
         {_d2dws('sum(x)')} AS sx, {_d2dws('sum(y)')} AS sy,
         {_d2dws(_CUPED_XX, 12)} AS sxx,
         {_d2dws(_CUPED_XY, 12)} AS sxy,
         {_d2dws(_CUPED_YY, 12)} AS syy
  FROM u
)
SELECT CAST(n AS BIGINT) AS n_users,
       round((sxy - sx*sy/n) / (sxx - sx*sx/n), 6) AS theta,
       round((syy - sy*sy/n) / n, 6) AS var_y,
       round(((syy - sy*sy/n)
              - (sxy - sx*sy/n) * (sxy - sx*sy/n) / (sxx - sx*sx/n)) / n, 6)
         AS var_cuped,
       round(1.0 - ((syy - sy*sy/n)
              - (sxy - sx*sy/n) * (sxy - sx*sy/n) / (sxx - sx*sx/n))
             / (syy - sy*sy/n), 9) AS variance_reduction
FROM m
""",
)
def cuped_variance_reduction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED covariate adjustment (Deng, Xu, Kohavi, Walker — WSDM
    2013): per-user experiment-period metric Y adjusted by the
    pre-period covariate X with theta = cov(X,Y)/var(X); the adjusted
    variance var(Y) - cov^2/var(X) is what shrinks every A/B test's
    confidence interval for free. One per-user conditional rollup, one
    constant-size co-moment aggregate (rounded-once DECIMAL sums), the
    closed-form theta/variances on the single moment row — identical
    expression trees in both engines. variance_reduction equals the
    squared pre/post correlation by construction; the pytest pins
    that identity."""
    ev = t(spark, sf_dir, "events").selectExpr(
        "user_id",
        f"CASE WHEN day(CAST(ts AS DATE)) <= {CUPED_SPLIT_DAY}"
        " AND month(CAST(ts AS DATE)) = 1 THEN 0 ELSE 1 END AS period",
        "value",
    )
    rv = "CAST(round(value, 6) AS DECIMAL(18,6))"
    u = ev.groupBy("user_id").agg(
        F.coalesce(F.sum(F.expr(f"CASE WHEN period = 0 THEN {rv} END")), F.lit(0))
        .cast("decimal(18,6)")
        .alias("x"),
        F.coalesce(F.sum(F.expr(f"CASE WHEN period = 1 THEN {rv} END")), F.lit(0))
        .cast("decimal(18,6)")
        .alias("y"),
    )
    m = u.agg(
        F.count(F.lit(1)).cast("long").cast("double").alias("n"),
        _d2dw(F.sum("x")).alias("sx"),
        _d2dw(F.sum("y")).alias("sy"),
        _d2dw(F.sum(F.expr("CAST(x*x AS DECIMAL(38,12))")), 12).alias("sxx"),
        _d2dw(F.sum(F.expr("CAST(x*y AS DECIMAL(38,12))")), 12).alias("sxy"),
        _d2dw(F.sum(F.expr("CAST(y*y AS DECIMAL(38,12))")), 12).alias("syy"),
    )
    return m.selectExpr(
        "CAST(n AS BIGINT) AS n_users",
        "round((sxy - sx*sy/n) / (sxx - sx*sx/n), 6) AS theta",
        "round((syy - sy*sy/n) / n, 6) AS var_y",
        "round(((syy - sy*sy/n)"
        " - (sxy - sx*sy/n) * (sxy - sx*sy/n) / (sxx - sx*sx/n)) / n, 6) AS var_cuped",
        "round(1.0 - ((syy - sy*sy/n)"
        " - (sxy - sx*sy/n) * (sxy - sx*sy/n) / (sxx - sx*sx/n))"
        " / (syy - sy*sy/n), 9) AS variance_reduction",
    )


# ---------------------------------------------------------------------------
# mcnemar_gate_test
# ---------------------------------------------------------------------------

_DUCK_TOKS = "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')"
MCN_MIN_MWL, MCN_MAX_MWL = 3.0, 10.0
MCN_MIN_TTR = 0.35


@register(
    "mcnemar_gate_test",
    oracle=f"""
WITH stats AS (
  SELECT doc_id,
         CAST(len(toks) AS DOUBLE) AS n,
         CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE) AS tot_chars,
         CAST(len(list_distinct(toks)) AS DOUBLE) AS n_distinct
  FROM (SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents)
  WHERE len(toks) > 0
),
g AS (
  SELECT CASE WHEN tot_chars / n >= {MCN_MIN_MWL} AND tot_chars / n <= {MCN_MAX_MWL}
              THEN 1 ELSE 0 END AS a,
         CASE WHEN n_distinct / n >= {MCN_MIN_TTR} THEN 1 ELSE 0 END AS b
  FROM stats
),
c AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(a * (1 - b)) AS BIGINT) AS n10,
         CAST(sum((1 - a) * b) AS BIGINT) AS n01
  FROM g
)
SELECT n, n10, n01,
       n10 + n01 AS n_discordant,
       round(CASE WHEN n10 + n01 = 0 THEN 0.0
             ELSE (abs(CAST(n10 AS DOUBLE) - CAST(n01 AS DOUBLE)) - 1.0)
                  * (abs(CAST(n10 AS DOUBLE) - CAST(n01 AS DOUBLE)) - 1.0)
                  / (CAST(n10 AS DOUBLE) + CAST(n01 AS DOUBLE)) END, 6)
         AS mcnemar_chi2
FROM c
""",
)
def mcnemar_gate_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNemar's test (with continuity correction) on the two quality
    gates' PAIRED decisions: only the discordant cells (A passes / B
    drops and vice versa) carry information about which gate is
    stricter — the paired-classifier comparison that naive accuracy
    deltas (which double-count the concordant mass) get wrong.
    Completes the rater-stats pair with filter_kappa_agreement (kappa:
    do they agree; McNemar: is the disagreement DIRECTIONAL). One
    corpus scan to four integers; the statistic is exact-integer
    arithmetic into one rounded double."""
    from ..functions.text import tokens_expr

    d = t(spark, sf_dir, "documents")
    ws = tokens_expr(F.col("text"))
    n = F.size(ws)
    nd = n.cast("double")
    tot_chars = F.aggregate(
        F.transform(ws, lambda x: F.length(x)), F.lit(0), lambda a, v: a + v
    ).cast("double")
    n_distinct = F.size(F.array_distinct(ws)).cast("double")
    g = d.filter(n > 0).select(
        F.when((tot_chars / nd >= MCN_MIN_MWL) & (tot_chars / nd <= MCN_MAX_MWL), 1)
        .otherwise(0)
        .alias("a"),
        F.when(n_distinct / nd >= MCN_MIN_TTR, 1).otherwise(0).alias("b"),
    )
    c = g.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("a") * (1 - F.col("b"))).cast("long").alias("n10"),
        F.sum((1 - F.col("a")) * F.col("b")).cast("long").alias("n01"),
    )
    return c.selectExpr(
        "n",
        "n10",
        "n01",
        "n10 + n01 AS n_discordant",
        "round(CASE WHEN n10 + n01 = 0 THEN 0.0"
        " ELSE (abs(CAST(n10 AS DOUBLE) - CAST(n01 AS DOUBLE)) - 1.0)"
        " * (abs(CAST(n10 AS DOUBLE) - CAST(n01 AS DOUBLE)) - 1.0)"
        " / (CAST(n10 AS DOUBLE) + CAST(n01 AS DOUBLE)) END, 6) AS mcnemar_chi2",
    )
