"""Wave 17: model-fitting and drift-detection statistics.

  * ols_price_on_qty_discount — closed-form multiple linear regression
    (normal equations + Cramer's rule) of price on quantity & discount:
    the "fit a linear model on 100 TB in one pass" primitive.
  * chi_square_priority_status — chi-square test of independence between
    two categorical columns, with Cramer's V effect size.
  * psi_price_drift — population stability index of the order-price
    distribution between two calendar years: the standard production
    drift monitor for features/scores.
  * ks_two_sample_price — exact two-sample Kolmogorov-Smirnov statistic
    via an integer-exact distributed prefix sum over the value domain.

All exact-value DuckDB oracles. The regression/test statistics are
computed from exact DECIMAL/BIGINT co-moments; the final float algebra
is the IDENTICAL expression tree in both engines, rounded once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.partitioning import distributed_keyed_running_sum
from .base import register, t
from .base import dec_to_double_wide as _d2dw
from .base import dec_to_double_wide_sql as _d2dws

# ---------------------------------------------------------------------------
# ols_price_on_qty_discount
# ---------------------------------------------------------------------------


def _det3(m: list[list[str]]) -> str:
    """Expansion of a 3x3 determinant over named scalar expressions —
    inlined verbatim into both engines so the float algebra matches."""
    (a, b, c), (d, e, f), (g, h, i) = m
    return (
        f"({a})*(({e})*({i}) - ({f})*({h}))"
        f" - ({b})*(({d})*({i}) - ({f})*({g}))"
        f" + ({c})*(({d})*({h}) - ({e})*({g}))"
    )


# normal-equation matrix for X = [1, q, d]: all entries are exact sums.
_M = [["n", "sq", "sd"], ["sq", "sqq", "sqd"], ["sd", "sqd", "sdd"]]
_V = ["sy", "sqy", "sdy"]
_DET = _det3(_M)


def _col_replace(col: int) -> str:
    m = [row[:] for row in _M]
    for r in range(3):
        m[r][col] = _V[r]
    return _det3(m)


_BETA = [f"(({_col_replace(i)}) / ({_DET}))" for i in range(3)]
# SSE from moments: syy - b0*sy - b1*sqy - b2*sdy ; SST = syy - sy^2/n
_SSE = f"(syy - ({_BETA[0]})*sy - ({_BETA[1]})*sqy - ({_BETA[2]})*sdy)"
_SST = "(syy - sy*sy/n)"
_R2 = f"(1.0 - {_SSE}/{_SST})"

# r12: y is in KILODOLLARS (see the register block) and every moment
# rides the guarded floor-split wide cast; per-moment scales mirror the
# exact product scales (q,d scale 2 -> q*q scale 4, q*y scale 7, y*y
# scale 10), keeping each sum ~1e5-1e6 under the 9.0e15 guard at sf1.0.
_OLS_MOMENT_COLS = f"""
         CAST(CAST(count(*) AS BIGINT) AS DOUBLE) AS n,
         {_d2dws('sum(q)', 2)}  AS sq,
         {_d2dws('sum(d)', 2)}  AS sd,
         {_d2dws('sum(y)', 5)}  AS sy,
         {_d2dws('sum(CAST(q*q AS DECIMAL(38,4)))', 4)} AS sqq,
         {_d2dws('sum(CAST(q*d AS DECIMAL(38,4)))', 4)} AS sqd,
         {_d2dws('sum(CAST(d*d AS DECIMAL(38,4)))', 4)} AS sdd,
         {_d2dws('sum(CAST(q*y AS DECIMAL(38,7)))', 7)} AS sqy,
         {_d2dws('sum(CAST(d*y AS DECIMAL(38,7)))', 7)} AS sdy,
         {_d2dws('sum(CAST(y*y AS DECIMAL(38,10)))', 10)} AS syy
"""

# betas are fit against y in kilodollars; multiply by 1000 (one exact-
# operand IEEE multiply, identical in both engines) to report dollars.
# r_squared is unit-invariant.
_OLS_OUT_COLS = [
    "CAST(n AS BIGINT) AS n_rows",
    f"round(1000 * {_BETA[0]}, 6) AS beta_intercept",
    f"round(1000 * {_BETA[1]}, 6) AS beta_quantity",
    f"round(1000 * {_BETA[2]}, 6) AS beta_discount",
    f"round({_R2}, 6) AS r_squared",
]


@register(
    "ols_price_on_qty_discount",
    oracle=f"""
WITH x AS (
  SELECT CAST(round(l_quantity, 2)      AS DECIMAL(18,2)) AS q,
         CAST(round(l_discount, 2)      AS DECIMAL(18,2)) AS d,
         CAST(round(l_extendedprice / 1000, 5) AS DECIMAL(18,5)) AS y
  FROM lineitem
),
m AS (SELECT {_OLS_MOMENT_COLS} FROM x)
SELECT {", ".join(_OLS_OUT_COLS)} FROM m
""",
)
def ols_price_on_qty_discount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiple linear regression fit in ONE distributed pass: the
    normal-equation co-moments (X'X, X'y) are exact DECIMAL sums — a
    constant-size, map-side-combinable aggregate state regardless of
    corpus size — and the 3x3 solve (Cramer's rule) runs on the single
    moment row, with the identical expression tree inlined into both
    engines. This is how you fit calibration/trend models on 100 TB
    without an ML-library shuffle-heavy solver: no gradient iterations,
    no second scan for R^2 (it also falls out of the moments)."""
    li = t(spark, sf_dir, "lineitem").select(
        F.round("l_quantity", 2).cast("decimal(18,2)").alias("q"),
        F.round("l_discount", 2).cast("decimal(18,2)").alias("d"),
        F.round(F.col("l_extendedprice") / 1000, 5).cast("decimal(18,5)").alias("y"),
    )
    # moments via the Column-API wide helper (the SQL template above is
    # DuckDB-dialect: its guard spells error(); Spark's is raise_error)
    q, d, y = F.col("q"), F.col("d"), F.col("y")
    m = li.agg(
        F.count(F.lit(1)).cast("long").cast("double").alias("n"),
        _d2dw(F.sum(q), 2).alias("sq"),
        _d2dw(F.sum(d), 2).alias("sd"),
        _d2dw(F.sum(y), 5).alias("sy"),
        _d2dw(F.sum((q * q).cast("decimal(38,4)")), 4).alias("sqq"),
        _d2dw(F.sum((q * d).cast("decimal(38,4)")), 4).alias("sqd"),
        _d2dw(F.sum((d * d).cast("decimal(38,4)")), 4).alias("sdd"),
        _d2dw(F.sum((q * y).cast("decimal(38,7)")), 7).alias("sqy"),
        _d2dw(F.sum((d * y).cast("decimal(38,7)")), 7).alias("sdy"),
        _d2dw(F.sum((y * y).cast("decimal(38,10)")), 10).alias("syy"),
    )
    return m.selectExpr(*_OLS_OUT_COLS)


# ---------------------------------------------------------------------------
# chi_square_priority_status
# ---------------------------------------------------------------------------

@register(
    "chi_square_priority_status",
    oracle=f"""
WITH cells AS (
  SELECT o_orderpriority AS pri, o_orderstatus AS st,
         CAST(count(*) AS BIGINT) AS obs
  FROM orders GROUP BY 1, 2
),
rowm AS (SELECT pri, CAST(sum(obs) AS BIGINT) AS rtot FROM cells GROUP BY 1),
colm AS (SELECT st, CAST(sum(obs) AS BIGINT) AS ctot FROM cells GROUP BY 1),
tot AS (
  SELECT CAST(sum(obs) AS BIGINT) AS n,
         CAST(count(DISTINCT pri) AS BIGINT) AS nr,
         CAST(count(DISTINCT st) AS BIGINT) AS nc
  FROM cells
),
terms AS (
  SELECT CAST(round(
           (CAST(obs AS DOUBLE) - CAST(rtot AS DOUBLE)*CAST(ctot AS DOUBLE)/CAST(n AS DOUBLE))
           * (CAST(obs AS DOUBLE) - CAST(rtot AS DOUBLE)*CAST(ctot AS DOUBLE)/CAST(n AS DOUBLE))
           / (CAST(rtot AS DOUBLE)*CAST(ctot AS DOUBLE)/CAST(n AS DOUBLE)), 9)
         AS DECIMAL(38,9)) AS term
  FROM cells JOIN rowm USING (pri) JOIN colm USING (st) CROSS JOIN tot
)
SELECT tot.n AS n_orders,
       (tot.nr - 1) * (tot.nc - 1) AS dof,
       round({_d2dws('sum(term)', 9)}, 6) AS chi2,
       round(sqrt({_d2dws('sum(term)', 9)}
                  / (CAST(tot.n AS DOUBLE)
                     * CAST(least(tot.nr, tot.nc) - 1 AS DOUBLE))), 6) AS cramers_v
FROM terms CROSS JOIN tot
GROUP BY tot.n, tot.nr, tot.nc
""",
)
def chi_square_priority_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square test of independence (order priority x order status)
    with Cramer's V effect size — the categorical-association screen a
    feature audit runs before modeling. One distributed count per cell;
    margins, expected counts, and the statistic all live on the
    cardinality-bounded cell table (|pri| x |status| rows), so every
    join after the first aggregate is broadcast-sized. Per-cell
    contributions are rounded once and DECIMAL-summed so the statistic
    is bit-identical across engines."""
    cells = (
        t(spark, sf_dir, "orders")
        .groupBy(
            F.col("o_orderpriority").alias("pri"), F.col("o_orderstatus").alias("st")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("obs"))
        .localCheckpoint(eager=True)
    )
    rowm = cells.groupBy("pri").agg(F.sum("obs").cast("long").alias("rtot"))
    colm = cells.groupBy("st").agg(F.sum("obs").cast("long").alias("ctot"))
    tot = cells.agg(
        F.sum("obs").cast("long").alias("n"),
        F.countDistinct("pri").cast("long").alias("nr"),
        F.countDistinct("st").cast("long").alias("nc"),
    )
    e = "CAST(rtot AS DOUBLE)*CAST(ctot AS DOUBLE)/CAST(n AS DOUBLE)"
    terms = (
        cells.join(F.broadcast(rowm), "pri")
        .join(F.broadcast(colm), "st")
        .crossJoin(F.broadcast(tot))
        .withColumn(
            "term",
            F.expr(
                f"CAST(round((CAST(obs AS DOUBLE) - {e}) * (CAST(obs AS DOUBLE) - {e})"
                f" / ({e}), 9) AS DECIMAL(38,9))"
            ),
        )
    )
    return (
        terms.groupBy("n", "nr", "nc")
        .agg(F.sum("term").alias("s"))
        .withColumn("sd", _d2dw(F.col("s"), 9))
        .selectExpr(
            "n AS n_orders",
            "(nr - 1) * (nc - 1) AS dof",
            "round(sd, 6) AS chi2",
            "round(sqrt(sd"
            " / (CAST(n AS DOUBLE) * CAST(least(nr, nc) - 1 AS DOUBLE))), 6)"
            " AS cramers_v",
        )
    )


# ---------------------------------------------------------------------------
# psi_price_drift
# ---------------------------------------------------------------------------

PSI_BASE_YEAR = 1995
PSI_CURR_YEAR = 2000
PSI_BINS = 10


def _psi_bucket(div: str) -> str:
    """Integer-exact equal-width bucket over the pooled [min,max] cent
    range — non-negative integer division so Spark ``div`` == DuckDB
    ``//`` (the known dialect trap)."""
    return (
        f"least({PSI_BINS - 1},"
        f" ((xc - minc) * {PSI_BINS}) {div} (maxc - minc + 1))"
    )


@register(
    "psi_price_drift",
    oracle=f"""
WITH px AS (
  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS xc,
         CASE WHEN year(o_orderdate) = {PSI_BASE_YEAR} THEN 0 ELSE 1 END AS side
  FROM orders
  WHERE year(o_orderdate) IN ({PSI_BASE_YEAR}, {PSI_CURR_YEAR})
),
bounds AS (SELECT min(xc) AS minc, max(xc) AS maxc FROM px),
b AS (
  SELECT {_psi_bucket("//")} AS bucket, side, CAST(count(*) AS BIGINT) AS cnt
  FROM px CROSS JOIN bounds GROUP BY 1, 2
),
spine AS (SELECT unnest(generate_series(0, {PSI_BINS - 1})) AS bucket),
wide AS (
  SELECT spine.bucket,
         CAST(coalesce(sum(CASE WHEN side = 0 THEN cnt END), 0) AS BIGINT) AS n_base,
         CAST(coalesce(sum(CASE WHEN side = 1 THEN cnt END), 0) AS BIGINT) AS n_curr
  FROM spine LEFT JOIN b ON b.bucket = spine.bucket GROUP BY 1
),
tots AS (SELECT CAST(sum(n_base) AS BIGINT) AS tb, CAST(sum(n_curr) AS BIGINT) AS tc FROM wide),
terms AS (
  SELECT bucket, n_base, n_curr,
         CAST(round(
           (CAST(n_curr + 1 AS DOUBLE)/CAST(tc + {PSI_BINS} AS DOUBLE)
            - CAST(n_base + 1 AS DOUBLE)/CAST(tb + {PSI_BINS} AS DOUBLE))
           * ln((CAST(n_curr + 1 AS DOUBLE)/CAST(tc + {PSI_BINS} AS DOUBLE))
                / (CAST(n_base + 1 AS DOUBLE)/CAST(tb + {PSI_BINS} AS DOUBLE))), 10)
         AS DECIMAL(38,10)) AS term
  FROM wide CROSS JOIN tots
)
SELECT bucket, n_base, n_curr,
       round(CAST(term AS DOUBLE), 10) AS psi_term,
       round({_d2dws('sum(term) OVER ()', 10)}, 9) AS psi_total
FROM terms
""",
)
def psi_price_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population stability index of the order-price distribution,
    baseline year 1995 vs current year 2000 — the drift monitor every
    production feature/score pipeline runs (PSI > 0.25 = retrain).
    Bucketing is integer-exact over the pooled cent range (one bounded
    min/max aggregate, broadcast back), so bin membership is
    engine-identical by construction; Laplace-smoothed bin ratios keep
    empty bins finite. One scan + one 10-row bin table; everything
    after the first aggregate is constant-size."""
    px = (
        t(spark, sf_dir, "orders")
        .where(F.year("o_orderdate").isin(PSI_BASE_YEAR, PSI_CURR_YEAR))
        .select(
            F.round(F.col("o_totalprice") * 100).cast("long").alias("xc"),
            F.when(F.year("o_orderdate") == PSI_BASE_YEAR, F.lit(0))
            .otherwise(F.lit(1))
            .alias("side"),
        )
    )
    bounds = px.agg(F.min("xc").alias("minc"), F.max("xc").alias("maxc"))
    b = (
        px.crossJoin(F.broadcast(bounds))
        .withColumn("bucket", F.expr(_psi_bucket("div")))
        .groupBy("bucket", "side")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    spine = spark.range(PSI_BINS).select(F.col("id").alias("bucket"))
    wide = (
        spine.join(b, "bucket", "left")
        .groupBy("bucket")
        .agg(
            F.coalesce(F.sum(F.when(F.col("side") == 0, F.col("cnt"))), F.lit(0))
            .cast("long")
            .alias("n_base"),
            F.coalesce(F.sum(F.when(F.col("side") == 1, F.col("cnt"))), F.lit(0))
            .cast("long")
            .alias("n_curr"),
        )
        .localCheckpoint(eager=True)
    )
    tots = wide.agg(
        F.sum("n_base").cast("long").alias("tb"), F.sum("n_curr").cast("long").alias("tc")
    )
    p = f"(CAST(n_curr + 1 AS DOUBLE)/CAST(tc + {PSI_BINS} AS DOUBLE))"
    q = f"(CAST(n_base + 1 AS DOUBLE)/CAST(tb + {PSI_BINS} AS DOUBLE))"
    terms = (
        wide.crossJoin(F.broadcast(tots))
        .withColumn(
            "term",
            F.expr(f"CAST(round(({p} - {q}) * ln({p} / {q}), 10) AS DECIMAL(38,10))"),
        )
        .localCheckpoint(eager=True)
    )
    total = terms.agg(F.round(_d2dw(F.sum("term"), 10), 9).alias("psi_total"))
    return (
        terms.crossJoin(F.broadcast(total))
        .selectExpr(
            "bucket",
            "n_base",
            "n_curr",
            "round(CAST(term AS DOUBLE), 10) AS psi_term",
            "psi_total",
        )
    )


# ---------------------------------------------------------------------------
# ks_two_sample_price
# ---------------------------------------------------------------------------

KS_FLAG_A = "R"
KS_FLAG_B = "N"


@register(
    "ks_two_sample_price",
    oracle=f"""
WITH xs AS (
  SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS xc,
         CASE WHEN l_returnflag = '{KS_FLAG_A}' THEN 1 ELSE 0 END AS is_a
  FROM lineitem WHERE l_returnflag IN ('{KS_FLAG_A}', '{KS_FLAG_B}')
),
tots AS (
  SELECT CAST(sum(is_a) AS BIGINT) AS na,
         CAST(sum(1 - is_a) AS BIGINT) AS nb
  FROM xs
),
g AS (
  SELECT xc, CAST(sum(is_a) AS BIGINT) AS ca, CAST(sum(1 - is_a) AS BIGINT) AS cb
  FROM xs GROUP BY xc
),
cum AS (
  SELECT xc,
         sum(ca * tots.nb - cb * tots.na)
           OVER (ORDER BY xc ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS s
  FROM g CROSS JOIN tots
),
mx AS (SELECT max(abs(s)) AS d_scaled FROM cum),
loc AS (
  SELECT min(xc) AS at_xc FROM cum CROSS JOIN mx WHERE abs(s) = mx.d_scaled
)
SELECT tots.na AS n_a, tots.nb AS n_b,
       round(CAST(mx.d_scaled AS DOUBLE)
             / (CAST(tots.na AS DOUBLE) * CAST(tots.nb AS DOUBLE)), 9) AS d_stat,
       round(CAST(loc.at_xc AS DOUBLE) / 100, 2) AS d_at_price,
       round(2 * exp(-2
             * (CAST(mx.d_scaled AS DOUBLE)
                / (CAST(tots.na AS DOUBLE) * CAST(tots.nb AS DOUBLE)))
             * (CAST(mx.d_scaled AS DOUBLE)
                / (CAST(tots.na AS DOUBLE) * CAST(tots.nb AS DOUBLE)))
             * CAST(tots.na AS DOUBLE) * CAST(tots.nb AS DOUBLE)
             / (CAST(tots.na AS DOUBLE) + CAST(tots.nb AS DOUBLE))), 9) AS p_approx
FROM tots CROSS JOIN mx CROSS JOIN loc
""",
)
def ks_two_sample_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov statistic (price distribution
    of returned vs non-returned lineitems) — the distribution-shift test
    behind data-split validation and feature drift. The ECDF gap is
    computed INTEGER-exactly: each distinct price contributes
    ca*n_b - cb*n_a, whose running sum is the ECDF difference scaled by
    n_a*n_b, so D = max|prefix|/(n_a*n_b) with no float accumulation.
    The prefix sum over the ~|distinct prices| domain rides the
    two-phase distributed running sum (range partition + broadcast
    boundary carries) instead of a single-task global window — the same
    operator that powers the Pareto skyline and weighted median. One
    data shuffle (the per-value aggregate); everything downstream is
    value-domain-sized."""
    xs = (
        t(spark, sf_dir, "lineitem")
        .where(F.col("l_returnflag").isin(KS_FLAG_A, KS_FLAG_B))
        .select(
            F.round(F.col("l_extendedprice") * 100).cast("long").alias("xc"),
            F.when(F.col("l_returnflag") == KS_FLAG_A, F.lit(1))
            .otherwise(F.lit(0))
            .alias("is_a"),
        )
    )
    tots = xs.agg(
        F.sum("is_a").cast("long").alias("na"),
        F.sum(F.lit(1) - F.col("is_a")).cast("long").alias("nb"),
    )
    g = xs.groupBy("xc").agg(
        F.sum("is_a").cast("long").alias("ca"),
        F.sum(F.lit(1) - F.col("is_a")).cast("long").alias("cb"),
    )
    contrib = (
        g.crossJoin(F.broadcast(tots))
        .withColumn("v", F.col("ca") * F.col("nb") - F.col("cb") * F.col("na"))
        .withColumn("__k", F.lit(0))
    )
    # cum is consumed by exactly one aggregate — no checkpoint needed,
    # and keeping the plan visible pins the keyed-window shape in tests
    cum = distributed_keyed_running_sum(contrib, ["__k"], ["xc"], "v", out="s")
    mx = cum.agg(
        F.max(F.struct(F.abs("s").alias("a"), (-F.col("xc")).alias("nx"))).alias("m")
    ).select(
        F.col("m.a").alias("d_scaled"), (-F.col("m.nx")).alias("at_xc")
    )
    d = (
        "(CAST(d_scaled AS DOUBLE)"
        " / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)))"
    )
    return (
        F.broadcast(tots)
        .crossJoin(mx)
        .selectExpr(
            "na AS n_a",
            "nb AS n_b",
            f"round({d}, 9) AS d_stat",
            "round(CAST(at_xc AS DOUBLE) / 100, 2) AS d_at_price",
            f"round(2 * exp(-2 * {d} * {d}"
            " * CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)"
            " / (CAST(na AS DOUBLE) + CAST(nb AS DOUBLE))), 9) AS p_approx",
        )
    )
