"""Wave 30: model explainability and group robustness.

  * shapley_two_feature — EXACT Shapley attribution for a two-feature
    conditional-mean model (closed form over the 2! orderings): the
    explainability primitive, computed entirely as aggregates.
  * worst_group_metric — per-group score of the rate-based classifier
    with the worst-group (DRO-style) summary: the robustness read that
    average metrics hide.

All exact-value DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .base import register, t

_LABEL = "CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END"

# ---------------------------------------------------------------------------
# shapley_two_feature
# ---------------------------------------------------------------------------


@register(
    "shapley_two_feature",
    oracle=f"""
WITH o AS (
  SELECT o_orderstatus AS s, CAST(year(o_orderdate) AS BIGINT) AS yr,
         {_LABEL} AS y
  FROM orders
),
vsy AS (
  SELECT s, yr, CAST(sum(y) AS BIGINT) AS pos, CAST(count(*) AS BIGINT) AS n
  FROM o GROUP BY s, yr
),
vs AS (SELECT s, CAST(sum(pos) AS BIGINT) AS pos, CAST(sum(n) AS BIGINT) AS n
       FROM vsy GROUP BY s),
vy AS (SELECT yr, CAST(sum(pos) AS BIGINT) AS pos, CAST(sum(n) AS BIGINT) AS n
       FROM vsy GROUP BY yr),
v0 AS (SELECT CAST(sum(pos) AS BIGINT) AS pos, CAST(sum(n) AS BIGINT) AS n FROM vsy)
SELECT vsy.s AS status, vsy.yr AS year, vsy.n AS n_rows,
       round(CAST(vsy.pos AS DOUBLE) / CAST(vsy.n AS DOUBLE), 9) AS prediction,
       round(CAST(v0.pos AS DOUBLE) / CAST(v0.n AS DOUBLE), 9) AS baseline,
       round(0.5 * ((CAST(vsy.pos AS DOUBLE) / CAST(vsy.n AS DOUBLE)
                     - CAST(vy.pos AS DOUBLE) / CAST(vy.n AS DOUBLE))
                  + (CAST(vs.pos AS DOUBLE) / CAST(vs.n AS DOUBLE)
                     - CAST(v0.pos AS DOUBLE) / CAST(v0.n AS DOUBLE))), 9)
         AS phi_status,
       round(0.5 * ((CAST(vsy.pos AS DOUBLE) / CAST(vsy.n AS DOUBLE)
                     - CAST(vs.pos AS DOUBLE) / CAST(vs.n AS DOUBLE))
                  + (CAST(vy.pos AS DOUBLE) / CAST(vy.n AS DOUBLE)
                     - CAST(v0.pos AS DOUBLE) / CAST(v0.n AS DOUBLE))), 9)
         AS phi_year
FROM vsy
JOIN vs ON vs.s = vsy.s
JOIN vy ON vy.yr = vsy.yr
CROSS JOIN v0
""",
)
def shapley_two_feature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT Shapley values for a two-feature conditional-expectation
    model (urgent rate given order status and year): with two players
    there are 2! orderings, so phi is the closed-form half-sum of the
    two marginal contributions — no sampling, no SHAP library, just
    four conditional-mean aggregates (v(S,Y), v(S), v(Y), v(0)) joined
    on the bounded cell table. The efficiency axiom
    phi_status + phi_year == prediction - baseline holds EXACTLY by
    construction (pytest pins it). This is the attribution read a
    feature audit runs after info_gain picks the features; at 100 TB
    every v(.) is one map-side-combinable pass and the join is
    broadcast-sized."""
    o = t(spark, sf_dir, "orders").selectExpr(
        "o_orderstatus AS s", "CAST(year(o_orderdate) AS BIGINT) AS yr", f"{_LABEL} AS y"
    )
    vsy = o.groupBy("s", "yr").agg(
        F.sum("y").cast("long").alias("pos"), F.count(F.lit(1)).cast("long").alias("n")
    ).localCheckpoint(eager=True)
    vs = vsy.groupBy("s").agg(
        F.sum("pos").cast("long").alias("pos_s"), F.sum("n").cast("long").alias("n_s")
    )
    vy = vsy.groupBy("yr").agg(
        F.sum("pos").cast("long").alias("pos_y"), F.sum("n").cast("long").alias("n_y")
    )
    v0 = vsy.agg(
        F.sum("pos").cast("long").alias("pos_0"), F.sum("n").cast("long").alias("n_0")
    )
    r = lambda p, n: f"CAST({p} AS DOUBLE) / CAST({n} AS DOUBLE)"  # noqa: E731
    return (
        vsy.join(F.broadcast(vs), "s")
        .join(F.broadcast(vy), "yr")
        .crossJoin(F.broadcast(v0))
        .selectExpr(
            "s AS status",
            "yr AS year",
            "n AS n_rows",
            f"round({r('pos','n')}, 9) AS prediction",
            f"round({r('pos_0','n_0')}, 9) AS baseline",
            f"round(0.5 * (({r('pos','n')} - {r('pos_y','n_y')})"
            f" + ({r('pos_s','n_s')} - {r('pos_0','n_0')})), 9) AS phi_status",
            f"round(0.5 * (({r('pos','n')} - {r('pos_s','n_s')})"
            f" + ({r('pos_y','n_y')} - {r('pos_0','n_0')})), 9) AS phi_year",
        )
    )


# ---------------------------------------------------------------------------
# worst_group_metric
# ---------------------------------------------------------------------------

@register(
    "worst_group_metric",
    oracle=f"""
WITH o AS (
  SELECT o_orderstatus AS grp, CAST(year(o_orderdate) AS BIGINT) AS yr,
         {_LABEL} AS y
  FROM orders
),
cell AS (
  SELECT grp, yr, CAST(sum(y) AS BIGINT) AS pos, CAST(count(*) AS BIGINT) AS n
  FROM o GROUP BY grp, yr
),
pred AS (
  -- the rate-based classifier predicts urgent iff the cell rate > the
  -- global rate; "accuracy" per group = majority-consistent decisions
  SELECT cell.grp, cell.yr, cell.pos, cell.n,
         CASE WHEN cell.pos * tot.n > tot.pos * cell.n THEN 1 ELSE 0 END AS yhat
  FROM cell CROSS JOIN (SELECT CAST(sum(pos) AS BIGINT) AS pos,
                               CAST(sum(n) AS BIGINT) AS n FROM cell) tot
),
g AS (
  SELECT grp,
         CAST(sum(n) AS BIGINT) AS n_rows,
         CAST(sum(CASE WHEN yhat = 1 THEN pos ELSE n - pos END) AS BIGINT) AS n_correct
  FROM pred GROUP BY grp
),
scored AS (
  SELECT grp, n_rows, n_correct,
         round(CAST(n_correct AS DOUBLE) / CAST(n_rows AS DOUBLE), 9) AS accuracy
  FROM g
),
w AS (SELECT min(accuracy) AS worst, round(CAST(sum(n_correct) AS DOUBLE)
            / CAST(sum(n_rows) AS DOUBLE), 9) AS avg_acc FROM scored)
SELECT scored.grp AS grp, scored.n_rows, scored.n_correct, scored.accuracy,
       w.worst AS worst_group_accuracy, w.avg_acc AS average_accuracy,
       CASE WHEN scored.accuracy = w.worst THEN 1 ELSE 0 END AS is_worst_group
FROM scored CROSS JOIN w
""",
)
def worst_group_metric(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Worst-group accuracy (the group-DRO / subpopulation-robustness
    read, Sagawa et al.): per order-status group, the accuracy of the
    cell-rate classifier (predict urgent iff the (group, year) cell
    rate exceeds the global rate — the comparison is INTEGER-exact
    cross-multiplication), with the min-over-groups and the average it
    undercuts. Average metrics hide a failing subgroup; this is the
    fairness/robustness gate that surfaces it. Everything after the
    one cell-count pass lives on the bounded cell table."""
    o = t(spark, sf_dir, "orders").selectExpr(
        "o_orderstatus AS grp", "CAST(year(o_orderdate) AS BIGINT) AS yr", f"{_LABEL} AS y"
    )
    cell = o.groupBy("grp", "yr").agg(
        F.sum("y").cast("long").alias("pos"), F.count(F.lit(1)).cast("long").alias("n")
    ).localCheckpoint(eager=True)
    tot = cell.agg(
        F.sum("pos").cast("long").alias("tpos"), F.sum("n").cast("long").alias("tn")
    )
    pred = cell.crossJoin(F.broadcast(tot)).selectExpr(
        "grp",
        "pos",
        "n",
        "CASE WHEN pos * tn > tpos * n THEN 1 ELSE 0 END AS yhat",
    )
    g = pred.groupBy("grp").agg(
        F.sum("n").cast("long").alias("n_rows"),
        F.sum(F.expr("CASE WHEN yhat = 1 THEN pos ELSE n - pos END"))
        .cast("long")
        .alias("n_correct"),
    )
    scored = g.selectExpr(
        "grp",
        "n_rows",
        "n_correct",
        "round(CAST(n_correct AS DOUBLE) / CAST(n_rows AS DOUBLE), 9) AS accuracy",
    ).localCheckpoint(eager=True)
    w = scored.agg(
        F.min("accuracy").alias("worst"),
        F.round(
            F.sum("n_correct").cast("double") / F.sum("n_rows").cast("double"), 9
        ).alias("avg_acc"),
    )
    return scored.crossJoin(F.broadcast(w)).selectExpr(
        "grp",
        "n_rows",
        "n_correct",
        "accuracy",
        "worst AS worst_group_accuracy",
        "avg_acc AS average_accuracy",
        "CASE WHEN accuracy = worst THEN 1 ELSE 0 END AS is_worst_group",
    )
