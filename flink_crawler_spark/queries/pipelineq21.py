"""Wave 22: CDC state reconstruction, causal estimation, model eval.

  * cdc_changelog_apply — reconstruct final table state from an
    insert/update/delete changelog (last-write-wins apply).
  * ipw_treatment_effect — inverse-propensity-weighted average
    treatment effect with a coarse confounder: the causal-inference
    primitive, vs the naive difference it corrects.
  * brier_calibration_bins — reliability bins + Brier score of a
    rate-based score against the binary label.
  * auc_urgent_by_price — EXACT ROC AUC (Mann-Whitney with tie
    correction) computed integer-exactly on the value domain.

All exact-value DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.partitioning import distributed_keyed_running_sum
from .base import EV_MS, register, t
from .base import dec_to_double_wide as _d2dw
from .base import dec_to_double_wide_sql as _d2dws

# ---------------------------------------------------------------------------
# cdc_changelog_apply
# ---------------------------------------------------------------------------

# event_type -> CDC op: signup inserts, view/click/purchase update the
# value, error deletes the row
_CDC_OP_DUCK = (
    "CASE WHEN event_type = 'signup' THEN 'I'"
    " WHEN event_type = 'error' THEN 'D' ELSE 'U' END"
)


@register(
    "cdc_changelog_apply",
    oracle=f"""
WITH log AS (
  SELECT user_id, event_id, CAST(epoch_ms(ts) AS BIGINT) AS ms,
         {_CDC_OP_DUCK} AS op, value
  FROM events
),
r AS (
  SELECT user_id, event_id, ms, op, value,
         row_number() OVER (PARTITION BY user_id ORDER BY ms DESC, event_id DESC) AS rn
  FROM log
),
stats AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n_ops,
         CAST(sum(CASE WHEN op = 'D' THEN 1 ELSE 0 END) AS BIGINT) AS n_deletes
  FROM log GROUP BY user_id
)
SELECT r.user_id, r.ms AS last_ms, r.op AS last_op,
       round(r.value, 6) AS final_value, stats.n_ops, stats.n_deletes
FROM r JOIN stats ON stats.user_id = r.user_id
WHERE r.rn = 1 AND r.op <> 'D'
""",
)
def cdc_changelog_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC changelog apply (the MERGE INTO / upsert-sink shape,
    reference parity: the URL-DB's last-write-wins merge —
    UrlDBFunction.java:466-527 — generalized to I/U/D ops): reconstruct
    the final table state from an event log where the LAST operation
    per key wins and a trailing delete removes the row. One keyed
    window (partitioned by the entity key — fully parallel, no global
    order), one bounded per-key stats aggregate; at 100 TB this is the
    standard compaction loop of a log-structured table, and the repo's
    bucketed state_table runs the same lattice incrementally."""
    log = t(spark, sf_dir, "events").selectExpr(
        "user_id",
        "event_id",
        f"{EV_MS} AS ms",
        "CASE WHEN event_type = 'signup' THEN 'I'"
        " WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op",
        "value",
    ).localCheckpoint(eager=True)
    w = Window.partitionBy("user_id").orderBy(F.desc("ms"), F.desc("event_id"))
    r = log.withColumn("rn", F.row_number().over(w))
    stats = log.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_ops"),
        F.sum(F.when(F.col("op") == "D", 1).otherwise(0))
        .cast("long")
        .alias("n_deletes"),
    )
    return (
        r.where((F.col("rn") == 1) & (F.col("op") != "D"))
        .join(stats, "user_id")
        .selectExpr(
            "user_id",
            "ms AS last_ms",
            "op AS last_op",
            "round(value, 6) AS final_value",
            "n_ops",
            "n_deletes",
        )
    )


# ---------------------------------------------------------------------------
# ipw_treatment_effect
# ---------------------------------------------------------------------------

@register(
    "ipw_treatment_effect",
    oracle=f"""
WITH o AS (
  SELECT o_orderstatus AS x,
         CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS tr,
         CAST(round(o_totalprice, 2) AS DECIMAL(18,2)) AS y
  FROM orders
),
s AS (
  SELECT x, CAST(count(*) AS BIGINT) AS n_x,
         CAST(sum(tr) AS BIGINT) AS n_t,
         CAST(sum(CASE WHEN tr = 1 THEN y END) AS DECIMAL(38,2)) AS sy_t,
         CAST(sum(CASE WHEN tr = 0 THEN y END) AS DECIMAL(38,2)) AS sy_c
  FROM o GROUP BY x
),
tot AS (
  SELECT CAST(sum(n_x) AS BIGINT) AS n,
         CAST(sum(n_t) AS BIGINT) AS nt,
         CAST(sum(sy_t) AS DECIMAL(38,2)) AS syt,
         CAST(sum(sy_c) AS DECIMAL(38,2)) AS syc
  FROM s
),
terms AS (
  SELECT CAST(round(
           {_d2dws('sy_t', 2)} * CAST(n_x AS DOUBLE) / CAST(n_t AS DOUBLE)
           - {_d2dws('sy_c', 2)} * CAST(n_x AS DOUBLE) / CAST(n_x - n_t AS DOUBLE), 6)
         AS DECIMAL(38,6)) AS term
  FROM s WHERE n_t > 0 AND n_t < n_x
)
SELECT tot.n AS n_orders, tot.nt AS n_treated,
       round({_d2dws('sum(terms.term)', 6)} / CAST(tot.n AS DOUBLE), 6) AS ate_ipw,
       round({_d2dws('tot.syt', 2)} / CAST(tot.nt AS DOUBLE)
             - {_d2dws('tot.syc', 2)} / CAST(tot.n - tot.nt AS DOUBLE), 6) AS naive_diff
FROM terms CROSS JOIN tot
GROUP BY tot.n, tot.nt, tot.syt, tot.syc
""",
)
def ipw_treatment_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverse-propensity-weighted average treatment effect of urgent
    priority on order price, stratified on order status (Horvitz-
    Thompson with a coarse confounder; within a stratum the IPW sum
    collapses to sum_T * n/n_T - sum_C * n/n_C) — the causal-inference
    primitive an experimentation platform runs when treatment isn't
    randomized, reported against the naive difference it corrects. One
    conditional-aggregate pass; the estimator lives on the
    stratum-count table (bounded), with per-stratum terms rounded once
    and DECIMAL-summed. Degenerate strata (all-treated / all-control,
    where the propensity weight is undefined) are excluded identically
    in both engines."""
    o = t(spark, sf_dir, "orders").selectExpr(
        "o_orderstatus AS x",
        "CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS tr",
        "CAST(round(o_totalprice, 2) AS DECIMAL(18,2)) AS y",
    )
    s = o.groupBy("x").agg(
        F.count(F.lit(1)).cast("long").alias("n_x"),
        F.sum("tr").cast("long").alias("n_t"),
        F.sum(F.when(F.col("tr") == 1, F.col("y"))).cast("decimal(38,2)").alias("sy_t"),
        F.sum(F.when(F.col("tr") == 0, F.col("y"))).cast("decimal(38,2)").alias("sy_c"),
    ).localCheckpoint(eager=True)
    tot = s.agg(
        F.sum("n_x").cast("long").alias("n"),
        F.sum("n_t").cast("long").alias("nt"),
        F.sum("sy_t").cast("decimal(38,2)").alias("syt"),
        F.sum("sy_c").cast("decimal(38,2)").alias("syc"),
    )
    n_x, n_t = F.col("n_x").cast("double"), F.col("n_t").cast("double")
    terms = s.where((F.col("n_t") > 0) & (F.col("n_t") < F.col("n_x"))).select(
        F.round(
            _d2dw(F.col("sy_t"), 2) * n_x / n_t
            - _d2dw(F.col("sy_c"), 2) * n_x / (n_x - n_t),
            6,
        )
        .cast("decimal(38,6)")
        .alias("term")
    )
    return (
        terms.crossJoin(F.broadcast(tot))
        .groupBy("n", "nt", "syt", "syc")
        .agg(F.sum("term").alias("st"))
        .select(
            F.col("n").alias("n_orders"),
            F.col("nt").alias("n_treated"),
            F.round(
                _d2dw(F.col("st"), 6) / F.col("n").cast("double"), 6
            ).alias("ate_ipw"),
            F.round(
                _d2dw(F.col("syt"), 2) / F.col("nt").cast("double")
                - _d2dw(F.col("syc"), 2)
                / (F.col("n") - F.col("nt")).cast("double"),
                6,
            ).alias("naive_diff"),
        )
    )


# ---------------------------------------------------------------------------
# brier_calibration_bins
# ---------------------------------------------------------------------------

BRIER_BINS = 10


@register(
    "brier_calibration_bins",
    oracle=f"""
WITH o AS (
  SELECT o_orderstatus AS st, year(o_orderdate) AS yr,
         CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS y
  FROM orders
),
cell AS (
  SELECT st, yr, CAST(sum(y) AS BIGINT) AS pos, CAST(count(*) AS BIGINT) AS n
  FROM o GROUP BY st, yr
),
scored AS (
  SELECT o.y,
         CAST(cell.pos AS DOUBLE) / CAST(cell.n AS DOUBLE) AS s,
         least({BRIER_BINS - 1}, (cell.pos * {BRIER_BINS}) // cell.n) AS bin
  FROM o JOIN cell ON cell.st = o.st AND cell.yr = o.yr
),
b AS (
  SELECT bin, CAST(count(*) AS BIGINT) AS n_rows,
         {_d2dws('sum(CAST(round(s, 9) AS DECIMAL(38,9)))', 9)} AS ssum,
         CAST(sum(y) AS BIGINT) AS pos,
         sum(CAST(round((s - y) * (s - y), 12) AS DECIMAL(38,12))) AS se
  FROM scored GROUP BY bin
),
tot AS (
  SELECT CAST(sum(n_rows) AS BIGINT) AS n,
         {_d2dws('sum(se)', 12)} AS se_all
  FROM b
)
SELECT b.bin, b.n_rows,
       round(b.ssum / b.n_rows, 9) AS mean_score,
       round(CAST(b.pos AS DOUBLE) / CAST(b.n_rows AS DOUBLE), 9) AS obs_rate,
       round(tot.se_all / tot.n, 9) AS brier
FROM b CROSS JOIN tot
""",
)
def brier_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability (calibration) bins + Brier score for a rate-based
    score (per status x year urgent rate) against the urgent label —
    the model-evaluation read behind every 'is the classifier's 0.8
    really 80%?' audit. The bin id is computed INTEGER-exactly
    ((pos*10) div n — never a float floor on a knife edge), per-row
    squared errors are rounded once and DECIMAL-summed, and the score
    itself is an exact-integer ratio, so bins, rates, and the Brier
    score agree bit-for-bit. The cell table is bounded; the fact scan
    joins it broadcast."""
    o = t(spark, sf_dir, "orders").selectExpr(
        "o_orderstatus AS st",
        "year(o_orderdate) AS yr",
        "CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS y",
    )
    cell = o.groupBy("st", "yr").agg(
        F.sum("y").cast("long").alias("pos"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    scored = o.join(F.broadcast(cell), ["st", "yr"]).selectExpr(
        "y",
        "CAST(pos AS DOUBLE) / CAST(n AS DOUBLE) AS s",
        f"least({BRIER_BINS - 1}, (pos * {BRIER_BINS}) div n) AS bin",
    )
    b = scored.groupBy("bin").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        _d2dw(F.sum(F.expr("CAST(round(s, 9) AS DECIMAL(38,9))")), 9).alias("ssum"),
        F.sum("y").cast("long").alias("pos"),
        F.sum(F.expr("CAST(round((s - y) * (s - y), 12) AS DECIMAL(38,12))")).alias("se"),
    ).localCheckpoint(eager=True)
    tot = b.agg(
        F.sum("n_rows").cast("long").alias("n"),
        _d2dw(F.sum("se"), 12).alias("se_all"),
    )
    return (
        b.crossJoin(F.broadcast(tot))
        .selectExpr(
            "bin",
            "n_rows",
            "round(ssum / n_rows, 9) AS mean_score",
            "round(CAST(pos AS DOUBLE) / CAST(n_rows AS DOUBLE), 9) AS obs_rate",
            "round(se_all / n, 9) AS brier",
        )
    )


# ---------------------------------------------------------------------------
# auc_urgent_by_price
# ---------------------------------------------------------------------------

@register(
    "auc_urgent_by_price",
    oracle="""
WITH o AS (
  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS xc,
         CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS y
  FROM orders
),
tots AS (
  SELECT CAST(sum(y) AS BIGINT) AS np, CAST(sum(1 - y) AS BIGINT) AS nn FROM o
),
g AS (
  SELECT xc, CAST(sum(y) AS BIGINT) AS cp, CAST(sum(1 - y) AS BIGINT) AS cn
  FROM o GROUP BY xc
),
cum AS (
  SELECT xc, cp, cn,
         CAST(coalesce(sum(cn) OVER (ORDER BY xc
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS cn_before
  FROM g
),
u AS (
  SELECT CAST(sum(cp * (2 * cn_before + cn)) AS BIGINT) AS u2 FROM cum
)
SELECT tots.np AS n_pos, tots.nn AS n_neg,
       round(CAST(u.u2 AS DOUBLE)
             / (2.0 * CAST(tots.np AS DOUBLE) * CAST(tots.nn AS DOUBLE)), 9) AS auc
FROM u CROSS JOIN tots
""",
)
def auc_urgent_by_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT ROC AUC of price as a ranking score for the urgent label —
    the Mann-Whitney U statistic with tie correction, computed
    INTEGER-exactly on the value domain: per distinct score the
    positive count pairs with the exclusive running negative count
    (ties contribute 1/2 via the doubled statistic 2U = sum
    cp*(2*cn_before + cn)), so the only float is the final exact-ratio
    division. The prefix sum rides the same two-phase distributed
    running sum as the KS statistic — one per-value aggregate shuffle,
    no global single-task window, no per-pair join (naive AUC is
    O(n_pos x n_neg); this is O(|distinct values|))."""
    o = t(spark, sf_dir, "orders").selectExpr(
        "CAST(round(o_totalprice * 100) AS BIGINT) AS xc",
        "CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS y",
    )
    tots = o.agg(
        F.sum("y").cast("long").alias("np"),
        F.sum(F.lit(1) - F.col("y")).cast("long").alias("nn"),
    )
    g = o.groupBy("xc").agg(
        F.sum("y").cast("long").alias("cp"),
        F.sum(F.lit(1) - F.col("y")).cast("long").alias("cn"),
    ).withColumn("__k", F.lit(0))
    cum = distributed_keyed_running_sum(g, ["__k"], ["xc"], "cn", out="cn_incl")
    u = cum.selectExpr("cp * (2 * (cn_incl - cn) + cn) AS contrib").agg(
        F.sum("contrib").cast("long").alias("u2")
    )
    return u.crossJoin(F.broadcast(tots)).selectExpr(
        "np AS n_pos",
        "nn AS n_neg",
        "round(CAST(u2 AS DOUBLE)"
        " / (2.0 * CAST(np AS DOUBLE) * CAST(nn AS DOUBLE)), 9) AS auc",
    )
