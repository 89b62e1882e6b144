"""Wave 33: observability / SRE reads.

  * slo_latency_report — p50/p95/p99 of the event value per type with
    an SLO-threshold breach flag (the latency dashboard tile).
  * error_budget_burn — daily error rate vs an SLO error budget with
    the cumulative burn fraction (the SRE budget-burn read).

All exact-value DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.partitioning import distributed_keyed_running_sum
from .base import register, t

# ---------------------------------------------------------------------------
# slo_latency_report
# ---------------------------------------------------------------------------

SLO_P95_MAX = 95.0  # treat value as a latency; SLO: p95 <= this


@register(
    "slo_latency_report",
    oracle=f"""
WITH v AS (SELECT event_type, CAST(round(value, 6) AS DOUBLE) AS x FROM events)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       round(quantile_cont(x, 0.50), 6) AS p50,
       round(quantile_cont(x, 0.95), 6) AS p95,
       round(quantile_cont(x, 0.99), 6) AS p99,
       CASE WHEN quantile_cont(x, 0.95) > {SLO_P95_MAX} THEN 1 ELSE 0 END
         AS slo_breach
FROM v GROUP BY event_type
""",
)
def slo_latency_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The latency-SLO dashboard tile: p50/p95/p99 of the event value
    per event type, with the p95-threshold breach flag — the
    observability read a crawler's fetch-latency and an API's response
    time both feed. Exact interpolated per-group quantiles (one grouped
    aggregate; at 100 TB the per-group exact path is this repo's
    two-phase rank, the streaming path its KLL sketch); values are
    rounded ONCE on entry so both engines interpolate the identical
    doubles, and the breach flag compares the UNROUNDED quantile
    identically in both."""
    v = t(spark, sf_dir, "events").selectExpr(
        "event_type", "CAST(round(value, 6) AS DOUBLE) AS x"
    )
    return v.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.round(F.expr("percentile(x, 0.50)"), 6).alias("p50"),
        F.round(F.expr("percentile(x, 0.95)"), 6).alias("p95"),
        F.round(F.expr("percentile(x, 0.99)"), 6).alias("p99"),
        F.expr(
            f"CASE WHEN percentile(x, 0.95) > {SLO_P95_MAX} THEN 1 ELSE 0 END"
        ).alias("slo_breach"),
    )


# ---------------------------------------------------------------------------
# error_budget_burn
# ---------------------------------------------------------------------------

ERROR_BUDGET = 0.25  # SLO: at most 25% of events may be errors


@register(
    "error_budget_burn",
    oracle=f"""
WITH d AS (
  SELECT date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day_idx,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS errs
  FROM events GROUP BY day_idx
),
cum AS (
  SELECT day_idx, n, errs,
         CAST(sum(errs) OVER (ORDER BY day_idx
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_errs,
         CAST(sum(n) OVER (ORDER BY day_idx
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_n
  FROM d
)
SELECT day_idx, n AS n_events, errs AS n_errors,
       round(CAST(errs AS DOUBLE) / CAST(n AS DOUBLE), 9) AS daily_error_rate,
       round(CAST(cum_errs AS DOUBLE)
             / (CAST(cum_n AS DOUBLE) * {ERROR_BUDGET}), 9) AS budget_burn,
       CASE WHEN cum_errs * 100 > cum_n * {int(ERROR_BUDGET * 100)} THEN 1 ELSE 0 END
         AS budget_exhausted
FROM cum
""",
)
def error_budget_burn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SRE error-budget burn: daily error rate against a 25% error-rate
    SLO, with the cumulative burn fraction (cum_errors / (cum_events x
    budget)) and the integer-exact exhaustion flag (cross-multiplied —
    no float rate decides the page). The running sums ride the
    two-phase distributed prefix sum over the calendar-bounded day
    table; the day rollup is the only data-sized step. This is the
    operational read a continuous crawl runs against its fetch-error
    SLO (the reference's status counters feed exactly this)."""
    d = (
        t(spark, sf_dir, "events")
        .groupBy(
            F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01").cast("date"))
            .cast("long")
            .alias("day_idx")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
            .cast("long")
            .alias("errs"),
        )
        .withColumn("__k", F.lit(0))
        .localCheckpoint(eager=True)
    )
    cum1 = distributed_keyed_running_sum(d, ["__k"], ["day_idx"], "errs", out="cum_errs")
    cum = distributed_keyed_running_sum(
        cum1, ["__k"], ["day_idx"], "n", out="cum_n"
    )
    return cum.selectExpr(
        "day_idx",
        "n AS n_events",
        "errs AS n_errors",
        "round(CAST(errs AS DOUBLE) / CAST(n AS DOUBLE), 9) AS daily_error_rate",
        f"round(CAST(cum_errs AS DOUBLE)"
        f" / (CAST(cum_n AS DOUBLE) * {ERROR_BUDGET}), 9) AS budget_burn",
        f"CASE WHEN cum_errs * 100 > cum_n * {int(ERROR_BUDGET * 100)}"
        " THEN 1 ELSE 0 END AS budget_exhausted",
    )
