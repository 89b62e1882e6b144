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
WITH v AS (SELECT event_type, CAST(round(value, 6) AS DOUBLE) AS x FROM events),
r AS (
  SELECT event_type, x,
         row_number() OVER (PARTITION BY event_type ORDER BY x) AS rn,
         CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
  FROM v
)
SELECT event_type,
       CAST(max(n) AS BIGINT) AS n_events,
       max(CASE WHEN rn = greatest(1, CAST(ceil(0.50 * n) AS BIGINT)) THEN x END) AS p50,
       max(CASE WHEN rn = greatest(1, CAST(ceil(0.95 * n) AS BIGINT)) THEN x END) AS p95,
       max(CASE WHEN rn = greatest(1, CAST(ceil(0.99 * n) AS BIGINT)) THEN x END) AS p99,
       CASE WHEN max(CASE WHEN rn = greatest(1, CAST(ceil(0.95 * n) AS BIGINT))
                          THEN x END) > {SLO_P95_MAX} THEN 1 ELSE 0 END AS slo_breach
FROM r GROUP BY event_type
""",
)
def slo_latency_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The latency-SLO dashboard tile: p50/p95/p99 of the event value
    per event type, with the p95-threshold breach flag — the
    observability read a crawler's fetch-latency and an API's response
    time both feed. EXACT order statistics (the k = ceil(p*n)-th
    smallest element), not interpolated quantiles: an interpolated p95
    is a float blend of two neighbors whose last ulp can differ across
    engines, while the k-th element is one concrete input value —
    bit-identical everywhere (r5 ADVICE). The per-group rank rides the
    two-phase distributed keyed rank, so no event type — however
    dominant — serializes through one window task; the breach flag
    compares the exact element, so no float rate decides the page."""
    from ..operators.partitioning import distributed_keyed_row_number

    v = t(spark, sf_dir, "events").selectExpr(
        "event_type", "CAST(round(value, 6) AS DOUBLE) AS x"
    )
    counts = v.groupBy("event_type").agg(F.count(F.lit(1)).cast("long").alias("n"))
    ranked = distributed_keyed_row_number(v, ["event_type"], ["x"], out="rn").join(
        F.broadcast(counts), "event_type"
    )
    kth = lambda p: F.greatest(F.lit(1), F.ceil(F.lit(p) * F.col("n")).cast("long"))  # noqa: E731
    picked = ranked.groupBy("event_type").agg(
        F.max("n").cast("long").alias("n_events"),
        F.max(F.when(F.col("rn") == kth(0.50), F.col("x"))).alias("p50"),
        F.max(F.when(F.col("rn") == kth(0.95), F.col("x"))).alias("p95"),
        F.max(F.when(F.col("rn") == kth(0.99), F.col("x"))).alias("p99"),
    )
    return picked.withColumn(
        "slo_breach",
        F.when(F.col("p95") > F.lit(SLO_P95_MAX), F.lit(1)).otherwise(F.lit(0)),
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
