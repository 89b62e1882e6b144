"""Wave 31: experimentation guardrails and sessionization tuning.

  * ab_srm_check — sample-ratio-mismatch test on a deterministic
    md5 A/B assignment (the #1 experimentation-platform guardrail).
  * session_gap_sensitivity — session counts at a ladder of
    inactivity-gap thresholds, from ONE scan (the sessionizer's
    tuning curve).

All exact-value DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .base import EV_MS, register, t

# ---------------------------------------------------------------------------
# ab_srm_check
# ---------------------------------------------------------------------------

# salted assignment hash (the conformal lesson: NEVER split on an
# unsalted id hash — the generator derives values from id hashes)
_ARM_DUCK = "CASE WHEN substr(md5('srm#' || CAST(user_id AS VARCHAR)), 1, 1) <= '7' THEN 'A' ELSE 'B' END"
_ARM_SPARK = _ARM_DUCK.replace("AS VARCHAR", "AS STRING")


@register(
    "ab_srm_check",
    oracle=f"""
WITH u AS (SELECT DISTINCT user_id FROM events),
arms AS (SELECT {_ARM_DUCK} AS arm FROM u),
c AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         CAST(sum(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS n_b
  FROM arms
)
SELECT n, n_a, n_b,
       round(CAST(n_a AS DOUBLE) / CAST(n AS DOUBLE), 9) AS ratio_a,
       0.5 AS expected_ratio,
       round((CAST(n_a AS DOUBLE) - CAST(n AS DOUBLE) * 0.5)
             * (CAST(n_a AS DOUBLE) - CAST(n AS DOUBLE) * 0.5)
             / (CAST(n AS DOUBLE) * 0.5)
           + (CAST(n_b AS DOUBLE) - CAST(n AS DOUBLE) * 0.5)
             * (CAST(n_b AS DOUBLE) - CAST(n AS DOUBLE) * 0.5)
             / (CAST(n AS DOUBLE) * 0.5), 6) AS srm_chi2,
       CASE WHEN (CAST(n_a AS DOUBLE) - CAST(n AS DOUBLE) * 0.5)
                 * (CAST(n_a AS DOUBLE) - CAST(n AS DOUBLE) * 0.5)
                 / (CAST(n AS DOUBLE) * 0.5)
               + (CAST(n_b AS DOUBLE) - CAST(n AS DOUBLE) * 0.5)
                 * (CAST(n_b AS DOUBLE) - CAST(n AS DOUBLE) * 0.5)
                 / (CAST(n AS DOUBLE) * 0.5) > 3.841 THEN 1 ELSE 0 END AS srm_flag
FROM c
""",
)
def ab_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch check (Fabijan et al. — the guardrail
    every experimentation platform runs before reading ANY metric): a
    deterministic salted-md5 50/50 user assignment, the realized split
    vs expectation as a 1-dof chi-square, and the standard alpha=0.05
    flag (3.841 literal — no CDF needed in-engine). An SRM means the
    assignment or logging pipeline is broken and all downstream
    results are invalid. Distinct-user extraction is the only
    data-sized step; the test is integer counts into one rounded
    expression. NOTE the salt: this repo MEASURED that unsalted id-hash
    splits correlate with generated values (conformal coverage 0.81 vs
    0.90) — assignment hashes must always be salted."""
    u = t(spark, sf_dir, "events").select("user_id").distinct()
    arms = u.selectExpr(f"{_ARM_SPARK} AS arm")
    c = arms.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(F.col("arm") == "A", 1).otherwise(0)).cast("long").alias("n_a"),
        F.sum(F.when(F.col("arm") == "B", 1).otherwise(0)).cast("long").alias("n_b"),
    )
    chi = (
        "(CAST(n_a AS DOUBLE) - CAST(n AS DOUBLE) * 0.5)"
        " * (CAST(n_a AS DOUBLE) - CAST(n AS DOUBLE) * 0.5) / (CAST(n AS DOUBLE) * 0.5)"
        " + (CAST(n_b AS DOUBLE) - CAST(n AS DOUBLE) * 0.5)"
        " * (CAST(n_b AS DOUBLE) - CAST(n AS DOUBLE) * 0.5) / (CAST(n AS DOUBLE) * 0.5)"
    )
    return c.selectExpr(
        "n",
        "n_a",
        "n_b",
        "round(CAST(n_a AS DOUBLE) / CAST(n AS DOUBLE), 9) AS ratio_a",
        "CAST(0.5 AS DOUBLE) AS expected_ratio",
        f"round({chi}, 6) AS srm_chi2",
        f"CASE WHEN {chi} > 3.841 THEN 1 ELSE 0 END AS srm_flag",
    )


# ---------------------------------------------------------------------------
# session_gap_sensitivity
# ---------------------------------------------------------------------------

GAP_MINUTES = [15, 30, 60]


@register(
    "session_gap_sensitivity",
    oracle=f"""
WITH ev AS (
  SELECT user_id, CAST(epoch_ms(ts) AS BIGINT) AS ms, event_id FROM events
),
gaps AS (
  SELECT user_id,
         ms - lag(ms) OVER (PARTITION BY user_id ORDER BY ms, event_id) AS gap
  FROM ev
),
u AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_users FROM ev),
c AS (
  SELECT {", ".join(
    f"CAST(sum(CASE WHEN gap > {m} * 60000 THEN 1 ELSE 0 END) AS BIGINT) AS brk_{m}"
    for m in GAP_MINUTES)}
  FROM gaps WHERE gap IS NOT NULL
)
{" UNION ALL ".join(
    f'''SELECT {m} AS gap_minutes,
       u.n_users + c.brk_{m} AS n_sessions,
       round(CAST(u.n_users + c.brk_{m} AS DOUBLE) / CAST(u.n_users AS DOUBLE), 6)
         AS sessions_per_user
FROM c CROSS JOIN u''' for m in GAP_MINUTES)}
""",
)
def session_gap_sensitivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sessionizer's tuning curve: total session count (and
    sessions per user) at a ladder of inactivity-gap thresholds —
    sessions(T) = users + inter-event gaps exceeding T, so the WHOLE
    curve falls out of ONE keyed lag window and one conditional
    aggregate (adding thresholds costs zero extra passes; the naive
    approach re-sessionizes per threshold). This is the read that
    justifies the 30-minute default every sessionizer in this repo
    uses (sessionize_events / session_window variants). Gap extraction
    is the same keyed window as burstiness; everything downstream is
    constant-size."""
    ev = t(spark, sf_dir, "events").selectExpr("user_id", f"{EV_MS} AS ms", "event_id")
    w = Window.partitionBy("user_id").orderBy("ms", "event_id")
    gaps = ev.withColumn("gap", F.col("ms") - F.lag("ms").over(w))
    u = ev.agg(F.countDistinct("user_id").cast("long").alias("n_users"))
    c = gaps.where(F.col("gap").isNotNull()).agg(
        *[
            F.sum(F.when(F.col("gap") > m * 60000, 1).otherwise(0))
            .cast("long")
            .alias(f"brk_{m}")
            for m in GAP_MINUTES
        ]
    )
    out = None
    for m in GAP_MINUTES:
        part = (
            c.crossJoin(F.broadcast(u))
            .selectExpr(
                f"CAST({m} AS BIGINT) AS gap_minutes",
                f"n_users + brk_{m} AS n_sessions",
                f"round(CAST(n_users + brk_{m} AS DOUBLE)"
                " / CAST(n_users AS DOUBLE), 6) AS sessions_per_user",
            )
        )
        out = part if out is None else out.unionAll(part)
    return out
