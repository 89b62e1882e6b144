"""Frontier selection: the FetchQueue + per-domain admission as queries.

Reference:
  * ``utils/FetchQueue.java:51-100`` — bounded score-descending queue with
    min-score / UNFETCHED-only admission and displace-lowest overflow.
  * ``functions/UrlDBFunction.java:261-323`` — per-domain round-robin
    admission driven by score-proportional timers (``:333-351``).

Set-based re-expression (the displacement mechanism disappears — each
tick recomputes the best queue from scratch, which *is* the displacement
semantics):

  frontier tick = filter(UNFETCHED, score >= min_fetch_score,
                         next_fetch_time <= now)
               -> per-PLD cap (focused-crawl fairness / politeness batch)
               -> global top-k by score.

Spark physical shape: the filters push into the parquet scan of the
state table; the per-PLD cap is one window (shuffle by pld); the global
top-k compiles to TakeOrderedAndProject — no full sort at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _eligible_expr(now_ms: int, min_fetch_score: float, refetch: bool):
    """Admission predicate. Default: UNFETCHED-only (FetchQueue.java
    admission). With ``refetch``, FETCHED rows whose next_fetch_time has
    arrived re-enter — the reference's re-crawl behavior (UrlDBFunction
    timers re-emit tracked URLs when their fetch time comes due); the
    new FETCHED observation then wins the merge by status_time."""
    # per-tick call: ONE F.expr round-trip instead of ~12 Column calls
    # (r13, guide §1.2). repr() of a Python float is round-trip exact and
    # Spark SQL parses scientific notation as DOUBLE, so the cast pins
    # the comparison type to the score column's.
    base = (
        f"(status = 'UNFETCHED' AND score >= CAST({float(min_fetch_score)!r} AS DOUBLE)"
        f" AND next_fetch_time <= {int(now_ms)})"
    )
    if not refetch:
        return F.expr(base)
    return F.expr(
        f"({base} OR (status = 'FETCHED' AND next_fetch_time <= {int(now_ms)}))"
    )


def select_frontier(
    crawl_state: DataFrame,
    *,
    now_ms: int,
    max_queue_size: int | None = 10_000,
    min_fetch_score: float = 0.0,
    max_per_domain: int | None = 100,
    refetch: bool = False,
) -> DataFrame:
    """One fetch-queue tick. Deterministic ties (score desc, url asc).

    ``max_per_domain`` mirrors MAX_IN_FLIGHT_URLS=100
    (``UrlDBFunction.java:54``): the per-tick in-flight cap per domain.
    ``None`` disables the cap (and its window) entirely.

    ``max_queue_size=None`` disables the global top-k entirely. This is
    not just a semantic switch: the limit compiles to a single-partition
    TakeOrderedAndProject, so downstream per-PLD stages (politeness
    windows) must re-shuffle back to pld. Unbounded mode keeps the frame
    pld-partitioned end-to-end — one exchange for the whole admission +
    politeness pipeline.
    """
    eligible = crawl_state.filter(_eligible_expr(now_ms, min_fetch_score, refetch))
    if max_per_domain is None:
        # unbounded per-domain admission (r13, guide §2.4): the cap
        # window is a per-tick exchange-by-pld + sort + filter that can
        # never drop a row — skip building it at all. Callers that know
        # their cap cannot bind (crawl_reachability's BFS semantics,
        # which the oracle pins WITHOUT any cap) pass None.
        capped = eligible
    else:
        per_domain = Window.partitionBy("pld").orderBy(
            F.col("score").desc(), F.col("url").asc()
        )
        capped = (
            eligible.withColumn("rn", F.row_number().over(per_domain))
            .filter(F.col("rn") <= F.lit(max_per_domain))
            .drop("rn")
        )
    if max_queue_size is None:
        return capped
    return capped.orderBy(F.col("score").desc(), F.col("url").asc()).limit(max_queue_size)


def domain_quotas(
    domain_scores: DataFrame,
    *,
    budget: int,
    min_quota: int = 1,
) -> DataFrame:
    """Score-proportional per-domain fetch quotas.

    Batch analogue of the reference's score-scaled per-domain timer
    interval (``UrlDBFunction.java:333-351``: interval = 200ms x
    avgAllDomainScores / thisDomainScore, clamped [1,1000]ms — better
    domains polled more often). Here: quota_d = max(min_quota,
    round(budget * score_d / sum(scores))) — same focusing policy,
    set-at-a-time. Floor of 0.01 on scores mirrors ``:360-373``.
    """
    floored = domain_scores.select(
        "pld", F.greatest(F.col("score"), F.lit(0.01)).alias("score")
    )
    total = floored.agg(F.sum("score").alias("total"))
    return (
        floored.crossJoin(F.broadcast(total))
        .select(
            "pld",
            F.greatest(
                F.lit(min_quota),
                F.round(F.lit(budget) * F.col("score") / F.col("total")).cast("long"),
            ).alias("quota"),
        )
    )


def select_frontier_with_quotas(
    crawl_state: DataFrame,
    domain_scores: DataFrame,
    *,
    now_ms: int,
    budget: int,
    min_fetch_score: float = 0.0,
    refetch: bool = False,
) -> DataFrame:
    """Frontier tick with score-proportional per-domain quotas.

    The quota table is tiny (one row per PLD) -> broadcast join, so the
    only shuffle is the per-PLD window on the (already filtered) state.
    """
    quotas = domain_quotas(domain_scores, budget=budget)
    eligible = crawl_state.filter(_eligible_expr(now_ms, min_fetch_score, refetch))
    per_domain = Window.partitionBy("pld").orderBy(F.col("score").desc(), F.col("url").asc())
    return (
        eligible.join(F.broadcast(quotas), "pld", "left")
        .withColumn("rn", F.row_number().over(per_domain))
        .filter(F.col("rn") <= F.coalesce(F.col("quota"), F.lit(1)))
        .drop("rn", "quota")
    )


def mark_queued(frontier: DataFrame, *, now_ms: int) -> DataFrame:
    """Status transition for admitted URLs (FetchQueue.addToQueue:72-76)."""
    return frontier.select(
        "url",
        "pld",
        F.lit("QUEUED").alias("status"),
        F.lit(now_ms).alias("status_time"),
        "score",
        "next_fetch_time",
    )
