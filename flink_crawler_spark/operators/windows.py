"""Windowed aggregations: moving averages, fetch-rate, politeness lag.

Reference:
  * ``functions/MovingAverageFunction.java:14-51`` +
    ``MovingAverageAccumulator.java:6-39`` — per-PLD mean of the last 10
    scores (count-based sliding window over arrival order).
  * ``functions/FetchUrlsFunction.java:169-224`` — ``TimedCounter`` 30 s
    ring buffer -> fetches/sec gauge.
  * ``functions/FetchUrlsFunction.java:88-97`` — per-domain politeness:
    next allowed fetch time = previous fetch + crawl_delay.

All three are exact Spark window functions — no state machinery needed in
batch mode. (The Structured Streaming variants live in streaming/.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def moving_average(
    df: DataFrame,
    *,
    key: str = "pld",
    order: str = "seq",
    value: str = "score",
    window_size: int = 10,
    out: str = "moving_avg",
) -> DataFrame:
    """Count-based sliding mean — ROWS BETWEEN (n-1) PRECEDING AND CURRENT."""
    w = Window.partitionBy(key).orderBy(order).rowsBetween(-(window_size - 1), 0)
    return df.withColumn(out, F.avg(value).over(w))


def rate_over_window(
    df: DataFrame,
    *,
    ts: str = "ts",
    key: str | None = None,
    range_seconds: int = 30,
    out: str = "events_in_window",
) -> DataFrame:
    """Sliding event-count over a trailing time range (TimedCounter analogue).

    Numeric RANGE frame over epoch seconds — portable to any SQL engine.
    """
    epoch = F.unix_timestamp(F.col(ts)).alias("__epoch")
    base = df.withColumn("__epoch", epoch)
    w = Window.orderBy("__epoch").rangeBetween(-range_seconds, 0)
    if key:
        w = Window.partitionBy(key).orderBy("__epoch").rangeBetween(-range_seconds, 0)
    return base.withColumn(out, F.count(F.lit(1)).over(w)).drop("__epoch")


def politeness_gaps(
    df: DataFrame,
    *,
    key: str = "pld",
    ts: str = "fetch_time",
    min_gap_ms: int | None = None,
    out: str = "gap_ms",
) -> DataFrame:
    """Per-domain as-of gap to the previous fetch (lag window).

    With ``min_gap_ms`` set, adds a ``violates_delay`` flag — the batch
    analogue of the reference's SKIPPED_CRAWLDELAY decision.
    """
    w = Window.partitionBy(key).orderBy(ts)
    res = df.withColumn(out, F.col(ts) - F.lag(ts).over(w))
    if min_gap_ms is not None:
        res = res.withColumn(
            "violates_delay", F.coalesce(F.col(out) < F.lit(min_gap_ms), F.lit(False))
        )
    return res


def status_counts(crawl_state: DataFrame) -> DataFrame:
    """Per-status row counts (metrics/CounterUtils.java:64-146 observable form)."""
    return crawl_state.groupBy("status").agg(F.count(F.lit(1)).alias("n"))
