"""Window-operator semantics (moving average, rate, politeness)."""

from __future__ import annotations

import datetime as dt

from flink_crawler_spark.operators.windows import (
    moving_average,
    politeness_gaps,
    rate_over_window,
    status_counts,
)


def test_moving_average_last_n(spark):
    rows = [("d", i, float(i)) for i in range(1, 6)]  # 1..5
    df = spark.createDataFrame(rows, ["pld", "seq", "score"])
    got = {r["seq"]: r["moving_avg"] for r in moving_average(df, window_size=3).collect()}
    assert got[1] == 1.0
    assert got[2] == 1.5
    assert got[3] == 2.0  # (1+2+3)/3
    assert got[5] == 4.0  # (3+4+5)/3


def test_politeness_gaps_flags_violations(spark):
    rows = [("d.com", 0), ("d.com", 5_000), ("d.com", 20_000), ("e.com", 6_000)]
    df = spark.createDataFrame(rows, ["pld", "fetch_time"])
    got = politeness_gaps(df, min_gap_ms=10_000).collect()
    by = {(r["pld"], r["fetch_time"]): r for r in got}
    assert by[("d.com", 0)]["violates_delay"] is False  # first fetch
    assert by[("d.com", 5_000)]["violates_delay"] is True  # 5s < 10s
    assert by[("d.com", 20_000)]["violates_delay"] is False  # 15s gap
    assert by[("e.com", 6_000)]["violates_delay"] is False  # other domain


def test_rate_over_window_counts_trailing_range(spark):
    base = dt.datetime(2026, 1, 1, 0, 0, 0)
    rows = [(base + dt.timedelta(seconds=s),) for s in [0, 10, 20, 100]]
    df = spark.createDataFrame(rows, ["ts"])
    got = sorted(
        rate_over_window(df, range_seconds=30).collect(), key=lambda r: r["ts"]
    )
    assert [r["events_in_window"] for r in got] == [1, 2, 3, 1]


def test_session_window_boundary_matches_batch_rule(spark):
    """An event exactly gap-later merges into the session in BOTH the
    streaming session_window and the batch lag rule (gap > threshold
    starts a new session) — pins the boundary the oracle relies on."""
    import datetime as dt

    from pyspark.sql import functions as F

    base = dt.datetime(2026, 1, 1)
    rows = [
        (1, base),
        (1, base + dt.timedelta(hours=1)),  # exactly 1h: same session
        (1, base + dt.timedelta(hours=2, seconds=1)),  # 1h1s: new session
    ]
    df = spark.createDataFrame(rows, "user_id int, ts_t timestamp")
    n = df.groupBy(F.session_window("ts_t", "1 hour"), "user_id").count().count()
    assert n == 2


def test_status_counts(spark):
    rows = [("u1", "UNFETCHED"), ("u2", "UNFETCHED"), ("u3", "FETCHED")]
    df = spark.createDataFrame(rows, ["url", "status"])
    got = {r["status"]: r["n"] for r in status_counts(df).collect()}
    assert got == {"UNFETCHED": 2, "FETCHED": 1}
