"""FetchQueue / frontier-selection semantics.

Mirrors ``FetchQueueTest`` (reference
src/test/java/com/scaleunlimited/flinkcrawler/utils/FetchQueueTest.java:17-87):
score-descending order, bounded size with displace-lowest, min-score and
status admission rules — re-expressed as the set-based frontier query.
"""

from __future__ import annotations

from flink_crawler_spark.operators.frontier import (
    domain_quotas,
    mark_queued,
    select_frontier,
    select_frontier_with_quotas,
)

COLS = ["url", "pld", "status", "status_time", "score", "next_fetch_time"]


def state_df(spark, rows):
    return spark.createDataFrame(rows, COLS)


def test_score_descending_and_bounded(spark):
    rows = [(f"u{i}", "d.com", "UNFETCHED", 0, float(i), 0) for i in range(10)]
    df = state_df(spark, rows)
    got = select_frontier(df, now_ms=100, max_queue_size=3).collect()
    assert [r["url"] for r in got] == ["u9", "u8", "u7"]  # displace-lowest == top-k


def test_min_score_and_status_admission(spark):
    df = state_df(
        spark,
        [
            ("low", "d.com", "UNFETCHED", 0, 0.5, 0),
            ("ok", "d.com", "UNFETCHED", 0, 0.9, 0),
            ("fetched", "d.com", "FETCHED", 0, 5.0, 0),
            ("queued", "d.com", "QUEUED", 0, 5.0, 0),
        ],
    )
    got = select_frontier(df, now_ms=100, min_fetch_score=0.75).collect()
    assert [r["url"] for r in got] == ["ok"]


def test_next_fetch_time_gate(spark):
    df = state_df(
        spark,
        [
            ("ready", "d.com", "UNFETCHED", 0, 1.0, 50),
            ("later", "d.com", "UNFETCHED", 0, 2.0, 500),
        ],
    )
    got = select_frontier(df, now_ms=100).collect()
    assert [r["url"] for r in got] == ["ready"]


def test_per_domain_cap(spark):
    rows = [(f"a{i}", "a.com", "UNFETCHED", 0, 10.0 - i, 0) for i in range(5)]
    rows += [("b0", "b.com", "UNFETCHED", 0, 1.0, 0)]
    got = select_frontier(state_df(spark, rows), now_ms=1, max_per_domain=2).collect()
    by_pld = {}
    for r in got:
        by_pld.setdefault(r["pld"], []).append(r["url"])
    assert sorted(by_pld["a.com"]) == ["a0", "a1"]  # best two by score
    assert by_pld["b.com"] == ["b0"]


def test_domain_quotas_proportional(spark):
    ds = spark.createDataFrame([("a.com", 3.0), ("b.com", 1.0), ("c.com", 0.0)], ["pld", "score"])
    got = {r["pld"]: r["quota"] for r in domain_quotas(ds, budget=100).collect()}
    assert got["a.com"] == 75
    assert got["b.com"] == 25
    assert got["c.com"] == 1  # floored score 0.01 -> min quota


def test_frontier_with_quotas_focuses_on_good_domains(spark):
    rows = [(f"a{i}", "a.com", "UNFETCHED", 0, 5.0, 0) for i in range(10)]
    rows += [(f"b{i}", "b.com", "UNFETCHED", 0, 5.0, 0) for i in range(10)]
    state = state_df(spark, rows)
    ds = spark.createDataFrame([("a.com", 9.0), ("b.com", 1.0)], ["pld", "score"])
    got = select_frontier_with_quotas(state, ds, now_ms=1, budget=10).collect()
    n = {"a.com": 0, "b.com": 0}
    for r in got:
        n[r["pld"]] += 1
    assert n["a.com"] == 9 and n["b.com"] == 1


def test_mark_queued_transition(spark):
    df = state_df(spark, [("u", "d.com", "UNFETCHED", 0, 1.0, 0)])
    got = mark_queued(select_frontier(df, now_ms=1), now_ms=42).collect()[0]
    assert got["status"] == "QUEUED"
    assert got["status_time"] == 42


def test_recrawl_schedule_aimd_laws(spark, sf_dir):
    """AIMD refetch-policy invariants beyond the oracle: interval stays
    within [MIN, MAX]; an all-changed history pins the floor; an
    all-unchanged history saturates the cap; next fetch is last fetch
    plus the final interval."""
    from pyspark.sql import functions as F

    from flink_crawler_spark.queries.crawlq import (
        RECRAWL_INIT_H,
        RECRAWL_MAX_H,
        RECRAWL_MIN_H,
        recrawl_schedule,
    )

    out = recrawl_schedule(spark, sf_dir).cache()
    bad = out.filter(
        (F.col("interval_hours") < RECRAWL_MIN_H)
        | (F.col("interval_hours") > RECRAWL_MAX_H)
        | (F.col("n_changes") >= F.col("n_fetches"))  # flags = n-1 comparisons
        | (F.col("n_fetches") < 1)
    ).count()
    assert bad == 0
    # closed-form spot check: never-changed history doubles from INIT to cap
    row = out.filter(F.col("n_changes") == 0).orderBy(F.col("n_fetches").desc()).head()
    if row is not None:
        expect = RECRAWL_INIT_H
        for _ in range(row["n_fetches"] - 1):
            expect = min(expect * 2, RECRAWL_MAX_H)
        assert row["interval_hours"] == expect
    out.unpersist()
