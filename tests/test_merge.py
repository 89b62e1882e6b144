"""Merge-lattice tests — the URL-DB upsert semantics.

Mirrors ``DefaultUrlStateMergerTest`` (reference
src/test/java/com/scaleunlimited/flinkcrawler/urldb/DefaultUrlStateMergerTest.java:16-33)
generalized to the n-way set fold in operators/merge.py.
"""

from __future__ import annotations

from flink_crawler_spark.operators.merge import OBS_COLS, merge_crawl_state, merge_updates

COLS = list(OBS_COLS)  # url, pld, status, status_time, score, next_fetch_time


def rows_df(spark, rows):
    return spark.createDataFrame(rows, COLS)


def merged_map(df):
    return {r["url"]: r.asDict() for r in merge_crawl_state(df).collect()}


def test_unfetched_scores_sum(spark):
    df = rows_df(
        spark,
        [
            ("u1", "d.com", "UNFETCHED", 100, 1.0, 500),
            ("u1", "d.com", "UNFETCHED", 200, 2.5, 400),
            ("u1", "d.com", "UNFETCHED", 150, 0.5, 600),
        ],
    )
    m = merged_map(df)["u1"]
    assert m["status"] == "UNFETCHED"
    assert m["score"] == 4.0  # link-score accumulation
    assert m["status_time"] == 200  # max
    assert m["next_fetch_time"] == 400  # min


def test_non_unfetched_beats_unfetched(spark):
    df = rows_df(
        spark,
        [
            ("u1", "d.com", "UNFETCHED", 900, 10.0, 100),
            ("u1", "d.com", "FETCHED", 100, 1.0, 999),
        ],
    )
    m = merged_map(df)["u1"]
    assert m["status"] == "FETCHED"
    assert m["score"] == 1.0  # UNFETCHED score does NOT leak in
    assert m["status_time"] == 100
    assert m["next_fetch_time"] == 999


def test_newest_non_unfetched_wins(spark):
    df = rows_df(
        spark,
        [
            ("u1", "d.com", "FETCHED", 100, 1.0, 500),
            ("u1", "d.com", "HTTP_NOT_FOUND", 300, 2.0, 700),
            ("u1", "d.com", "FETCHING", 200, 3.0, 600),
        ],
    )
    m = merged_map(df)["u1"]
    assert m["status"] == "HTTP_NOT_FOUND"
    assert m["status_time"] == 300


def test_equal_timestamp_tie_breaks_by_status_priority(spark):
    """FetchStatus merge priority (pojos/FetchStatus.java:54-57): at equal
    status_time the higher-priority class wins (50-class > FETCHED=25)."""
    df = rows_df(
        spark,
        [
            ("u1", "d.com", "FETCHED", 100, 1.0, 500),
            ("u1", "d.com", "SKIPPED_BLOCKED", 100, 2.0, 700),
        ],
    )
    m = merged_map(df)["u1"]
    assert m["status"] == "SKIPPED_BLOCKED"

    # matches the streaming pairwise merge in both argument orders
    from flink_crawler_spark.streaming.url_db import merge_one

    assert merge_one(("FETCHED", 100, 1.0, 500), "SKIPPED_BLOCKED", 100, 2.0, 700)[0] == "SKIPPED_BLOCKED"
    assert merge_one(("SKIPPED_BLOCKED", 100, 2.0, 700), "FETCHED", 100, 1.0, 500)[0] == "SKIPPED_BLOCKED"


def test_single_row_identity(spark):
    df = rows_df(spark, [("u1", "d.com", "UNFETCHED", 100, 1.5, 500)])
    m = merged_map(df)["u1"]
    assert m == {
        "url": "u1",
        "pld": "d.com",
        "status": "UNFETCHED",
        "status_time": 100,
        "score": 1.5,
        "next_fetch_time": 500,
    }


def test_merge_updates_folds_state_and_updates(spark):
    state = rows_df(spark, [("u1", "d.com", "FETCHED", 100, 1.0, 500)])
    updates = rows_df(
        spark,
        [
            ("u1", "d.com", "UNFETCHED", 200, 9.0, 50),  # re-discovered link: ignored
            ("u2", "d.com", "UNFETCHED", 150, 2.0, 300),  # brand new
        ],
    )
    m = {r["url"]: r.asDict() for r in merge_updates(state, updates).collect()}
    assert m["u1"]["status"] == "FETCHED"
    assert m["u1"]["score"] == 1.0
    assert m["u2"]["status"] == "UNFETCHED"
    assert m["u2"]["score"] == 2.0


def test_merge_is_associative(spark):
    """(a ⊕ b) ⊕ c == a ⊕ (b ⊕ c) — required for set-based refolds."""
    a = rows_df(spark, [("u", "d", "UNFETCHED", 10, 1.0, 90)])
    b = rows_df(spark, [("u", "d", "UNFETCHED", 20, 2.0, 80)])
    c = rows_df(spark, [("u", "d", "FETCHED", 15, 0.5, 70)])
    left = merge_updates(merge_updates(a, b), c).collect()[0].asDict()
    right = merge_updates(a, merge_updates(b, c)).collect()[0].asDict()
    assert left == right
