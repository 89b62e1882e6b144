"""Algebraic laws of the URL-DB merge lattice under randomized inputs.

The §2.5 claim is that `merge_crawl_state` is a FOLD over a lattice:
the result is independent of observation order, partitioning, and
incremental grouping. These are exactly the properties that make the
one-shot batch merge, the bucketed tick merge, and the streaming
applyInPandasWithState twin interchangeable — so they get property
tests, not just examples (reference: DefaultUrlStateMerger.java:18-61,
whose pairwise merger leaves arrival-order nondeterminism; ours pins a
total order and these tests prove it).
"""

from __future__ import annotations

import random

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from flink_crawler_spark.operators.merge import OBS_COLS, merge_crawl_state, merge_updates
from flink_crawler_spark.schemas import FETCH_STATUSES

_URLS = [f"http://d{i % 3}.ex.com/p/{i}" for i in range(6)]

_obs = st.tuples(
    st.sampled_from(_URLS),
    st.sampled_from(FETCH_STATUSES),
    st.integers(min_value=0, max_value=5),  # status_time (small => ties likely)
    st.integers(min_value=0, max_value=50),  # score * 10
    st.integers(min_value=0, max_value=5),  # next_fetch_time
)


def _frame(spark, rows):
    data = [
        (u, u.split("/")[2], s, int(t), x / 10.0, int(nft))
        for (u, s, t, x, nft) in rows
    ]
    return spark.createDataFrame(
        data,
        "url string, pld string, status string, status_time long,"
        " score double, next_fetch_time long",
    )


def _canon(df):
    return sorted(
        (r.url, r.status, r.status_time, round(r.score, 9), r.next_fetch_time)
        for r in df.select(*OBS_COLS).collect()
    )


@settings(max_examples=15, deadline=None)
@given(rows=st.lists(_obs, min_size=1, max_size=24), seed=st.integers(0, 2**16))
def test_merge_is_order_and_partitioning_independent(spark, rows, seed):
    rnd = random.Random(seed)
    shuffled = rows[:]
    rnd.shuffle(shuffled)
    a = _canon(merge_crawl_state(_frame(spark, rows).coalesce(1)))
    b = _canon(merge_crawl_state(_frame(spark, shuffled).repartition(7)))
    assert a == b


@settings(max_examples=15, deadline=None)
@given(rows=st.lists(_obs, min_size=2, max_size=24), cut=st.integers(1, 23))
def test_incremental_merge_equals_oneshot(spark, rows, cut):
    cut = min(cut, len(rows) - 1)
    one_shot = _canon(merge_crawl_state(_frame(spark, rows)))
    state = merge_crawl_state(_frame(spark, rows[:cut]))
    incremental = _canon(merge_updates(state, _frame(spark, rows[cut:])))
    assert incremental == one_shot


@settings(max_examples=10, deadline=None)
@given(rows=st.lists(_obs, min_size=1, max_size=12))
def test_merge_is_idempotent(spark, rows):
    merged = merge_crawl_state(_frame(spark, rows))
    once = _canon(merged)
    twice = _canon(merge_crawl_state(merged.select(*OBS_COLS)))
    assert once == twice
    # and folding the merged state with itself changes nothing for
    # non-UNFETCHED rows; UNFETCHED rows double their score (sum
    # semantics) — the lattice is idempotent on the argmax branch only,
    # which is exactly the reference's semantics
    refold = merge_updates(merged, merged.filter(F.col("status") != "UNFETCHED"))
    assert _canon(refold.filter(F.col("status") != "UNFETCHED")) == sorted(
        x for x in once if x[1] != "UNFETCHED"
    )
