"""Property-based tests (hypothesis) — the upgrade over the reference's
all-golden test strategy (SURVEY §5: "No randomized/property-based
testing" in flink-crawler).

The merge lattice must be a commutative monoid fold for the set-based
re-architecture to be sound: `merge_updates` re-aggregates (state ∪
updates) in arbitrary partition order, and `merge_updates_join`
pre-aggregates the delta — both are only correct because the pairwise
merge is commutative and associative. These properties are exactly what
we randomize. (Scores are drawn as integer-valued doubles so float
addition is exact and associativity holds bit-for-bit, matching the
decimal discipline the SQL layer applies.)
"""

from __future__ import annotations

from functools import reduce

from hypothesis import given, settings
from hypothesis import strategies as st

from flink_crawler_spark.functions.urls import normalize_url
from flink_crawler_spark.schemas import FETCH_STATUSES
from flink_crawler_spark.streaming.url_db import merge_one

obs_st = st.tuples(
    st.sampled_from(FETCH_STATUSES),
    st.integers(min_value=0, max_value=10**12),          # status_time
    st.integers(min_value=0, max_value=10**6).map(float), # score (exact doubles)
    st.integers(min_value=0, max_value=10**12),          # next_fetch_time
)


def m(a, b):
    return merge_one(a, *b)


@given(obs_st, obs_st)
@settings(max_examples=300)
def test_merge_commutative(a, b):
    assert m(a, b) == m(b, a)


@given(obs_st, obs_st, obs_st)
@settings(max_examples=300)
def test_merge_associative(a, b, c):
    assert m(m(a, b), c) == m(a, m(b, c))


@given(obs_st)
@settings(max_examples=100)
def test_merge_identity_and_idempotence_of_winners(a):
    # None is the identity
    assert merge_one(None, *a) == a
    # merging a non-UNFETCHED row with itself yields itself; UNFETCHED
    # self-merge doubles the score (link accumulation, by design)
    out = m(a, a)
    if a[0] != "UNFETCHED":
        assert out == a
    else:
        assert out == ("UNFETCHED", a[1], a[2] * 2, a[3])


@given(st.lists(obs_st, min_size=1, max_size=12), st.randoms())
@settings(max_examples=200)
def test_merge_fold_order_invariant(rows, rnd):
    """Any permutation folds to the same row — the property that makes
    partition-order-nondeterministic aggregation exact."""
    base = reduce(m, rows[1:], rows[0])
    shuffled = list(rows)
    rnd.shuffle(shuffled)
    assert reduce(m, shuffled[1:], shuffled[0]) == base


URLISH = st.text(
    alphabet="abcXYZ019.-_/:?&=%#~ +", min_size=1, max_size=60
).map(lambda s: "http://ex.com/" + s)


@given(URLISH)
@settings(max_examples=300)
def test_normalizer_idempotent(u):
    once = normalize_url(u)
    assert normalize_url(once) == once


@given(st.sampled_from([
    "example.com", "HTTP://EXAMPLE.COM:80/", "http://example.com/a/../b",
    "http://example.com/index.html", "http://example.com/?jsessionid=123",
]))
def test_normalizer_produces_scheme(u):
    assert normalize_url(u).startswith(("http://", "https://"))
