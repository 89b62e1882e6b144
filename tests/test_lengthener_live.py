"""Live URL-lengthener resolution (P1 second half).

Reference parity: urls/SimpleUrlLengthenerTest.java:39-53 — a shortener
URL unknown to any table resolves through the (mock) HEAD fetcher, the
redirect chain is chased until it leaves the shortener set, and the LRU
memo makes the second occurrence of the same short URL cost zero HTTP
calls (MockUrlLengthenerFetcher analogue: dict-backed resolver).
"""

import uuid

import pytest
from pyspark.sql import functions as F

from flink_crawler_spark.operators.lengthen import (
    _chase,
    lengthen_urls_live,
)


def _mk_urls(spark, rows):
    return spark.createDataFrame([(u, s) for u, s in rows], "url string, score double")


def test_unknown_short_url_resolves_via_mock_resolver(spark):
    tag = uuid.uuid4().hex[:8]
    short = f"http://bit.ly/{tag}"
    final = f"http://example.com/long/{tag}"
    calls = spark.sparkContext.accumulator(0)
    table = {short: (301, final)}

    def resolver(url):
        calls.add(1)
        return table.get(url, (404, None))

    urls = _mk_urls(
        spark,
        [(short, 1.0), (short, 2.0), (f"http://plain.com/{tag}", 3.0)],
    )
    out = lengthen_urls_live(urls, None, resolver=resolver).collect()
    got = {(r["url"], r["score"]) for r in out}
    assert got == {
        (final, 1.0),
        (final, 2.0),
        (f"http://plain.com/{tag}", 3.0),
    }
    # LRU hit: the duplicated short URL co-locates (repartition on url)
    # and resolves exactly once; the plain URL never touches the resolver.
    assert calls.value == 1


def test_redirect_chain_chases_across_shorteners(spark):
    tag = uuid.uuid4().hex[:8]
    a, b = f"http://bit.ly/{tag}", f"http://t.co/{tag}"
    final = f"http://news.site/{tag}"
    table = {a: (301, b), b: (302, final)}
    out = lengthen_urls_live(
        _mk_urls(spark, [(a, 1.0)]), None, resolver=lambda u: table[u]
    ).collect()
    assert out[0]["url"] == final


def test_table_hit_skips_live_resolver(spark):
    tag = uuid.uuid4().hex[:8]
    short = f"http://tinyurl.com/{tag}"
    final = f"http://known.com/{tag}"
    redirects = spark.createDataFrame(
        [(short, final)], "short_url string, long_url string"
    )
    calls = spark.sparkContext.accumulator(0)

    def resolver(url):
        calls.add(1)
        return (404, None)

    out = lengthen_urls_live(
        _mk_urls(spark, [(short, 1.0)]), redirects, resolver=resolver
    ).collect()
    assert out[0]["url"] == final
    assert calls.value == 0


def test_chase_error_and_nonredirect_pass_through():
    shorts = frozenset({"bit.ly"})

    def boom(url):
        raise OSError("connection refused")

    assert _chase("http://bit.ly/x", boom, shorts, 5) == "http://bit.ly/x"
    # non-redirect answer: URL passes through unchanged
    assert _chase("http://bit.ly/y", lambda u: (200, None), shorts, 5) == "http://bit.ly/y"


def test_chase_too_many_hops_returns_last():
    shorts = frozenset({"bit.ly"})
    table = {f"http://bit.ly/{i}": (301, f"http://bit.ly/{i+1}") for i in range(10)}
    got = _chase("http://bit.ly/0", lambda u: table[u], shorts, 3)
    assert got == "http://bit.ly/3"
