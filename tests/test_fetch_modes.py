"""Fetch-stage modes: mime filter, injected-HTTP fetcher, single-domain."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_crawler_spark.operators.fetch import http_fetch, mime_filter
from flink_crawler_spark.plans.crawl_loop import CrawlConfig, crawl
from flink_crawler_spark.sources.fixtures import render_pages, web_graph_from_adjacency


def test_mime_filter_marks_non_html(spark):
    rows = [
        ("u1", "FETCHED", b"<html>", "text/html"),
        ("u2", "FETCHED", b"%PDF", "application/pdf"),
        ("u3", "HTTP_NOT_FOUND", None, None),
    ]
    df = spark.createDataFrame(rows, "url string, status string, content binary, content_type string")
    got = {r["url"]: r for r in mime_filter(df).collect()}
    assert got["u1"]["status"] == "FETCHED"
    assert got["u2"]["status"] == "ABORTED_INVALID_MIMETYPE"
    assert got["u2"]["content"] is None  # content dropped before parse
    assert got["u3"]["status"] == "HTTP_NOT_FOUND"  # non-FETCHED untouched


def test_http_fetch_with_injected_fetcher(spark):
    """The real-HTTP plumbing with a dict-backed fake (the reference's
    BaseHttpFetcherBuilder injection point)."""
    web = {
        "http://a.com/1": (200, b"<html>one</html>", "text/html"),
        "http://a.com/2": (404, b"", None),
        "http://b.com/1": (503, b"", None),
    }

    def fake_fetcher(url):
        if url == "http://err.com/":
            raise OSError("boom")
        return web[url]

    frontier = spark.createDataFrame(
        [
            ("http://a.com/1", "a.com", 1.0, 1000),
            ("http://a.com/2", "a.com", 0.5, 2000),
            ("http://b.com/1", "b.com", 1.0, 1000),
            ("http://err.com/", "err.com", 1.0, 1000),
        ],
        "url string, pld string, score double, fetch_time long",
    )
    got = {r["url"]: r for r in http_fetch(frontier, fetcher=fake_fetcher, now_ms=0).collect()}
    assert got["http://a.com/1"]["status"] == "FETCHED"
    assert bytes(got["http://a.com/1"]["content"]) == b"<html>one</html>"
    assert got["http://a.com/2"]["status"] == "HTTP_NOT_FOUND"
    assert got["http://b.com/1"]["status"] == "HTTP_SERVER_ERROR"
    assert got["http://err.com/"]["status"] == "ERROR_IOEXCEPTION"


def test_http_fetch_truncates_content(spark):
    def big_fetcher(url):
        return (200, b"x" * 100, "text/html")

    frontier = spark.createDataFrame(
        [("http://a.com/big", "a.com", 1.0, 0)],
        "url string, pld string, score double, fetch_time long",
    )
    got = http_fetch(frontier, fetcher=big_fetcher, now_ms=0, max_content_size=10).collect()[0]
    assert len(bytes(got["content"])) == 10  # -maxcontentsize truncation


def test_single_domain_crawl_ignores_foreign_outlinks(spark):
    adjacency = {
        "http://mine.com/": ["http://mine.com/a", "http://other.com/"],
        "http://mine.com/a": [],
        "http://other.com/": [],
    }
    pages = render_pages(web_graph_from_adjacency(spark, adjacency)).localCheckpoint(eager=True)
    seeds = spark.createDataFrame(
        [("http://mine.com/", 1.0), ("http://other.com/", 1.0)], ["url", "score"]
    )
    res = crawl(
        spark, seeds, pages=pages,
        config=CrawlConfig(max_ticks=5, trace=False, single_domain="mine.com"),
    )
    st = {r["url"]: r["status"] for r in res.crawl_state.collect()}
    assert st == {"http://mine.com/": "FETCHED", "http://mine.com/a": "FETCHED"}
