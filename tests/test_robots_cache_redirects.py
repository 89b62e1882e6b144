"""Robots TTL-cache refresh and redirect-following fetch."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_crawler_spark.operators.fetch import http_fetch
from flink_crawler_spark.operators.robots import ROBOTS_TTL_MS, refresh_robots_cache

CACHE_SCHEMA = (
    "host_root string, disallow array<string>, allow array<string>, "
    "crawl_delay_ms long, sitemaps array<string>, fetch_status string, "
    "fetched_at long, expires_at long"
)


def test_refresh_fetches_missing_and_expired_only(spark):
    def fetcher(url):
        if "fresh.com" in url:
            raise AssertionError("fresh cache entry must not be refetched")
        if "a.com" in url:
            return (200, b"User-agent: *\nDisallow: /priv\nCrawl-delay: 3", "text/plain")
        if "gone.com" in url:
            return (404, b"", None)
        return (503, b"", None)

    now = 1_000_000
    cache = spark.createDataFrame(
        [
            # fresh entry: must NOT be refetched
            ("http://fresh.com", ["/x"], [], 1000, [], "ok", 0, now + 99_999),
            # expired entry: must be refetched (-> error host here)
            ("http://err.com", [], [], None, [], "ok", 0, now - 1),
        ],
        CACHE_SCHEMA,
    )
    needed = spark.createDataFrame(
        [("http://fresh.com",), ("http://a.com",), ("http://gone.com",), ("http://err.com",)],
        ["host_root"],
    )
    out = refresh_robots_cache(cache, needed, fetcher=fetcher, now_ms=now)
    rows = {r["host_root"]: r for r in out.collect()}

    # fresh.com reused (fetched_at unchanged), everything else refetched now
    assert rows["http://fresh.com"]["fetched_at"] == 0
    assert all(
        rows[h]["fetched_at"] == now
        for h in ("http://a.com", "http://gone.com", "http://err.com")
    )
    assert rows["http://fresh.com"]["disallow"] == ["/x"]
    assert rows["http://a.com"]["disallow"] == ["/priv"]
    assert rows["http://a.com"]["crawl_delay_ms"] == 3000
    assert rows["http://a.com"]["expires_at"] == now + ROBOTS_TTL_MS["ok"]
    # 404 -> allow-all with 24h TTL
    assert rows["http://gone.com"]["disallow"] == []
    assert rows["http://gone.com"]["fetch_status"] == "missing"
    assert rows["http://gone.com"]["expires_at"] == now + ROBOTS_TTL_MS["missing"]
    # 5xx -> deny-all, short TTL (defer)
    assert rows["http://err.com"]["disallow"] == ["/"]
    assert rows["http://err.com"]["expires_at"] == now + ROBOTS_TTL_MS["error"]


def test_http_fetch_follows_redirects(spark):
    web = {
        "http://a.com/old": (301, b"", None, "http://a.com/new"),
        "http://a.com/new": (200, b"<html>n</html>", "text/html"),
        "http://a.com/loop": (302, b"", None, "http://a.com/loop"),
        "http://a.com/dangling": (301, b"", None, None),
    }
    frontier = spark.createDataFrame(
        [(u, "a.com", 1.0, 0) for u in web],
        "url string, pld string, score double, fetch_time long",
    )
    got = {r["url"]: r for r in http_fetch(frontier, fetcher=lambda u: web[u], now_ms=0).collect()}
    assert got["http://a.com/old"]["status"] == "FETCHED"
    assert got["http://a.com/old"]["fetched_url"] == "http://a.com/new"  # post-redirect URL
    assert got["http://a.com/loop"]["status"] == "HTTP_TOO_MANY_REDIRECTS"
    assert got["http://a.com/dangling"]["status"] == "HTTP_REDIRECTION_ERROR"


def test_robots_wildcard_and_anchor_rules(spark):
    """RFC 9309 pattern semantics through check_urls_against_robots:
    the documented fish examples — '*' spans any chars, trailing '$'
    anchors, longest (most specific) rule wins, allow wins ties."""
    from flink_crawler_spark.operators.robots import check_urls_against_robots

    rules = spark.createDataFrame(
        [
            (
                "http://ex.com",
                ["/fish*.php", "/*.gif$", "/private"],
                ["/fish/allowed.php"],
                None,
                [],
            )
        ],
        "host_root string, disallow array<string>, allow array<string>, "
        "crawl_delay_ms long, sitemaps array<string>",
    )
    cases = {
        "http://ex.com/fish/salmon.php": "blocked",       # /fish*.php
        "http://ex.com/fishy.php": "blocked",             # * matches empty run too
        "http://ex.com/fish/allowed.php": "passed",       # allow longer than /fish*.php
        "http://ex.com/img/cat.gif": "blocked",           # /*.gif$
        "http://ex.com/img/cat.gif?v=2": "blocked",       # path_expr strips the query -> still .gif
        "http://ex.com/img/cat.gifx": "passed",           # $ anchor rejects suffix
        "http://ex.com/private/x": "blocked",             # plain prefix fast path
        "http://ex.com/public": "passed",
    }
    frontier = spark.createDataFrame([(u,) for u in cases], ["url"])
    routed = {r["url"]: r["route"] for r in check_urls_against_robots(frontier, rules).collect()}
    for url, want in cases.items():
        assert routed[url] == want, f"{url}: {routed[url]} != {want}"


def test_robots_literal_metachars_not_regex(spark):
    """Regex metachars inside rules stay literal: '/a.b' must not match
    '/axb', '/a+b' must not behave like a quantifier."""
    from flink_crawler_spark.operators.robots import check_urls_against_robots

    rules = spark.createDataFrame(
        [("http://ex.com", ["/a.b", "/c+d*e"], [], None, [])],
        "host_root string, disallow array<string>, allow array<string>, "
        "crawl_delay_ms long, sitemaps array<string>",
    )
    frontier = spark.createDataFrame(
        [("http://ex.com/a.b/x",), ("http://ex.com/axb/x",),
         ("http://ex.com/c+dZZe",), ("http://ex.com/cccde",)], ["url"]
    )
    routed = {r["url"]: r["route"] for r in check_urls_against_robots(frontier, rules).collect()}
    assert routed["http://ex.com/a.b/x"] == "blocked"
    assert routed["http://ex.com/axb/x"] == "passed"      # '.' is literal
    assert routed["http://ex.com/c+dZZe"] == "blocked"    # '*' spans ZZ
    assert routed["http://ex.com/cccde"] == "passed"      # '+' is literal
