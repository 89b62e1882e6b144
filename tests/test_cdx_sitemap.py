"""SURT/CDX lookup and real sitemap-XML parsing."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_crawler_spark.operators.commoncrawl import cdx_lookup, surt_key_expr
from flink_crawler_spark.operators.parse import parse_sitemap_xml_body


def test_surt_key_canonicalization(spark):
    urls = [
        "http://www.Example.com/A/b?q=1",
        "https://example.com:443/A/b?q=1",
        "http://example.com:8080/x",
        "http://sub.example.co.uk/",
        "http://example.com",
    ]
    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    got = {r["url"]: r["k"] for r in df.select("url", surt_key_expr(F.col("url")).alias("k")).collect()}
    # www + default ports collapse to the same key; case folds
    assert got["http://www.Example.com/A/b?q=1"] == "com,example)/a/b?q=1"
    assert got["https://example.com:443/A/b?q=1"] == "com,example)/a/b?q=1"
    assert got["http://example.com:8080/x"] == "com,example:8080)/x"
    assert got["http://sub.example.co.uk/"] == "uk,co,example,sub)/"
    assert got["http://example.com"] == "com,example)/"


def test_cdx_lookup_hits_and_misses(spark):
    frontier = spark.createDataFrame(
        [("http://www.a.com/p",), ("http://b.com/q",)], ["url"]
    )
    idx = spark.createDataFrame([("com,a)/p", 7)], ["surt_key", "segment"])
    got = {r["url"]: r["segment"] for r in cdx_lookup(frontier, idx).collect()}
    assert got["http://www.a.com/p"] == 7  # www-variant finds the archive copy
    assert got["http://b.com/q"] is None  # miss -> 404 path


SITEMAP_XML = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url><loc>http://a.com/1</loc><lastmod>2024-01-01</lastmod></url>
  <url><loc> http://a.com/2 </loc></url>
</urlset>"""

SITEMAP_INDEX = """<?xml version="1.0"?>
<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <sitemap><loc>http://a.com/sub.xml</loc></sitemap>
</sitemapindex>"""


def test_parse_sitemap_xml_body_variants():
    assert parse_sitemap_xml_body(SITEMAP_XML) == ["http://a.com/1", "http://a.com/2"]
    # nested index: logged-not-followed (ParseSiteMapFunction.java:38-44)
    assert parse_sitemap_xml_body(SITEMAP_INDEX) == []
    # plain-text sitemap
    assert parse_sitemap_xml_body("http://a.com/x\n# no\nhttp://a.com/y\n") == [
        "http://a.com/x", "http://a.com/y",
    ]
    assert parse_sitemap_xml_body("") == []
    assert parse_sitemap_xml_body("<broken<xml>") == []
