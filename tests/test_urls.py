"""Golden tests for the URL scalar layer.

Cases mirror the reference's test intent (semantics, not code):
``SimpleUrlNormalizerTest`` (ports, slashes, session ids, default pages,
encoding, IP hosts), ``SimpleUrlValidatorTest``, and PLD extraction per
``ValidUrlTest`` (reference files under
/root/reference/src/test/java/com/scaleunlimited/flinkcrawler/urls/).
"""

from __future__ import annotations

import pytest

from flink_crawler_spark.functions.urls import (
    extract_pld,
    is_valid_url,
    normalize_url,
)

# (input, expected) — normalize_url full-fidelity Python implementation
NORMALIZE_CASES = [
    # scheme defaulting + host lowercasing
    ("WWW.Example.COM", "http://www.example.com/"),
    ("example.com", "http://example.com/"),
    # default port removal
    ("http://example.com:80/page.html", "http://example.com/page.html"),
    ("https://example.com:443/", "https://example.com/"),
    ("http://example.com:8080/", "http://example.com:8080/"),
    # trailing host dot
    ("http://example.com./a", "http://example.com/a"),
    # fragment stays out of normalized url (urlsplit drops it)
    ("http://example.com/a#frag", "http://example.com/a"),
    # jsessionid path param
    (
        "http://example.com/x/y.html;jsessionid=ABC123?q=1",
        "http://example.com/x/y.html?q=1",
    ),
    # session query params
    ("http://example.com/p?PHPSESSID=abc&x=1", "http://example.com/p?x=1"),
    ("http://example.com/p?a=1&sessionid=zzz", "http://example.com/p?a=1"),
    # empty query parts collapse
    ("http://example.com/p?q=1&&z=2&", "http://example.com/p?q=1&z=2"),
    # default page removal
    ("http://example.com/index.html", "http://example.com/"),
    ("http://example.com/a/index.php?x=1", "http://example.com/a/?x=1"),
    # relative path resolution
    ("http://example.com/a/b/../c", "http://example.com/a/c"),
    # duplicate slashes collapse via path split
    ("http://example.com//a//b", "http://example.com/a/b"),
    # IP host unchanged
    ("http://192.168.0.1/x", "http://192.168.0.1/x"),
    # bare question mark dropped
    ("http://example.com/p?", "http://example.com/p"),
    # percent re-encoding round-trips
    ("http://example.com/a%20b", "http://example.com/a+b"),
]


@pytest.mark.parametrize("raw,expected", NORMALIZE_CASES)
def test_normalize_url(raw, expected):
    assert normalize_url(raw) == expected


def test_normalize_idempotent():
    for raw, expected in NORMALIZE_CASES:
        assert normalize_url(expected) == expected


VALID_CASES = [
    ("http://example.com/", True),
    ("https://example.com/a?b=1", True),
    ("ftp://example.com/", False),
    ("mailto:x@example.com", False),
    ("http:///path-without-host", False),
    ("http://ex ample.com/", False),
    ("not a url", False),
    ("", False),
]


@pytest.mark.parametrize("url,expected", VALID_CASES)
def test_is_valid_url(url, expected):
    assert is_valid_url(url) is expected


def test_invalid_suffix_blacklist():
    assert is_valid_url("http://example.com/movie.avi", ("avi", "mov")) is False
    assert is_valid_url("http://example.com/page.html", ("avi", "mov")) is True


PLD_CASES = [
    ("www.example.com", "example.com"),
    ("example.com", "example.com"),
    ("a.b.c.example.com", "example.com"),
    ("www.example.co.uk", "example.co.uk"),
    ("example.co.uk", "example.co.uk"),
    ("deep.sub.example.com.au", "example.com.au"),
    ("localhost", "localhost"),
    ("192.168.0.1", "192.168.0.1"),
    ("Example.COM.", "example.com"),
]


@pytest.mark.parametrize("host,expected", PLD_CASES)
def test_extract_pld(host, expected):
    assert extract_pld(host) == expected


def test_spark_exprs_agree_with_python(spark):
    """The native Column tier must agree with the Python tier on its
    supported subset (no percent re-encoding / relative paths)."""
    from pyspark.sql import functions as F

    from flink_crawler_spark.functions.urls import (
        is_valid_url_expr,
        normalize_url_lite_expr,
        pld_expr,
    )

    urls = [
        "HTTP://WWW.Example.COM:80/a/b",
        "example.com",
        "http://example.com/p?PHPSESSID=abc&x=1",
        "http://example.com/index.html",
        "http://sub.example.co.uk/x#frag",
        "ftp://example.com/",
    ]
    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    rows = df.select(
        "url",
        normalize_url_lite_expr(F.col("url")).alias("norm"),
        is_valid_url_expr(F.col("url")).alias("valid"),
        pld_expr(F.col("url")).alias("pld"),
    ).collect()
    by_url = {r["url"]: r for r in rows}

    assert by_url["HTTP://WWW.Example.COM:80/a/b"]["norm"] == "http://www.example.com/a/b"
    assert by_url["example.com"]["norm"] == "http://example.com/"
    assert by_url["http://example.com/p?PHPSESSID=abc&x=1"]["norm"] == "http://example.com/p?x=1"
    assert by_url["http://example.com/index.html"]["norm"] == "http://example.com/"
    assert by_url["http://sub.example.co.uk/x#frag"]["norm"] == "http://sub.example.co.uk/x"
    assert by_url["http://sub.example.co.uk/x#frag"]["pld"] == "example.co.uk"
    assert by_url["ftp://example.com/"]["valid"] is False
    assert by_url["http://example.com/index.html"]["valid"] is True
