"""Tika-grade HTML parser slot (operators/parse.py::parse_pages_html).

Covers what the regex fast path cannot: entity decoding, unquoted /
single-quoted / case-varying attributes, script+style exclusion,
<base href> + relative link resolution, per-anchor text and rel
attributes, meta-robots nofollow (SimpleLinkExtractor.java:34-51),
and the outlink cap (ParseFunction.java:104-126).
"""

from __future__ import annotations

from flink_crawler_spark.operators.parse import _parse_html_doc, parse_pages_html

PAGE = """<!DOCTYPE html>
<HTML><head>
  <TITLE>Caf&eacute; &amp; Bar</TITLE>
  <base href="http://ex.com/sub/">
  <script>var x = "<a href='http://nope.com/'>";</script>
  <style>.a { content: "ignored"; }</style>
</head>
<body>
  Hello <b>world</b>!
  <a href="page2.html">Next page</a>
  <a href='http://other.com/x?a=1&amp;b=2' rel="nofollow">Other</a>
  <A HREF="/root.html">Root</A>
  <a href="#frag">frag only</a>
  <a href="javascript:void(0)">js</a>
  <a href="mailto:x@y.z">mail</a>
  <a href="page2.html">dup</a>
</body></html>"""


def test_html_parser_fidelity():
    d = _parse_html_doc("http://ex.com/sub/page1.html", PAGE, 50)
    # entities decode in title and text; script/style never leak
    assert d["title"] == "Café & Bar"
    assert "Hello world !" in d["parsed_text"] or "Hello world" in d["parsed_text"]
    assert "nope.com" not in d["parsed_text"]
    assert "ignored" not in d["parsed_text"]
    # base-href relative resolution, root-relative, entity in query, dedup,
    # skip fragment/js/mailto
    assert d["outlinks"] == [
        "http://ex.com/sub/page2.html",
        "http://other.com/x?a=1&b=2",
        "http://ex.com/root.html",
    ]
    # anchor text + rel attributes survive (ExtractedUrl fields)
    by_url = {u: (a, r) for u, a, r in d["outlink_details"]}
    assert by_url["http://ex.com/sub/page2.html"] == ("Next page", "")
    assert by_url["http://other.com/x?a=1&b=2"] == ("Other", "nofollow")


def test_html_parser_meta_nofollow_and_cap():
    many = "".join(f'<a href="/l{i}">x</a>' for i in range(80))
    d = _parse_html_doc("http://ex.com/", f"<html><body>{many}</body></html>", 50)
    assert len(d["outlinks"]) == 50  # cap (SimpleLinkExtractor.java:13)

    nf = '<html><head><meta name="ROBOTS" content="NOINDEX, NOFOLLOW"></head>' + many
    d2 = _parse_html_doc("http://ex.com/", nf, 50)
    assert d2["outlinks"] == []


def test_parse_pages_html_dataframe(spark):
    rows = [
        (
            "http://ex.com/sub/page1.html",
            "ex.com",
            "FETCHED",
            PAGE.encode(),
            1000,
        ),
        ("http://ex.com/miss", "ex.com", "HTTP_NOT_FOUND", None, 1000),
    ]
    df = spark.createDataFrame(
        rows, "url string, pld string, status string, content binary, status_time long"
    )
    got = parse_pages_html(df).collect()
    assert len(got) == 1  # non-FETCHED short-circuits before parse
    r = got[0]
    assert r["title"] == "Café & Bar"
    assert r["n_outlinks"] == 3
    assert r["outlinks"][0] == "http://ex.com/sub/page2.html"
    assert r["score"] == 1.0
    assert r["outlink_details"][1]["rel"] == "nofollow"


def test_crawl_loop_with_tree_parser(spark):
    """The BasePageParser slot: the tree parser drops into the crawl loop
    and reaches the same pages as the regex fast path."""
    from flink_crawler_spark.plans.crawl_loop import CrawlConfig, crawl
    from flink_crawler_spark.sources.fixtures import render_pages, web_graph_from_adjacency

    adjacency = {
        "http://d1.com/": ["http://d1.com/a", "http://d2.com/"],
        "http://d1.com/a": ["http://d2.com/deep"],
        "http://d2.com/": [],
        "http://d2.com/deep": [],
    }
    pages = render_pages(web_graph_from_adjacency(spark, adjacency)).localCheckpoint(eager=True)
    seeds = spark.createDataFrame([("http://d1.com/", 1.0)], ["url", "score"])
    cfg = CrawlConfig(max_ticks=6, force_crawl_delay_ms=0, parser="tree", trace=False)
    res = crawl(spark, seeds, pages=pages, config=cfg)
    status = {r["url"]: r["status"] for r in res.crawl_state.collect()}
    assert status == {
        "http://d1.com/": "FETCHED",
        "http://d1.com/a": "FETCHED",
        "http://d2.com/": "FETCHED",
        "http://d2.com/deep": "FETCHED",
    }


def test_relative_base_href_resolves_against_page_url():
    """A relative <base href> must itself resolve against the page URL
    before links resolve against it (review finding: such links were
    silently dropped)."""
    html = ('<html><head><base href="/b/"></head>'
            '<body><a href="x.html">X</a><a href="../up.html">U</a></body></html>')
    d = _parse_html_doc("http://ex.com/a/page.html", html, 50)
    assert d["outlinks"] == ["http://ex.com/b/x.html", "http://ex.com/up.html"]
