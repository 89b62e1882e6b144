"""Multi-format parse dispatch + watchdog (U1 full parity).

Reference: parser/SimplePageParser.java:180-205 (AutoDetectParser under
a watchdog timeout), utils/ExceptionUtils.java:246-330 (failures and
timeouts -> ERROR_PARSING_ERROR).
"""

import time
import zlib

from flink_crawler_spark.operators.parse import (
    _extract_pdf_text,
    parse_pages_multiformat,
)


def _mini_pdf(text: str, *, compress: bool) -> bytes:
    stream = f"BT /F1 12 Tf 72 720 Td ({text}) Tj ET".encode()
    if compress:
        stream = zlib.compress(stream)
    return (
        b"%PDF-1.4\n1 0 obj << /Length "
        + str(len(stream)).encode()
        + (b" /Filter /FlateDecode" if compress else b"")
        + b" >>\nstream\n"
        + stream
        + b"\nendstream\nendobj\ntrailer\n%%EOF\n"
    )


def _fetch_rows(spark, rows):
    return spark.createDataFrame(
        [
            ("http://site.com/" + name, "site.com", "FETCHED", 1000, content, ctype)
            for name, content, ctype in rows
        ],
        "url string, pld string, status string, status_time long, "
        "content binary, content_type string",
    )


def test_dispatch_html_plain_pdf_xml_unsupported(spark):
    html = b'<html><head><title>T</title></head><body>hello <a href="http://x.com/a">link</a></body></html>'
    rows = _fetch_rows(
        spark,
        [
            ("h", html, "text/html"),
            ("t", b"plain  text\nhere", "text/plain; charset=utf-8"),
            ("p1", _mini_pdf("pdf raw words", compress=False), "application/pdf"),
            ("p2", _mini_pdf("pdf flate words", compress=True), "application/pdf"),
            ("x", b"<doc><a>xml body</a></doc>", "application/xml"),
            ("b", b"\x00\x01\x02", "application/octet-stream"),
        ],
    )
    got = {
        r["url"].rsplit("/", 1)[-1]: r
        for r in parse_pages_multiformat(rows).collect()
    }
    assert got["h"]["parse_status"] == "PARSED"
    assert got["h"]["title"] == "T"
    assert "hello" in got["h"]["parsed_text"]
    assert got["h"]["outlinks"] == ["http://x.com/a"]

    assert got["t"]["parse_status"] == "PARSED"
    assert got["t"]["parsed_text"] == "plain text here"

    assert got["p1"]["parsed_text"] == "pdf raw words"
    assert got["p2"]["parsed_text"] == "pdf flate words"

    assert got["x"]["parsed_text"] == "xml body"

    assert got["b"]["parse_status"] == "SKIPPED_UNSUPPORTED_TYPE"
    assert got["b"]["parsed_text"] == ""


def test_watchdog_timeout_yields_parsing_error(spark):
    def slow_parser(url, content):
        time.sleep(5.0)
        return "", "never", []

    def fine_parser(url, content):
        return "", "quick", []

    rows = _fetch_rows(
        spark,
        [
            ("slow", b"x", "application/x-slow"),
            ("fine", b"y", "application/x-fine"),
        ],
    ).coalesce(1)  # one worker: proves the pool recovers after a timeout
    out = parse_pages_multiformat(
        rows,
        timeout_s=0.5,
        extra_parsers={"application/x-slow": slow_parser, "application/x-fine": fine_parser},
    )
    got = {r["url"].rsplit("/", 1)[-1]: r for r in out.collect()}
    assert got["slow"]["parse_status"] == "ERROR_PARSING_ERROR"
    assert got["fine"]["parse_status"] == "PARSED"
    assert got["fine"]["parsed_text"] == "quick"


def test_parser_exception_yields_parsing_error(spark):
    def broken(url, content):
        raise ValueError("boom")

    rows = _fetch_rows(spark, [("z", b"x", "application/x-broken")])
    out = parse_pages_multiformat(rows, extra_parsers={"application/x-broken": broken})
    assert out.collect()[0]["parse_status"] == "ERROR_PARSING_ERROR"


def test_pdf_extractor_escapes_and_tj_arrays():
    pdf = _mini_pdf(r"a\(b\)c", compress=False)
    assert _extract_pdf_text(pdf) == "a(b)c"
    stream = b"BT [(one) -250 (two)] TJ ET"
    data = b"stream\n" + stream + b"\nendstream"
    assert _extract_pdf_text(data) == "one two"


def test_pdf_hex_strings_and_octal_escapes():
    # <hex> Tj and hex inside TJ arrays (ISO 32000-1 §7.3.4.3)
    data = b"stream\nBT <48656C6C6F> Tj [(a) -20 <776F726C64>] TJ ET\nendstream"
    assert _extract_pdf_text(data) == "Hello a world"
    # odd-length hex gets an implicit trailing 0 nibble
    data = b"stream\nBT <4> Tj ET\nendstream"
    assert _extract_pdf_text(data) == "@"
    # octal escapes + named escapes in literal strings
    data = rb"stream" + b"\nBT (\\101\\102 \\tC) Tj ET\nendstream"
    assert _extract_pdf_text(data) == "AB C"


def test_pdf_multiple_content_streams_per_page():
    s1 = b"BT (first) Tj ET"
    s2 = zlib.compress(b"BT (second part) Tj ET")
    data = (
        b"stream\n" + s1 + b"\nendstream\n"
        b"2 0 obj << /Filter /FlateDecode >>\nstream\n" + s2 + b"\nendstream"
    )
    assert _extract_pdf_text(data) == "first second part"


def test_pdf_quote_show_operators():
    data = b"stream\nBT (one) ' (two) \" ET\nendstream"
    assert _extract_pdf_text(data) == "one two"


RSS = b"""<?xml version="1.0"?><rss version="2.0"><channel>
<title>My Feed</title><link>http://ex.com/</link>
<item><title>First post</title><link>http://ex.com/1</link>
<description>Body <b>one</b></description></item>
<item><title>Second</title><link>http://ex.com/2</link></item>
</channel></rss>"""

ATOM = b"""<?xml version="1.0"?><feed xmlns="http://www.w3.org/2005/Atom">
<title>Atom Feed</title>
<entry><title>E1</title><link href="http://ex.com/a"/>
<summary>sum one</summary></entry>
<entry><title>E2</title><link rel="alternate" href="http://ex.com/b"/></entry>
</feed>"""

SMAP = b"""<?xml version="1.0"?><urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
<url><loc>http://ex.com/p1</loc></url>
<url><loc> http://ex.com/p2 </loc></url>
</urlset>"""


def test_rss_atom_sitemap_parse(spark):
    rows = _fetch_rows(
        spark,
        [
            ("r", RSS, "application/rss+xml"),
            ("a", ATOM, "application/atom+xml"),
            # served under the GENERIC xml type: root sniffing dispatches
            ("r2", RSS, "text/xml"),
            ("a2", ATOM, "application/xml"),
            ("s", SMAP, "application/xml"),
            ("x", b"<note><to>you</to><body>hi there</body></note>", "text/xml"),
        ],
    )
    out = {r["url"].rsplit("/", 1)[1]: r.asDict() for r in parse_pages_multiformat(rows).collect()}
    for k in ("r", "r2"):
        assert out[k]["parse_status"] == "PARSED"
        assert out[k]["title"] == "My Feed"
        assert out[k]["parsed_text"] == "First post Body one Second"
        assert out[k]["outlinks"] == ["http://ex.com/1", "http://ex.com/2"]
    for k in ("a", "a2"):
        assert out[k]["title"] == "Atom Feed"
        assert out[k]["parsed_text"] == "E1 sum one E2"
        assert out[k]["outlinks"] == ["http://ex.com/a", "http://ex.com/b"]
    assert out["s"]["title"] == ""
    assert out["s"]["parsed_text"] == ""
    assert out["s"]["outlinks"] == ["http://ex.com/p1", "http://ex.com/p2"]
    # generic xml without a known root still strips tags
    assert out["x"]["parsed_text"] == "you hi there"
    assert out["x"]["outlinks"] == []


MD = b"""# My Project

Some *bold* intro with a [docs link](http://ex.com/docs) and
a [repo](http://ex.com/repo "title") reference.

```
code block gone
```

## Section
- item one
"""


def test_markdown_csv_json_parse(spark):
    rows = _fetch_rows(
        spark,
        [
            ("m", MD, "text/markdown"),
            ("c", b"name,qty\nwidget,3\ngadget,5\n", "text/csv"),
            (
                "j",
                b'{"title": "hello", "tags": ["a", "b"], '
                b'"url": "http://ex.com/j", "n": 7}',
                "application/json",
            ),
        ],
    )
    out = {r["url"].rsplit("/", 1)[1]: r.asDict() for r in parse_pages_multiformat(rows).collect()}
    m = out["m"]
    assert m["parse_status"] == "PARSED"
    assert m["title"] == "My Project"
    assert m["outlinks"] == ["http://ex.com/docs", "http://ex.com/repo"]
    assert "code block gone" not in m["parsed_text"]
    assert "docs link" in m["parsed_text"] and "bold" in m["parsed_text"]
    c = out["c"]
    assert c["title"] == "name qty"
    assert c["parsed_text"] == "widget 3 gadget 5"
    j = out["j"]
    assert j["parsed_text"] == "hello a b"
    assert j["outlinks"] == ["http://ex.com/j"]
    # malformed JSON -> parse error status, not a crash
    bad = _fetch_rows(spark, [("b", b"{nope", "application/json")])
    assert parse_pages_multiformat(bad).collect()[0]["parse_status"] == "ERROR_PARSING_ERROR"


# ---------------------------------------------------------------------------
# r7: binary office formats (OOXML docx / ODF odt) — the Tika office tier
# the r6 verdict flagged as absent (SimplePageParser routes these through
# AutoDetectParser). Containers built with stdlib zipfile, like real files.
# ---------------------------------------------------------------------------

DOCX_CT = "application/vnd.openxmlformats-officedocument.wordprocessingml.document"
ODT_CT = "application/vnd.oasis.opendocument.text"


def _make_docx(title, paragraphs, links=()):
    import io
    import zipfile

    buf = io.BytesIO()
    body = "".join(
        f"<w:p><w:r><w:t>{p}</w:t></w:r></w:p>" for p in paragraphs
    )
    rels = "".join(
        f'<Relationship Id="rId{i}" Type="http://schemas.openxmlformats.org/'
        f'officeDocument/2006/relationships/hyperlink" Target="{u}" '
        f'TargetMode="External"/>'
        for i, u in enumerate(links, start=10)
    )
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr(
            "word/document.xml",
            f'<?xml version="1.0"?><w:document xmlns:w="x"><w:body>{body}</w:body></w:document>',
        )
        z.writestr(
            "docProps/core.xml",
            f'<?xml version="1.0"?><cp:coreProperties xmlns:dc="d"><dc:title>{title}</dc:title></cp:coreProperties>',
        )
        z.writestr(
            "word/_rels/document.xml.rels",
            f'<?xml version="1.0"?><Relationships>{rels}</Relationships>',
        )
    return buf.getvalue()


def _make_odt(title, paragraphs, links=()):
    import io
    import zipfile

    buf = io.BytesIO()
    anchors = "".join(
        f'<text:a xlink:type="simple" xlink:href="{u}">link</text:a>' for u in links
    )
    body = (
        "".join(f"<text:p>{p}</text:p>" for p in paragraphs)
        + f"<text:p>{anchors}</text:p>"
    )
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr(
            "content.xml",
            f'<?xml version="1.0"?><office:document-content>{body}</office:document-content>',
        )
        z.writestr(
            "meta.xml",
            f'<?xml version="1.0"?><office:document-meta><dc:title>{title}</dc:title></office:document-meta>',
        )
    return buf.getvalue()


def test_docx_odt_runs_concatenate_without_separator():
    """Word splits runs MID-WORD at rsid/formatting boundaries and ODT
    wraps spans inline: run/span boundaries must NOT become spaces
    (r7 review finding), while paragraph ends and tabs must."""
    import io
    import zipfile

    from flink_crawler_spark.operators.parse import _parse_docx_doc, _parse_odt_doc

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr(
            "word/document.xml",
            '<w:document><w:body>'
            "<w:p><w:r><w:t>Hel</w:t></w:r><w:r><w:t>lo</w:t></w:r></w:p>"
            "<w:p><w:r><w:t>A</w:t></w:r><w:tab/><w:r><w:t>B</w:t></w:r></w:p>"
            "</w:body></w:document>",
        )
    _, text, _ = _parse_docx_doc(buf.getvalue())
    assert text == "Hello A B"

    buf2 = io.BytesIO()
    with zipfile.ZipFile(buf2, "w") as z:
        z.writestr(
            "content.xml",
            "<office:document-content>"
            "<text:p>Hel<text:span>lo</text:span></text:p>"
            "<text:p>A<text:tab/>B</text:p>"
            "</office:document-content>",
        )
    _, text2, _ = _parse_odt_doc(buf2.getvalue())
    assert text2 == "Hello A B"


def test_docx_odt_parse(spark):
    docx = _make_docx(
        "Quarterly &amp; Report", ["Hello docx", "Second para"],
        ["http://ext.example.com/a", "http://ext.example.com/b"],
    )
    odt = _make_odt(
        "ODT &amp; Title", ["Hello odt body"], ["http://ext.example.com/c"]
    )
    rows = _fetch_rows(
        spark,
        [
            ("doc.docx", docx, DOCX_CT),
            ("doc.odt", odt, ODT_CT),
            ("broken.docx", b"PK\x03\x04not-a-zip", DOCX_CT),
        ],
    )
    out = {
        r["url"].rsplit("/", 1)[1]: r.asDict()
        for r in parse_pages_multiformat(rows).collect()
    }
    d = out["doc.docx"]
    assert d["parse_status"] == "PARSED"
    assert d["title"] == "Quarterly & Report"
    assert d["parsed_text"] == "Hello docx Second para"
    assert d["outlinks"] == ["http://ext.example.com/a", "http://ext.example.com/b"]
    o = out["doc.odt"]
    assert o["parse_status"] == "PARSED"
    assert o["title"] == "ODT & Title"
    assert o["parsed_text"] == "Hello odt body link"
    assert o["outlinks"] == ["http://ext.example.com/c"]
    # malformed container -> parsing error, never a crashed stage
    assert out["broken.docx"]["parse_status"] == "ERROR_PARSING_ERROR"


XLSX_CT = "application/vnd.openxmlformats-officedocument.spreadsheetml.sheet"
PPTX_CT = "application/vnd.openxmlformats-officedocument.presentationml.presentation"


def _make_xlsx(title, strings, numbers=(), links=()):
    import io
    import zipfile

    buf = io.BytesIO()
    sis = "".join(f"<si><t>{s}</t></si>" for s in strings)
    cells = "".join(
        f'<c r="A{i}" t="s"><v>{i - 1}</v></c>' for i in range(1, len(strings) + 1)
    ) + "".join(f'<c r="B{i}"><v>{n}</v></c>' for i, n in enumerate(numbers, start=1))
    rels = "".join(
        f'<Relationship Id="rId{i}" Target="{u}" TargetMode="External"/>'
        for i, u in enumerate(links, start=1)
    )
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("xl/sharedStrings.xml", f"<sst>{sis}</sst>")
        z.writestr("xl/worksheets/sheet1.xml", f"<worksheet><row>{cells}</row></worksheet>")
        z.writestr("xl/worksheets/_rels/sheet1.xml.rels", f"<Relationships>{rels}</Relationships>")
        z.writestr("docProps/core.xml", f"<cp:coreProperties><dc:title>{title}</dc:title></cp:coreProperties>")
    return buf.getvalue()


def _make_pptx(title, slides, links=()):
    """slides: list of lists of paragraphs; paragraph = list of runs."""
    import io
    import zipfile

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        for i, paras in enumerate(slides, start=1):
            body = "".join(
                "<a:p>" + "".join(f"<a:t>{r}</a:t>" for r in para) + "</a:p>"
                for para in paras
            )
            z.writestr(f"ppt/slides/slide{i}.xml", f"<p:sld>{body}</p:sld>")
        rels = "".join(
            f'<Relationship Id="rId{j}" Target="{u}" TargetMode="External"/>'
            for j, u in enumerate(links, start=1)
        )
        z.writestr("ppt/slides/_rels/slide1.xml.rels", f"<Relationships>{rels}</Relationships>")
        z.writestr("docProps/core.xml", f"<cp:coreProperties><dc:title>{title}</dc:title></cp:coreProperties>")
    return buf.getvalue()


def test_xlsx_pptx_parse(spark):
    xlsx = _make_xlsx(
        "Budget", ["Revenue", "Cost"], numbers=("12.5", "7"),
        links=["http://ext.example.com/x"],
    )
    # slide 1: a run-split word; slide 2: two paragraphs
    pptx = _make_pptx(
        "Deck", [[["Hel", "lo"]], [["First"], ["Second"]]],
        links=["http://ext.example.com/p"],
    )
    rows = _fetch_rows(
        spark, [("t.xlsx", xlsx, XLSX_CT), ("t.pptx", pptx, PPTX_CT)]
    )
    out = {
        r["url"].rsplit("/", 1)[1]: r.asDict()
        for r in parse_pages_multiformat(rows).collect()
    }
    x = out["t.xlsx"]
    assert x["parse_status"] == "PARSED"
    assert x["title"] == "Budget"
    assert x["parsed_text"] == "Revenue Cost 12.5 7"
    assert x["outlinks"] == ["http://ext.example.com/x"]
    p = out["t.pptx"]
    assert p["parse_status"] == "PARSED"
    assert p["title"] == "Deck"
    assert p["parsed_text"] == "Hello First Second"  # run-tight, paragraph-spaced
    assert p["outlinks"] == ["http://ext.example.com/p"]


def test_ods_odp_share_the_odf_text_model(spark):
    ods = _make_odt("Sheet", ["cell one", "cell two"])
    rows = _fetch_rows(
        spark,
        [
            ("t.ods", ods, "application/vnd.oasis.opendocument.spreadsheet"),
            ("t.odp", ods, "application/vnd.oasis.opendocument.presentation"),
        ],
    )
    out = {
        r["url"].rsplit("/", 1)[1]: r.asDict()
        for r in parse_pages_multiformat(rows).collect()
    }
    for k in ("t.ods", "t.odp"):
        assert out[k]["parse_status"] == "PARSED"
        assert out[k]["parsed_text"] == "cell one cell two"
