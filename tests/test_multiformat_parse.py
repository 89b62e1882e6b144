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
