"""Charset-aware decode + page-language priority.

Reference parity: ``fc/parser/TikaCallable.java`` — Tika handles any
page charset (BOM/header/meta/sniff) and resolves language as HTTP
header -> <meta http-equiv> -> profiler (lines 241-269). Before this
wave, the fast parse path crashed with MALFORMED_CHARACTER_CODING on
the first non-UTF-8 page.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_crawler_spark.functions.charset import (
    decode_bytes,
    detect_charset,
)
from flink_crawler_spark.operators.parse import (
    _parse_one_doc,
    parse_pages,
    parse_pages_html,
)

EN_TEXT = "the cat and the dog were in the house with a friend of mine"
FR_TEXT = "le chat et le chien sont dans la maison avec un ami"


def page_df(spark, content: bytes, content_type: str, lang_header: str | None = None):
    hdr = {"content-type": [content_type]}
    if lang_header:
        hdr["content-language"] = [lang_header]
    return spark.createDataFrame(
        [("http://cs.example.com/p", "example.com", "FETCHED", 0, hdr, content, content_type)],
        "url string, pld string, status string, status_time long, "
        "headers map<string,array<string>>, content binary, content_type string",
    )


# ----------------------------------------------------------------------
# detect_charset / decode_bytes (pure Python, no Spark)
# ----------------------------------------------------------------------


def test_detect_charset_priority():
    # BOM beats header beats meta beats sniff
    assert detect_charset(b"\xef\xbb\xbfhi", "text/html; charset=shift_jis") == "utf-8-sig"
    assert detect_charset(b"caf\xe9", "text/html; charset=ISO-8859-1") == "iso8859-1"
    sjis = "日本語".encode("shift_jis")
    assert detect_charset(sjis, "text/html; charset=Shift_JIS") == "shift_jis"
    meta = b'<html><head><meta charset="shift_jis"></head>' + sjis
    assert detect_charset(meta, "text/html") == "shift_jis"
    # undeclared: valid utf-8 -> utf-8, else latin-1
    assert detect_charset("héllo".encode(), None) == "utf-8"
    assert detect_charset(b"caf\xe9", None) == "iso8859-1"
    # unknown declared charset falls through to the sniff
    assert detect_charset(b"abc", "text/html; charset=x-bogus-9") == "utf-8"


def test_decode_bytes_roundtrips():
    assert decode_bytes("héllo".encode()) == "héllo"
    assert decode_bytes(b"caf\xe9", "text/html; charset=latin-1") == "café"
    assert decode_bytes("日本語".encode("shift_jis"), "text/html; charset=shift_jis") == "日本語"
    assert decode_bytes("bom".encode("utf-8-sig")) == "bom"          # BOM stripped
    assert decode_bytes("utf16".encode("utf-16")) == "utf16"         # BOM-ed utf-16
    assert decode_bytes(b"ok \xff then", None) == "ok ÿ then"        # never raises


# ----------------------------------------------------------------------
# JVM fast path (parse_pages)
# ----------------------------------------------------------------------


def fast_parse_one(spark, content, content_type, lang_header=None):
    rows = parse_pages(page_df(spark, content, content_type, lang_header)).collect()
    assert len(rows) == 1
    return rows[0]


def test_fast_path_latin1_header(spark):
    html = '<html><head><title>café</title></head><body>déjà vu <a href="http://x.com/a">a</a></body></html>'
    r = fast_parse_one(spark, html.encode("iso8859-1"), "text/html; charset=ISO-8859-1")
    assert r.title == "café"
    assert "déjà vu" in r.parsed_text
    assert r.outlinks == ["http://x.com/a"]


def test_fast_path_latin1_sniffed_without_header(spark):
    html = "<html><body>déjà vu</body></html>"
    r = fast_parse_one(spark, html.encode("iso8859-1"), "text/html")
    assert "déjà vu" in r.parsed_text


def test_fast_path_meta_charset(spark):
    html = '<html><head><meta charset="ISO-8859-1"><title>café</title></head><body>x</body></html>'
    r = fast_parse_one(spark, html.encode("iso8859-1"), "text/html")
    assert r.title == "café"


def test_fast_path_utf16_bom(spark):
    html = "<html><head><title>wide</title></head><body>sixteen</body></html>"
    r = fast_parse_one(spark, html.encode("utf-16"), "text/html")  # BOM-ed
    assert r.title == "wide"
    assert "sixteen" in r.parsed_text


def test_fast_path_utf8_bom_stripped(spark):
    html = "<html><head><title>t</title></head><body>b</body></html>"
    r = fast_parse_one(spark, html.encode("utf-8-sig"), "text/html")
    assert r.title == "t"


def test_fast_path_never_crashes_on_garbage(spark):
    # declared utf-8 but malformed: old code raised MALFORMED_CHARACTER_CODING
    r = fast_parse_one(spark, b"<html><body>ok \xff\xfe\xfa bad</body></html>",
                       "text/html; charset=utf-8")
    assert "ok" in r.parsed_text


def test_fast_path_utf16_unpaired_surrogate_total(spark):
    """Spark 4 decode throws on an UNPAIRED surrogate even at even byte
    length (e.g. a max_content_size truncation splitting a pair), so the
    UTF-16 branch must validate surrogate pairing, not just evenness."""
    from flink_crawler_spark.functions.charset import decode_expr, utf16_valid_expr

    rows = [
        (b"\xff\xfe\x00\xd8a\x00",),          # LE BOM + lone high surrogate
        (b"\xfe\xff\xdc\x00\x00a",),          # BE BOM + lone LOW surrogate
        (b"\xff\xfe\x00\xd8\x00\xdc",),       # LE BOM + VALID pair (U+10000)
        ("wide".encode("utf-16"),),            # plain valid UTF-16
    ]
    df = spark.createDataFrame(rows, "content binary")
    got = df.select(
        decode_expr(F.col("content")).alias("text"),
        utf16_valid_expr(F.col("content"), big_endian=False).alias("le_ok"),
    ).collect()
    # rows 0/1 fall to the total ISO-8859-1 decode instead of crashing
    assert got[0].le_ok is False
    assert got[0].text == "ÿþ\x00Øa\x00"
    assert got[1].text == "þÿÜ\x00\x00a"
    # valid surrogate pair and plain UTF-16 still decode at fidelity
    assert got[2].le_ok is True
    assert got[2].text == "\U00010000"
    assert got[3].text == "wide"


# ----------------------------------------------------------------------
# language priority: header -> meta -> profiler
# ----------------------------------------------------------------------


def test_language_header_beats_profiler(spark):
    html = f"<html><body>{EN_TEXT}</body></html>"
    r = fast_parse_one(spark, html.encode(), "text/html", lang_header="fr-FR")
    assert r.language == "fr"  # header wins although the text profiles en


def test_language_meta_beats_profiler(spark):
    html = (
        '<html><head><meta http-equiv="Content-Language" content="de"></head>'
        f"<body>{EN_TEXT}</body></html>"
    )
    r = fast_parse_one(spark, html.encode(), "text/html")
    assert r.language == "de"


def test_language_profiler_fallback(spark):
    r = fast_parse_one(spark, f"<html><body>{FR_TEXT}</body></html>".encode(), "text/html")
    assert r.language == "fr"


def test_language_priority_tree_path(spark):
    html = f"<html><body>{EN_TEXT}</body></html>"
    rows = parse_pages_html(page_df(spark, html.encode(), "text/html", "fr")).collect()
    assert rows[0].language == "fr"
    rows = parse_pages_html(page_df(spark, html.encode(), "text/html")).collect()
    assert rows[0].language == "en"


# ----------------------------------------------------------------------
# tree + multiformat paths decode any Python codec
# ----------------------------------------------------------------------


def test_tree_path_shift_jis(spark):
    html = '<html><head><title>日本</title></head><body>こんにちは <a href="http://jp.example.com/x">x</a></body></html>'
    df = page_df(spark, html.encode("shift_jis"), "text/html; charset=Shift_JIS")
    r = parse_pages_html(df).collect()[0]
    assert r.title == "日本"
    assert "こんにちは" in r.parsed_text
    assert r.outlinks == ["http://jp.example.com/x"]


def test_multiformat_one_doc_charsets():
    title, text, links = _parse_one_doc(
        "http://x/", "<html><head><title>café</title></head><body>déjà</body></html>".encode("latin-1"),
        "text/html; charset=latin-1", 50,
    )
    assert title == "café" and "déjà" in text
    _, text, _ = _parse_one_doc(
        "http://x/", "プレーン テキスト".encode("shift_jis"), "text/plain; charset=shift_jis", 50
    )
    assert text == "プレーン テキスト"


# ----------------------------------------------------------------------
# E2E: a non-UTF-8 page inside a crawl tick parses and its outlink is
# discovered (previously the tick crashed)
# ----------------------------------------------------------------------


def test_e2e_crawl_over_latin1_page(spark):
    from flink_crawler_spark.plans.crawl_loop import CrawlConfig, crawl

    root = "http://latin.example.com/"
    leaf = "http://latin.example.com/leaf"
    html_root = (
        '<html><head><title>café root</title></head>'
        f'<body>déjà <a href="{leaf}">leaf</a></body></html>'
    )
    pages = spark.createDataFrame(
        [
            (root, 1.0, None, html_root.encode("iso8859-1"), "text/html; charset=ISO-8859-1"),
            (leaf, 1.0, "<html><body>leaf</body></html>", None, None),
        ],
        "page_url string, page_score double, html string, content binary, content_type string",
    ).withColumn(
        "content",
        F.coalesce(F.col("content"), F.encode(F.col("html"), "UTF-8")),
    ).withColumn(
        "content_type", F.coalesce(F.col("content_type"), F.lit("text/html"))
    )
    seeds = spark.createDataFrame([(root, 1.0)], ["url", "score"])
    res = crawl(spark, seeds, pages=pages, config=CrawlConfig(max_ticks=4))
    state = {r["url"]: r["status"] for r in res.crawl_state.collect()}
    assert state.get(root) == "FETCHED"
    assert state.get(leaf) == "FETCHED", "outlink inside the latin-1 page was not discovered"
