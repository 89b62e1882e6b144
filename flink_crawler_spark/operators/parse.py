"""Parse stage: text/title/outlink extraction from fetched pages.

Reference: ``functions/ParseFunction.java:22-128`` (+
``parser/SimplePageParser.java``, ``parser/TikaCallable.java``,
``parser/SimpleLinkExtractor.java``) — per fetched page: extract text,
title, language, outlinks (``<a href>`` only, honoring ``<meta
name=robots content=nofollow>``), score the page (pluggable
BasePageScorer, default all-1.0), score each outlink page_score/n,
sort outlinks by score and cap at maxOutlinksPerPage; 4 outputs
(parsed, status, outlinks, domain score).

Spark-first: HTML-lite extraction is pure regexp (JVM codegen, no UDF);
the four side outputs are four ``select``s off one cached parsed frame.
A Tika-grade parser would slot in as a mapInPandas over the same
schema — the plumbing (not the parser) is what the engine defines.

Page scorers (``focused/BasePageScorer.java:10-19``):
  * all_equal_scorer  — constant 1.0 (``focused/AllEqualPageScorer.java``)
  * title_scorer      — reads the score back from the rendered title, the
    fixture trick the reference's focused-crawl test uses.
"""

from __future__ import annotations

from collections.abc import Callable
from functools import lru_cache

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MAX_OUTLINKS_PER_PAGE = 50  # parser/SimpleLinkExtractor.java:13

HREF_RE = r'<a\s[^>]*href="([^"]*)"'
TITLE_RE = r"<title>(.*?)</title>"
NOFOLLOW_RE = r'<meta\s+name="?robots"?\s+content="?[^">]*nofollow'
TAG_RE = r"<[^>]+>"

PageScorer = Callable[[], Column]


def all_equal_scorer() -> Column:
    return F.lit(1.0)


def title_scorer() -> Column:
    """Read the score from the page title (fixture pages encode it)."""
    title = F.regexp_extract(F.col("__text"), TITLE_RE, 1)
    return F.coalesce(
        F.regexp_extract(title, r"score=([0-9.eE+-]+)", 1).cast("double"), F.lit(1.0)
    )


def parse_pages(
    fetch_results: DataFrame,
    *,
    scorer: PageScorer = all_equal_scorer,
    max_outlinks: int = MAX_OUTLINKS_PER_PAGE,
) -> DataFrame:
    """Parse FETCHED pages into one wide row each.

    Output columns: url, pld, title, parsed_text, language, score,
    outlinks (array<string>, nofollow-aware, capped), n_outlinks.

    Only FETCHED rows with content parse (ParseFunction.java:61-65 —
    non-FETCHED short-circuits *before* the expensive stage).
    """
    from ..functions.charset import decode_expr, page_language_expr

    ctype = (
        F.col("content_type") if "content_type" in fetch_results.columns else None
    )
    fetched = fetch_results.filter(
        (F.col("status") == "FETCHED") & F.col("content").isNotNull()
    ).withColumn(
        # charset-aware decode (BOM -> header -> meta -> sniff); the old
        # F.decode(content, 'UTF-8') crashed the stage on the first
        # non-UTF-8 page (MALFORMED_CHARACTER_CODING)
        "__text",
        decode_expr(F.col("content"), ctype),
    )

    title = F.regexp_extract(F.col("__text"), TITLE_RE, 1)
    nofollow = F.col("__text").rlike(NOFOLLOW_RE)
    raw_links = F.regexp_extract_all(F.col("__text"), F.lit(HREF_RE), F.lit(1))
    outlinks = F.when(nofollow, F.array().cast("array<string>")).otherwise(
        F.slice(F.array_distinct(raw_links), 1, max_outlinks)
    )
    body_text = F.trim(
        F.regexp_replace(F.regexp_replace(F.col("__text"), TAG_RE, " "), r"\s+", " ")
    )

    headers = F.col("headers") if "headers" in fetch_results.columns else None
    return fetched.select(
        "url",
        "pld",
        title.alias("title"),
        body_text.alias("parsed_text"),
        # language priority: Content-Language header -> <meta http-equiv>
        # -> stopword profiler (TikaCallable.java:241-269)
        page_language_expr(body_text, html=F.col("__text"), headers=headers).alias(
            "language"
        ),
        scorer().alias("score"),
        outlinks.alias("outlinks"),
        F.size(outlinks).alias("n_outlinks"),
        F.col("status_time"),
    )


def parse_outlinks_slim(
    fetch_results: DataFrame,
    *,
    scorer: PageScorer = all_equal_scorer,
    max_outlinks: int = MAX_OUTLINKS_PER_PAGE,
) -> DataFrame:
    """Outlink-only parse projection for the crawl tick's hot path:
    builds ONLY the expressions the state merge consumes (href extract,
    nofollow gate, score). The full ``parse_pages`` tree carries the
    language profiler and body-text regexes, and even though Catalyst
    prunes them out of the executed tick plan, the driver still pays
    their analysis/optimization every tick — with ~6 ticks per crawl
    that is a measurable share of single-shot loop latency."""
    has_ctype = "content_type" in fetch_results.columns
    filter_col, text_col, out_cols = _slim_cols(has_ctype, scorer, max_outlinks)
    return fetch_results.filter(filter_col).withColumn("__text", text_col).select(*out_cols)


@lru_cache(maxsize=8)
def _slim_cols(
    has_ctype: bool, scorer: PageScorer, max_outlinks: int
) -> tuple[Column, Column, tuple[Column, ...]]:
    """Static Column trees of parse_outlinks_slim, built once per
    process (r12, guide §1.2): the crawl loop calls it every tick and
    the charset-sniffing decode_expr alone is ~100 py4j round-trips —
    measured ~0.17 s of pure plan construction per call. Unresolved
    Columns are immutable Catalyst trees, safe to reuse across plans."""
    from ..functions.charset import decode_expr

    ctype = F.col("content_type") if has_ctype else None
    filter_col = (F.col("status") == "FETCHED") & F.col("content").isNotNull()
    text_col = decode_expr(F.col("content"), ctype)
    nofollow = F.col("__text").rlike(NOFOLLOW_RE)
    raw_links = F.regexp_extract_all(F.col("__text"), F.lit(HREF_RE), F.lit(1))
    outlinks = F.when(nofollow, F.array().cast("array<string>")).otherwise(
        F.slice(F.array_distinct(raw_links), 1, max_outlinks)
    )
    out_cols = (
        F.col("url"),
        F.col("pld"),
        scorer().alias("score"),
        outlinks.alias("outlinks"),
        F.size(outlinks).alias("n_outlinks"),
    )
    return filter_col, text_col, out_cols


def parsed_output(parsed: DataFrame) -> DataFrame:
    """Main ParsedUrl output — only pages with score > 0
    (zero-score content gate, ParseFunction.java:92-96)."""
    return parsed.filter(F.col("score") > 0).select(
        "url", "pld", "parsed_text", "language", "title", "score"
    )


def outlink_output(parsed: DataFrame) -> DataFrame:
    """Outlink side output: score = page_score / n_outlinks
    (SimplePageParser.java:195-199), one row per link."""
    # per-tick call: one selectExpr round-trip instead of ~15 (r13, §1.2)
    return parsed.selectExpr(
        "url AS source_url",
        "explode(outlinks) AS url",
        "CAST(NULL AS STRING) AS anchor_text",
        "score / greatest(n_outlinks, 1) AS score",
    )


def domain_score_output(parsed: DataFrame) -> DataFrame:
    """DomainScore side output (ParseFunction.java:102)."""
    return parsed.select("pld", F.col("score").alias("score"))


def tsv_output(parsed: DataFrame) -> DataFrame:
    """url \\t text lines with tab/CR/LF squashed (CTB:441-453)."""
    return parsed.select(
        F.concat_ws(
            "\t", F.col("url"), F.regexp_replace(F.col("parsed_text"), "[\\t\\r\\n]", " ")
        ).alias("line")
    )


SITEMAP_XML_SCHEMA = "array<string>"


def parse_sitemap_xml_body(body: str) -> list[str]:
    """Parse one sitemap body: XML urlset (<loc> entries) or plain text
    (one URL per line). Nested sitemap indexes return [] — the reference
    logs and does not follow them (ParseSiteMapFunction.java:38-44)."""
    body = (body or "").strip()
    if not body:
        return []
    if body.startswith("<"):
        import re as _re
        import xml.etree.ElementTree as ET

        try:
            root = ET.fromstring(body)
        except ET.ParseError:
            return []
        tag = root.tag.rsplit("}", 1)[-1].lower()
        if tag == "sitemapindex":
            return []  # nested indexes logged-not-followed
        if tag != "urlset":
            return []
        out = []
        for el in root.iter():
            if el.tag.rsplit("}", 1)[-1].lower() == "loc" and el.text:
                out.append(el.text.strip())
        return out
    return [ln.strip() for ln in body.splitlines() if ln.strip().startswith("http")]


def parse_sitemap_bodies(sitemap_docs: DataFrame, *, body_col: str = "body") -> DataFrame:
    """Real sitemap parsing (ParseSiteMapFunction.java:15-56 semantics) as
    an Arrow-vectorized UDF over fetched sitemap bodies -> one
    ExtractedUrl row per <loc> entry, score 1.0."""

    @F.pandas_udf(SITEMAP_XML_SCHEMA)
    def parse_udf(bodies: pd.Series) -> pd.Series:
        return bodies.map(parse_sitemap_xml_body)

    return (
        sitemap_docs.withColumn("__entries", parse_udf(F.col(body_col)))
        .select(
            F.col("url").alias("sitemap_url"),
            F.explode("__entries").alias("url"),
            F.lit(1.0).alias("score"),
        )
    )


def parse_sitemaps(fetch_results: DataFrame, sitemap_entries: DataFrame) -> DataFrame:
    """Sitemap parse (ParseSiteMapFunction.java:15-56) as a join against
    the sitemap-entries table: FETCHED sitemap URLs yield their entries
    as ExtractedUrl rows (score 1.0)."""
    fetched = fetch_results.filter(F.col("status") == "FETCHED").select(F.col("url").alias("s_url"))
    return (
        fetched.join(sitemap_entries, fetched["s_url"] == sitemap_entries["sitemap_url"])
        .select(F.col("entry_url").alias("url"), F.lit(1.0).alias("score"))
        .distinct()
    )


def sitemap_fetch_status(
    sitemap_urls: DataFrame, sitemap_entries: DataFrame, *, now_ms: int
) -> DataFrame:
    """Fetch status for advertised sitemap URLs under table-backed
    fetching: a sitemap that resolves to at least one entry is FETCHED,
    one with no entries is HTTP_NOT_FOUND — the mock-web analogue of the
    sitemap fetcher's success/failure split."""
    hit = (
        sitemap_entries.select(F.col("sitemap_url").alias("url")).distinct()
        .withColumn("__hit", F.lit(True))
    )
    from ..functions.urls import pld_expr

    return (
        sitemap_urls.select("url").distinct()
        .join(hit, "url", "left")
        .select(
            "url",
            pld_expr(F.col("url")).alias("pld"),
            F.when(F.col("__hit"), "FETCHED").otherwise("HTTP_NOT_FOUND").alias("status"),
            F.lit(now_ms).alias("status_time"),
        )
    )


def failed_sitemaps(sitemap_statuses: DataFrame) -> DataFrame:
    """F4 HandleFailedSiteMapFunction
    (``functions/HandleFailedSiteMapFunction.java:21-30``): the reference
    passes every sitemap CrawlStateUrl through unchanged and LOGS the
    non-FETCHED ones. Spark-first, the log is a side OUTPUT — the failed
    rows as their own frame (callers keep using the input for the
    pass-through half), which the crawl loop records into its URL trace
    exactly like the reference's UrlLogger."""
    return sitemap_statuses.filter(F.col("status") != "FETCHED")


# ---------------------------------------------------------------------------
# Tika-grade HTML parser slot (BasePageParser extension point,
# parser/BasePageParser.java:20-48) — a real tree parser where the
# regex path above is the codegen'd fast path.
# ---------------------------------------------------------------------------

def _parse_html_doc(page_url: str, html: str, max_outlinks: int) -> dict:
    """Parse one HTML document with the stdlib tree parser.

    Beyond the regex path: entity decoding, quote/case-insensitive
    attributes, script/style exclusion from text, <base href> + relative
    URL resolution (urljoin), per-anchor text + rel attributes
    (ExtractedUrl._anchorText/_relAttributes), meta-robots nofollow
    (SimpleLinkExtractor.java:34-51).
    """
    from html.parser import HTMLParser
    from urllib.parse import urljoin

    class Extractor(HTMLParser):
        def __init__(self):
            super().__init__(convert_charrefs=True)
            self.title_parts: list[str] = []
            self.text_parts: list[str] = []
            self.links: list[tuple[str, str, str]] = []  # href, anchor, rel
            self.base: str | None = None
            self.nofollow = False
            self._in_title = False
            self._skip_depth = 0
            self._anchor: list | None = None  # [href, rel, text_parts]

        def handle_starttag(self, tag, attrs):
            a = dict(attrs)
            if tag in ("script", "style"):
                self._skip_depth += 1
            elif tag == "title":
                self._in_title = True
            elif tag == "base" and a.get("href") and self.base is None:
                self.base = a["href"]
            elif tag == "meta":
                if (a.get("name") or "").lower() == "robots" and "nofollow" in (
                    a.get("content") or ""
                ).lower():
                    self.nofollow = True
            elif tag == "a":
                if self._anchor is not None:
                    self._flush_anchor()
                self._anchor = [a.get("href"), a.get("rel") or "", []]

        def handle_endtag(self, tag):
            if tag in ("script", "style") and self._skip_depth:
                self._skip_depth -= 1
            elif tag == "title":
                self._in_title = False
            elif tag == "a":
                self._flush_anchor()

        def _flush_anchor(self):
            if self._anchor is not None:
                href, rel, parts = self._anchor
                if href:
                    self.links.append((href, " ".join(parts).strip(), rel))
                self._anchor = None

        def handle_data(self, data):
            if self._skip_depth:
                return
            if self._in_title:
                self.title_parts.append(data)
            else:
                if data.strip():
                    self.text_parts.append(data)
                    if self._anchor is not None:
                        self._anchor[2].append(data.strip())

    ex = Extractor()
    try:
        ex.feed(html)
        ex.close()
    except Exception:
        pass
    ex._flush_anchor()

    # a relative <base href> resolves against the page URL itself first
    base = urljoin(page_url, ex.base) if ex.base else page_url
    seen: set[str] = set()
    out_urls: list[str] = []
    details: list[tuple[str, str, str]] = []
    if not ex.nofollow:
        for href, anchor, rel in ex.links:
            h = href.strip()
            low = h.lower()
            if not h or low.startswith(("javascript:", "mailto:", "#", "data:")):
                continue
            resolved = urljoin(base, h.split("#", 1)[0])
            if not resolved.lower().startswith(("http://", "https://")):
                continue
            if resolved in seen:
                continue
            seen.add(resolved)
            out_urls.append(resolved)
            details.append((resolved, anchor, rel))
            if len(out_urls) >= max_outlinks:
                break
    return {
        "title": " ".join("".join(ex.title_parts).split()),
        "parsed_text": " ".join(" ".join(ex.text_parts).split()),
        "outlinks": out_urls,
        "outlink_details": details,
    }


def parse_pages_html(
    fetch_results: DataFrame,
    *,
    scorer: PageScorer = all_equal_scorer,
    max_outlinks: int = MAX_OUTLINKS_PER_PAGE,
) -> DataFrame:
    """Drop-in alternative to ``parse_pages`` backed by a real HTML tree
    parser (Arrow-batched mapInPandas). Same output schema plus
    ``outlink_details`` (url, anchor_text, rel) — the ExtractedUrl
    fields the regex path cannot carry. Language id and scoring stay
    JVM-side over the extracted text, identical to the fast path.
    """
    from ..functions.charset import decode_bytes, header_lang_expr, page_language_expr

    ctype = (
        F.col("content_type")
        if "content_type" in fetch_results.columns
        else F.lit(None).cast("string")
    )
    # header language resolves JVM-side BEFORE the pandas stage and rides
    # through it as a scalar column (the headers map itself need not cross
    # the Arrow boundary)
    hlang = (
        header_lang_expr(F.col("headers"))
        if "headers" in fetch_results.columns
        else F.lit(None).cast("string")
    )
    fetched = fetch_results.filter(
        (F.col("status") == "FETCHED") & F.col("content").isNotNull()
    ).select(
        "url",
        "pld",
        "content",
        ctype.alias("content_type"),
        hlang.alias("header_lang"),
        "status_time",
    )

    out_schema = (
        "url string, pld string, status_time long, header_lang string, "
        "__text string, title string, "
        "parsed_text string, outlinks array<string>, "
        "outlink_details array<struct<url:string,anchor_text:string,rel:string>>"
    )

    def run(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                html = (
                    decode_bytes(bytes(r.content), r.content_type)
                    if isinstance(r.content, (bytes, bytearray, memoryview))
                    else str(r.content)
                )
                d = _parse_html_doc(r.url, html, max_outlinks)
                rows.append(
                    {
                        "url": r.url,
                        "pld": r.pld,
                        "status_time": r.status_time,
                        "header_lang": r.header_lang,
                        "__text": html,
                        "title": d["title"],
                        "parsed_text": d["parsed_text"],
                        "outlinks": d["outlinks"],
                        "outlink_details": d["outlink_details"],
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "url", "pld", "status_time", "header_lang", "__text", "title",
                    "parsed_text", "outlinks", "outlink_details",
                ],
            )

    parsed = fetched.mapInPandas(run, out_schema)

    return parsed.select(
        "url",
        "pld",
        "title",
        "parsed_text",
        # header -> meta -> profiler (TikaCallable.java:241-269); header
        # lang was resolved pre-stage, meta comes from the decoded html
        F.coalesce(
            F.col("header_lang"),
            page_language_expr(F.col("parsed_text"), html=F.col("__text")),
        ).alias("language"),
        scorer().alias("score"),
        "outlinks",
        F.size("outlinks").alias("n_outlinks"),
        "status_time",
        "outlink_details",
    )


# ----------------------------------------------------------------------
# Multi-format parse dispatch (U1 full parity).
# Reference: parser/SimplePageParser.java:180-205 — Tika AutoDetectParser
# under a watchdog thread with a per-document timeout; parse failures and
# timeouts map to ERROR_PARSING_ERROR (utils/ExceptionUtils.java status
# mapping). Here: dispatch on content_type to per-format extractors, each
# document parsed inside a concurrent.futures worker with
# future.result(timeout) as the watchdog (the thread is abandoned on
# timeout, exactly the reference's watchdog semantics).
# ----------------------------------------------------------------------

PARSE_TIMEOUT_S = 30.0  # SimplePageParser DEFAULT_MAX_PARSE_DURATION analogue


def _pdf_unescape(b: bytes) -> bytes:
    """PDF literal-string unescape: \\n \\r \\t \\b \\f \\( \\) \\\\ and
    1-3 digit octal codes (ISO 32000-1 §7.3.4.2)."""
    simple = {
        0x6E: b"\n", 0x72: b"\r", 0x74: b"\t", 0x62: b"\b",
        0x66: b"\f", 0x28: b"(", 0x29: b")", 0x5C: b"\\",
    }
    out = bytearray()
    i, n = 0, len(b)
    while i < n:
        c = b[i]
        if c == 0x5C and i + 1 < n:
            nxt = b[i + 1]
            if nxt in simple:
                out += simple[nxt]
                i += 2
                continue
            if 0x30 <= nxt <= 0x37:  # up to 3 octal digits
                j = i + 1
                oct_digits = []
                while j < n and len(oct_digits) < 3 and 0x30 <= b[j] <= 0x37:
                    oct_digits.append(b[j])
                    j += 1
                out.append(int(bytes(oct_digits), 8) & 0xFF)
                i = j
                continue
            if nxt in (0x0A, 0x0D):  # line continuation: swallow EOL
                i += 2
                if nxt == 0x0D and i < n and b[i] == 0x0A:
                    i += 1
                continue
            out.append(nxt)  # unknown escape: the char itself
            i += 2
            continue
        out.append(c)
        i += 1
    return bytes(out)


# a PDF "show text" operand: (literal with escapes) or <hex string>
_PDF_STR_RE = rb"\(((?:[^()\\]|\\.)*)\)|<([0-9A-Fa-f\s]*)>"


def _extract_pdf_text(data: bytes) -> str:
    """Minimal PDF text extraction: every stream object (raw or
    FlateDecode via zlib — a page's MULTIPLE content streams all
    contribute, in file order) -> BT..ET text blocks -> Tj / ' / " /
    TJ-array show operators, with literal strings (escape + octal
    sequences) AND <hex> strings decoded. Handles the common text-PDF
    encodings; image-only pages or exotic CMaps yield ''. A
    Tika/pdfminer-grade extractor slots in here unchanged — the
    dispatch/watchdog plumbing is what the engine defines
    (parser/SimplePageParser.java:180-205)."""
    import re as _re
    import zlib

    def _operand(m: "_re.Match") -> bytes:
        if m.group(1) is not None:
            return _pdf_unescape(m.group(1))
        hexs = _re.sub(rb"\s", b"", m.group(2))
        if len(hexs) % 2:
            hexs += b"0"  # odd-length hex: implicit trailing 0 (spec)
        return bytes.fromhex(hexs.decode("ascii"))

    chunks = []
    for m in _re.finditer(rb"stream\r?\n(.*?)endstream", data, _re.DOTALL):
        raw = m.group(1)
        try:
            raw = zlib.decompress(raw)
        except zlib.error:
            pass
        for bt in _re.finditer(rb"BT(.*?)ET", raw, _re.DOTALL):
            block = bt.group(1)
            # single-string shows: Tj and the ' / " line variants
            for tj in _re.finditer(
                rb"(?:" + _PDF_STR_RE + rb")\s*(?:Tj|'|\")", block, _re.DOTALL
            ):
                chunks.append(_operand(tj))
            # TJ arrays: every string element, kerning numbers ignored
            for tja in _re.finditer(rb"\[(.*?)\]\s*TJ", block, _re.DOTALL):
                for sm in _re.finditer(_PDF_STR_RE, tja.group(1), _re.DOTALL):
                    chunks.append(_operand(sm))
    text = b" ".join(chunks).decode("latin-1", "replace")
    return " ".join(text.split())


def _strip_tags(txt: str) -> str:
    import re as _re

    return " ".join(_re.sub(TAG_RE, " ", txt).split())


def _unescape_xml(txt: str) -> str:
    import html

    return html.unescape(txt)


def _parse_feed_rss(txt: str) -> tuple[str, str, list[str]]:
    """RSS 2.0: channel title; item titles + descriptions as text;
    item links as outlinks (Tika's FeedParser read, minus syndication
    metadata)."""
    import re as _re

    items = _re.findall(r"<item[\s>].*?</item>", txt, _re.DOTALL | _re.IGNORECASE)
    head = _re.split(r"<item[\s>]", txt, maxsplit=1, flags=_re.IGNORECASE)[0]
    tm = _re.search(r"<title>(.*?)</title>", head, _re.DOTALL | _re.IGNORECASE)
    title = _strip_tags(tm.group(1)) if tm else ""
    texts, links = [], []
    for it in items:
        for tag in ("title", "description"):
            m = _re.search(rf"<{tag}>(.*?)</{tag}>", it, _re.DOTALL | _re.IGNORECASE)
            if m:
                texts.append(_strip_tags(m.group(1)))
        lm = _re.search(r"<link>(.*?)</link>", it, _re.DOTALL | _re.IGNORECASE)
        if lm:
            links.append(lm.group(1).strip())
    return title, " ".join(t for t in texts if t), links


def _parse_feed_atom(txt: str) -> tuple[str, str, list[str]]:
    """Atom: feed title; entry titles + summaries/content as text;
    entry link hrefs as outlinks."""
    import re as _re

    entries = _re.findall(r"<entry[\s>].*?</entry>", txt, _re.DOTALL | _re.IGNORECASE)
    head = _re.split(r"<entry[\s>]", txt, maxsplit=1, flags=_re.IGNORECASE)[0]
    tm = _re.search(r"<title[^>]*>(.*?)</title>", head, _re.DOTALL | _re.IGNORECASE)
    title = _strip_tags(tm.group(1)) if tm else ""
    texts, links = [], []
    for en in entries:
        for tag in ("title", "summary", "content"):
            m = _re.search(
                rf"<{tag}[^>]*>(.*?)</{tag}>", en, _re.DOTALL | _re.IGNORECASE
            )
            if m:
                texts.append(_strip_tags(m.group(1)))
        for lm in _re.finditer(r"<link[^>]*\bhref=\"([^\"]+)\"", en, _re.IGNORECASE):
            links.append(lm.group(1).strip())
    return title, " ".join(t for t in texts if t), links


def _parse_markdown_doc(txt: str) -> tuple[str, str, list[str]]:
    """Markdown: first heading as title, inline [text](url) link targets
    as outlinks, syntax stripped to plain text (the Tika text-flavor
    read of a README-style page)."""
    import re as _re

    tm = _re.search(r"^\s{0,3}#{1,6}\s+(.+)$", txt, _re.MULTILINE)
    title = tm.group(1).strip() if tm else ""
    links = [
        m.group(2).strip()
        for m in _re.finditer(r"\[([^\]]*)\]\(([^)\s]+)[^)]*\)", txt)
    ]
    body = txt
    body = _re.sub(r"```.*?```", " ", body, flags=_re.DOTALL)  # fenced code
    body = _re.sub(r"\[([^\]]*)\]\([^)]*\)", r"\1", body)  # keep anchor text
    body = _re.sub(r"^\s{0,3}#{1,6}\s+", "", body, flags=_re.MULTILINE)
    body = _re.sub(r"[*_`>|#]+", " ", body)
    return title, " ".join(body.split()), links


def _parse_csv_doc(txt: str) -> tuple[str, str, list[str]]:
    """CSV/TSV: header row as title, cells flattened to whitespace-
    normalized text (Tika's tabular-text rendering)."""
    import csv as _csv
    import io as _io

    rows = list(_csv.reader(_io.StringIO(txt)))
    if not rows:
        return "", "", []
    title = " ".join(c.strip() for c in rows[0] if c.strip())
    cells = [c.strip() for row in rows[1:] for c in row if c.strip()]
    return title, " ".join(" ".join(cells).split()), []


def _parse_json_doc(txt: str) -> tuple[str, str, list[str]]:
    """JSON: every string leaf joined in document order as the text
    (Tika's JSON text rendering); http(s) string leaves double as
    outlinks."""
    import json as _json

    strings: list[str] = []

    def walk(v):
        if isinstance(v, str):
            strings.append(v)
        elif isinstance(v, dict):
            for val in v.values():
                walk(val)
        elif isinstance(v, list):
            for val in v:
                walk(val)

    walk(_json.loads(txt))
    links = [s for s in strings if s.startswith(("http://", "https://"))]
    text = " ".join(" ".join(s for s in strings if s not in links).split())
    return "", text, links


def _parse_xml_doc(txt: str) -> tuple[str, str, list[str]]:
    """XML dispatch with Tika-style root sniffing: rss/feed roots parse
    as feeds, urlset/sitemapindex roots parse as sitemap pages (their
    <loc> entries ARE the outlinks — ParseSiteMapFunction semantics
    applied to a page-fetched sitemap), anything else strips tags."""
    import re as _re

    # first element tag; <?xml ...?> and <!-- --> never match [A-Za-z]
    root = _re.search(r"<\s*([A-Za-z][\w:-]*)", txt)
    name = (root.group(1).lower() if root else "").split(":")[-1]
    if name == "rss":
        return _parse_feed_rss(txt)
    if name == "feed":
        return _parse_feed_atom(txt)
    if name in ("urlset", "sitemapindex"):
        locs = [
            m.group(1).strip()
            for m in _re.finditer(r"<loc>(.*?)</loc>", txt, _re.DOTALL | _re.IGNORECASE)
        ]
        return "", "", locs
    return "", _strip_tags(txt), []


def _parse_docx_doc(content: bytes) -> tuple[str, str, list[str]]:
    """OOXML WordprocessingML (.docx) text extraction — the Tika office
    tier (``parser/SimplePageParser.java:180-205`` routes these through
    AutoDetectParser). A docx is a zip: body text lives in
    ``word/document.xml`` as ``<w:t>`` runs (``<w:p>`` paragraph
    boundaries become whitespace), the title in ``docProps/core.xml``
    ``<dc:title>``, and external hyperlinks in the relationship targets
    of ``word/_rels/document.xml.rels`` (TargetMode="External" — the
    document.xml anchor carries only the r:id). stdlib zipfile + the
    repo's regex-XML idiom; any malformed container raises and maps to
    ERROR_PARSING_ERROR in the watchdog."""
    import io
    import re as _re
    import zipfile

    with zipfile.ZipFile(io.BytesIO(content)) as z:
        doc = z.read("word/document.xml").decode("utf-8", "replace")
        title = ""
        if "docProps/core.xml" in z.namelist():
            core = z.read("docProps/core.xml").decode("utf-8", "replace")
            m = _re.search(r"<dc:title>(.*?)</dc:title>", core, _re.DOTALL)
            title = _unescape_xml(m.group(1).strip()) if m else ""
        links: list[str] = []
        rels_name = "word/_rels/document.xml.rels"
        if rels_name in z.namelist():
            rels = z.read(rels_name).decode("utf-8", "replace")
            # attribute order is not fixed: match Target=/TargetMode= in
            # either order within one <Relationship .../> element
            links = [
                _unescape_xml(g or h)
                for g, h in _re.findall(
                    r'Target="([^"]+)"[^>]*TargetMode="External"|'
                    r'TargetMode="External"[^>]*Target="([^"]+)"',
                    rels,
                )
                if g or h
            ]
    # Word splits runs MID-WORD at every formatting/rsid boundary, so
    # <w:t> runs inside one paragraph concatenate with NO separator;
    # only paragraph ends and explicit tab/break elements become
    # whitespace. (Joining runs with spaces corrupted 'Hel|lo' into
    # 'Hel lo' — caught in the r7 review.)
    paras = _re.findall(r"<w:p[\s>].*?</w:p>|<w:p/>", doc, _re.DOTALL)
    pieces = []
    for p in paras:
        # tab/break ELEMENTS are siblings of the <w:t> runs — turn them
        # into a one-space run so they survive the run extraction
        p = _re.sub(r"<w:(?:tab|br|cr)\b[^>]*/?>", "<w:t> </w:t>", p)
        runs = _re.findall(r"<w:t(?:\s[^>]*)?>(.*?)</w:t>", p, _re.DOTALL)
        pieces.append("".join(_unescape_xml(r) for r in runs))
    text = " ".join(" ".join(pieces).split())
    return title, text, links


def _parse_xlsx_doc(content: bytes) -> tuple[str, str, list[str]]:
    """OOXML SpreadsheetML (.xlsx) text extraction: the shared-string
    table (``xl/sharedStrings.xml`` — one ``<si>`` per distinct cell
    string, runs concatenated run-tight like docx) plus inline numeric
    cell values from each worksheet, in sheet order; title from
    ``docProps/core.xml``; hyperlinks from every sheet's external
    relationship targets."""
    import io
    import re as _re
    import zipfile

    with zipfile.ZipFile(io.BytesIO(content)) as z:
        names = z.namelist()
        title = ""
        if "docProps/core.xml" in names:
            core = z.read("docProps/core.xml").decode("utf-8", "replace")
            m = _re.search(r"<dc:title>(.*?)</dc:title>", core, _re.DOTALL)
            title = _unescape_xml(m.group(1).strip()) if m else ""
        texts: list[str] = []
        if "xl/sharedStrings.xml" in names:
            ss = z.read("xl/sharedStrings.xml").decode("utf-8", "replace")
            for si in _re.findall(r"<si>(.*?)</si>", ss, _re.DOTALL):
                runs = _re.findall(r"<t(?:\s[^>]*)?>(.*?)</t>", si, _re.DOTALL)
                texts.append("".join(_unescape_xml(r) for r in runs))
        links: list[str] = []
        for n in sorted(names):
            if _re.fullmatch(r"xl/worksheets/sheet\d+\.xml", n):
                sheet = z.read(n).decode("utf-8", "replace")
                # Walk whole <c>...</c> elements: t="s" cells index the
                # shared-string table already extracted above; inlineStr
                # cells carry <is><t> runs; everything else (plain
                # numerics AND formula cells, whose <v> follows an <f>
                # element rather than the open tag) contributes its
                # cached <v> value — Tika's extractor includes all three.
                # drop empty self-closing cells first so `<c r="A1"/>`
                # can't swallow the next cell's open tag via `.*?</c>`
                sheet = _re.sub(r"<c\b[^>]*/>", "", sheet)
                for attrs, cell in _re.findall(
                    r"<c\b([^>]*)>(.*?)</c>", sheet, _re.DOTALL
                ):
                    if 't="s"' in attrs:
                        continue
                    if 't="inlineStr"' in attrs:
                        runs = _re.findall(
                            r"<t(?:\s[^>]*)?>(.*?)</t>", cell, _re.DOTALL
                        )
                        texts.append("".join(_unescape_xml(r) for r in runs))
                        continue
                    mv = _re.search(r"<v(?:\s[^>]*)?>(.*?)</v>", cell, _re.DOTALL)
                    if mv:
                        texts.append(_unescape_xml(mv.group(1)))
            elif _re.fullmatch(r"xl/worksheets/_rels/sheet\d+\.xml\.rels", n):
                rels = z.read(n).decode("utf-8", "replace")
                links += [
                    _unescape_xml(g or h)
                    for g, h in _re.findall(
                        r'Target="([^"]+)"[^>]*TargetMode="External"|'
                        r'TargetMode="External"[^>]*Target="([^"]+)"',
                        rels,
                    )
                    if g or h
                ]
    return title, " ".join(" ".join(texts).split()), links


def _parse_pptx_doc(content: bytes) -> tuple[str, str, list[str]]:
    """OOXML PresentationML (.pptx): ``<a:t>`` runs per slide, slides in
    numeric order, runs concatenated run-tight within a paragraph
    (``</a:p>`` is the whitespace boundary, as in docx); title from
    ``docProps/core.xml``; hyperlinks from slide relationship targets."""
    import io
    import re as _re
    import zipfile

    with zipfile.ZipFile(io.BytesIO(content)) as z:
        names = z.namelist()
        title = ""
        if "docProps/core.xml" in names:
            core = z.read("docProps/core.xml").decode("utf-8", "replace")
            m = _re.search(r"<dc:title>(.*?)</dc:title>", core, _re.DOTALL)
            title = _unescape_xml(m.group(1).strip()) if m else ""

        def slide_no(n: str) -> int:
            m2 = _re.search(r"slide(\d+)\.xml$", n)
            return int(m2.group(1)) if m2 else 0

        pieces: list[str] = []
        links: list[str] = []
        for n in sorted((x for x in names if _re.fullmatch(r"ppt/slides/slide\d+\.xml", x)), key=slide_no):
            slide = z.read(n).decode("utf-8", "replace")
            # run-tight within a paragraph, whitespace between paragraphs
            # (the docx run-boundary rule — r7 review finding)
            for p in _re.findall(r"<a:p>.*?</a:p>|<a:p/>", slide, _re.DOTALL):
                runs = _re.findall(r"<a:t>(.*?)</a:t>", p, _re.DOTALL)
                pieces.append("".join(_unescape_xml(r) for r in runs))
        for n in sorted((x for x in names if _re.fullmatch(r"ppt/slides/_rels/slide\d+\.xml\.rels", x)), key=slide_no):
            rels = z.read(n).decode("utf-8", "replace")
            links += [
                _unescape_xml(g or h)
                for g, h in _re.findall(
                    r'Target="([^"]+)"[^>]*TargetMode="External"|'
                    r'TargetMode="External"[^>]*Target="([^"]+)"',
                    rels,
                )
                if g or h
            ]
    return title, " ".join(" ".join(pieces).split()), links


def _parse_odt_doc(content: bytes) -> tuple[str, str, list[str]]:
    """ODF text (.odt) extraction, the OpenDocument twin of
    ``_parse_docx_doc``: body in ``content.xml`` (tag-stripped with
    paragraph boundaries as whitespace), title in ``meta.xml``
    ``<dc:title>``, hyperlinks as ``xlink:href`` attributes of
    ``<text:a>`` anchors."""
    import io
    import re as _re
    import zipfile

    with zipfile.ZipFile(io.BytesIO(content)) as z:
        doc = z.read("content.xml").decode("utf-8", "replace")
        title = ""
        if "meta.xml" in z.namelist():
            meta = z.read("meta.xml").decode("utf-8", "replace")
            m = _re.search(r"<dc:title>(.*?)</dc:title>", meta, _re.DOTALL)
            title = _unescape_xml(m.group(1).strip()) if m else ""
    links = [
        _unescape_xml(m.group(1))
        for m in _re.finditer(r'<text:a\s[^>]*xlink:href="([^"]+)"', doc)
    ]
    # paragraph/heading ends, explicit tabs and line breaks become
    # whitespace; every OTHER tag (inline spans, anchors) is removed with
    # NO separator — inline markup splits words mid-word exactly like
    # docx runs ('Hel<text:span>lo</text:span>' is 'Hello')
    body = _re.sub(r"</text:(?:p|h)>|<text:(?:tab|line-break)\b[^>]*/?>", " ", doc)
    body = _re.sub(TAG_RE, "", body)
    text = " ".join(_unescape_xml(body).split())
    return title, text, links


def _parse_one_doc(url: str, content: bytes, content_type: str, max_outlinks: int):
    """(title, parsed_text, outlinks) for one document, by content type."""
    from ..functions.charset import decode_bytes

    ctype = (content_type or "").split(";")[0].strip().lower()
    if ctype in ("text/html", "application/xhtml+xml"):
        html = decode_bytes(content, content_type)
        d = _parse_html_doc(url, html, max_outlinks)
        return d["title"], d["parsed_text"], d["outlinks"]
    if ctype in ("text/plain",):
        return "", " ".join(decode_bytes(content, content_type).split()), []
    if ctype in ("application/pdf",):
        return "", _extract_pdf_text(content), []
    if ctype in ("application/rss+xml",):
        return _parse_feed_rss(decode_bytes(content, content_type))
    if ctype in ("application/atom+xml",):
        return _parse_feed_atom(decode_bytes(content, content_type))
    if ctype in ("text/xml", "application/xml"):
        return _parse_xml_doc(decode_bytes(content, content_type))
    if ctype in ("text/markdown", "text/x-markdown"):
        return _parse_markdown_doc(decode_bytes(content, content_type))
    if ctype in ("text/csv", "text/tab-separated-values"):
        return _parse_csv_doc(decode_bytes(content, content_type))
    if ctype in ("application/json", "application/ld+json"):
        return _parse_json_doc(decode_bytes(content, content_type))
    if ctype in (
        "application/vnd.openxmlformats-officedocument.wordprocessingml.document",
    ):
        return _parse_docx_doc(content)
    if ctype in (
        "application/vnd.oasis.opendocument.text",
        # spreadsheet/presentation share the same ODF content.xml text
        # model (<text:p>/<text:h> inside cells and frames) — the text
        # extractor is identical
        "application/vnd.oasis.opendocument.spreadsheet",
        "application/vnd.oasis.opendocument.presentation",
    ):
        return _parse_odt_doc(content)
    if ctype in (
        "application/vnd.openxmlformats-officedocument.spreadsheetml.sheet",
    ):
        return _parse_xlsx_doc(content)
    if ctype in (
        "application/vnd.openxmlformats-officedocument.presentationml.presentation",
    ):
        return _parse_pptx_doc(content)
    raise _UnsupportedType(ctype)


class _UnsupportedType(Exception):
    pass


def parse_pages_multiformat(
    fetch_results: DataFrame,
    *,
    max_outlinks: int = MAX_OUTLINKS_PER_PAGE,
    timeout_s: float = PARSE_TIMEOUT_S,
    extra_parsers: dict | None = None,
) -> DataFrame:
    """Dispatch-on-content-type parse with per-document watchdog.

    Output adds ``parse_status``: PARSED, SKIPPED_UNSUPPORTED_TYPE, or
    ERROR_PARSING_ERROR (exception OR watchdog timeout — the reference's
    status for both, ExceptionUtils.java:246-330).

    ``extra_parsers``: {content_type: fn(url, bytes) -> (title, text,
    outlinks)} — the pluggable-parser seam (BasePageParser analogue);
    tests inject a deliberately slow parser to pin watchdog behavior.

    Scale shape: one ThreadPoolExecutor per Python worker (reused across
    Arrow batches), timeouts abandon the stuck thread and the pool
    replaces it; all post-parse columns stay JVM-side.
    """
    extra = dict(extra_parsers or {})

    fetched = fetch_results.filter(
        (F.col("status") == "FETCHED") & F.col("content").isNotNull()
    ).select("url", "pld", "content", "content_type", "status_time")

    out_schema = (
        "url string, pld string, status_time long, parse_status string, "
        "title string, parsed_text string, outlinks array<string>"
    )

    def run(batches):
        from concurrent.futures import ThreadPoolExecutor
        from concurrent.futures import TimeoutError as FTimeout

        pool = ThreadPoolExecutor(max_workers=1)

        def parse_with_watchdog(url, content, ctype):
            nonlocal pool
            base = (ctype or "").split(";")[0].strip().lower()
            if base in extra:
                job = lambda: extra[base](url, content)
            else:
                job = lambda: _parse_one_doc(url, content, ctype, max_outlinks)
            fut = pool.submit(job)
            try:
                title, text, links = fut.result(timeout=timeout_s)
                return "PARSED", title, text, list(links)
            except FTimeout:
                # abandon the stuck worker thread (reference watchdog) and
                # replace the pool so later docs get a fresh thread
                fut.cancel()
                pool = ThreadPoolExecutor(max_workers=1)
                return "ERROR_PARSING_ERROR", "", "", []
            except _UnsupportedType:
                return "SKIPPED_UNSUPPORTED_TYPE", "", "", []
            except Exception:
                return "ERROR_PARSING_ERROR", "", "", []

        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                content = (
                    bytes(r.content)
                    if isinstance(r.content, (bytes, bytearray, memoryview))
                    else str(r.content).encode()
                )
                status, title, text, links = parse_with_watchdog(
                    r.url, content, r.content_type
                )
                rows.append(
                    {
                        "url": r.url,
                        "pld": r.pld,
                        "status_time": r.status_time,
                        "parse_status": status,
                        "title": title,
                        "parsed_text": text,
                        "outlinks": links,
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "url", "pld", "status_time", "parse_status",
                    "title", "parsed_text", "outlinks",
                ],
            )

    return fetched.mapInPandas(run, out_schema)
