"""Charset detection + charset-aware decode, and page-language priority.

Reference: ``fc/parser/TikaCallable.java`` — Tika's AutoDetectReader
resolves the page charset as BOM -> Content-Type header parameter ->
``<meta charset>`` / ``<meta http-equiv=Content-Type>`` -> statistical
sniff, and malformed bytes never crash the parse (they become U+FFFD).
Language resolution follows the same file's priority (lines 241-269):
HTTP ``Content-Language`` header -> ``<meta http-equiv>`` -> profiler.

Two tiers, mirroring the two parse paths:

* JVM tier (``charset_expr`` / ``decode_expr``) for the codegen'd fast
  path: BOM sniff on the raw bytes, header/meta regexp, then a
  when-chain over the charsets Spark's ``decode`` supports (UTF-8,
  UTF-16 family, ISO-8859-1). Every branch is crash-proof: UTF-8 is
  gated on ``is_valid_utf8``, UTF-16 on ``utf16_valid_expr`` (even
  byte length AND correctly paired surrogates), and the
  fallback is ISO-8859-1 (total: every byte sequence decodes). Without
  this gate a single Shift-JIS page kills the whole stage with
  MALFORMED_CHARACTER_CODING — at crawl scale that is a guaranteed
  crash, not an edge case.
* Python tier (``detect_charset`` / ``decode_bytes``) for the
  mapInPandas tree/multiformat paths: same priority, but any codec the
  Python codecs registry knows (Shift-JIS, EUC-KR, ...) decodes at full
  fidelity, ``errors="replace"``.
"""

from __future__ import annotations

import codecs
import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# charset= parameter, as it appears in a Content-Type header value or an
# HTML <meta> tag (covers both <meta charset="x"> and
# <meta http-equiv="Content-Type" content="text/html; charset=x">).
_CS_PARAM_RE = r'(?i)charset\s*=\s*["\']?\s*([A-Za-z0-9._:-]+)'
_META_CS_RE = r'(?i)<meta[^>]{0,200}?charset\s*=\s*["\']?\s*([A-Za-z0-9._:-]+)'
_META_LANG_RE = (
    r'(?i)<meta[^>]{0,200}?http-equiv\s*=\s*["\']?content-language["\']?'
    r'[^>]{0,200}?content\s*=\s*["\']?\s*([A-Za-z]{2,8})'
)
_HEAD_BYTES = 2048  # how far into the page the meta sniff looks

# Names the JVM fast path maps onto Spark-decodable charsets. Everything
# else (Shift-JIS, EUC-*, KOI8, ...) falls back to the total ISO-8859-1
# decode on the fast path; the Python tree path decodes them properly.
_JVM_UTF8 = ("UTF-8", "UTF8")
_JVM_LATIN = (
    "ISO-8859-1", "ISO8859-1", "LATIN1", "LATIN-1", "L1",
    "US-ASCII", "ASCII", "WINDOWS-1252", "CP1252",
)
_JVM_U16LE = ("UTF-16LE", "UTF16LE")
_JVM_U16BE = ("UTF-16BE", "UTF16BE")


def charset_expr(content: Column, content_type: Column | None) -> Column:
    """Detected charset name (JVM-side): BOM -> header -> meta -> sniff.

    Returns one of UTF-8 / UTF-16LE / UTF-16BE / ISO-8859-1 — the set
    ``decode_expr`` can act on. Unknown declared charsets resolve to
    UTF-8 when the bytes validate, else ISO-8859-1.
    """
    bom = (
        F.when(F.substring(content, 1, 3) == F.lit(b"\xef\xbb\xbf"), F.lit("UTF-8"))
        .when(F.substring(content, 1, 2) == F.lit(b"\xff\xfe"), F.lit("UTF-16LE"))
        .when(F.substring(content, 1, 2) == F.lit(b"\xfe\xff"), F.lit("UTF-16BE"))
    )
    ct = content_type if content_type is not None else F.lit(None).cast("string")
    header = F.upper(F.regexp_extract(F.coalesce(ct, F.lit("")), _CS_PARAM_RE, 1))
    # ISO-8859-1 decode is total (every byte maps), so the head sniff
    # itself can never throw, whatever the page's real charset is.
    head = F.decode(F.substring(content, 1, _HEAD_BYTES), "ISO-8859-1")
    meta = F.upper(F.regexp_extract(head, _META_CS_RE, 1))
    declared = F.coalesce(
        bom,
        F.nullif(header, F.lit("")),
        F.nullif(meta, F.lit("")),
    )
    sniffed = F.when(F.is_valid_utf8(content), F.lit("UTF-8")).otherwise(
        F.lit("ISO-8859-1")
    )
    return (
        F.when(declared.isin(*_JVM_UTF8), F.lit("UTF-8"))
        .when(declared.isin(*_JVM_LATIN), F.lit("ISO-8859-1"))
        .when(declared.isin(*_JVM_U16LE), F.lit("UTF-16LE"))
        .when(declared.isin(*_JVM_U16BE), F.lit("UTF-16BE"))
        .otherwise(sniffed)  # unknown or undeclared -> sniff
    )


# UTF-16 validity, checked JVM-side over the ISO-8859-1 byte proxy (one
# char per byte). Spark 4's decode throws MALFORMED_CHARACTER_CODING on
# an *unpaired surrogate* even when the byte length is even — and the
# crawl loop's max_content_size byte truncation can itself split a
# surrogate pair — so evenness alone is not a sufficient guard. A valid
# stream is a sequence of units that are either non-surrogate (high byte
# outside D8-DF) or a D8-DB high surrogate immediately followed by a
# DC-DF low surrogate. The two alternatives are disjoint on the high
# byte, so the possessive repetition is strictly linear (no backtracking).
_U16LE_VALID_RE = (
    "(?s)^(?:[\\s\\S][\\x00-\\xd7\\xe0-\\xff]"
    "|[\\s\\S][\\xd8-\\xdb][\\s\\S][\\xdc-\\xdf])*+$"
)
_U16BE_VALID_RE = (
    "(?s)^(?:[\\x00-\\xd7\\xe0-\\xff][\\s\\S]"
    "|[\\xd8-\\xdb][\\s\\S][\\xdc-\\xdf][\\s\\S])*+$"
)


def utf16_valid_expr(content: Column, big_endian: bool) -> Column:
    """True iff ``content`` is decodable UTF-16 (even length, every
    surrogate correctly paired). Total: never throws, any input."""
    proxy = F.decode(content, "ISO-8859-1")  # total: one char per byte
    pat = _U16BE_VALID_RE if big_endian else _U16LE_VALID_RE
    return (F.length(content) % 2 == 0) & proxy.rlike(pat)


def decode_expr(content: Column, content_type: Column | None = None) -> Column:
    """Charset-aware page decode (JVM-side), crash-proof by construction.

    Replaces the old ``F.decode(content, "UTF-8")``, which raises
    MALFORMED_CHARACTER_CODING on the first non-UTF-8 page. Each branch
    is guarded so ``decode`` only ever sees input it can represent —
    UTF-8 via ``is_valid_utf8``, UTF-16 via ``utf16_valid_expr`` (even
    length AND paired surrogates; evenness alone is not enough, see
    above) — and the residual fallback (ISO-8859-1) accepts any byte
    sequence. A leading BOM is stripped after decode.
    """
    cs = charset_expr(content, content_type)
    decoded = (
        F.when((cs == "UTF-8") & F.is_valid_utf8(content), F.decode(content, "UTF-8"))
        .when(
            (cs == "UTF-16LE") & utf16_valid_expr(content, big_endian=False),
            F.decode(content, "UTF-16LE"),
        )
        .when(
            (cs == "UTF-16BE") & utf16_valid_expr(content, big_endian=True),
            F.decode(content, "UTF-16BE"),
        )
        .otherwise(F.decode(content, "ISO-8859-1"))
    )
    return F.regexp_replace(decoded, "^\\uFEFF", "")


# ----------------------------------------------------------------------
# Python tier (tree / multiformat parse paths)
# ----------------------------------------------------------------------

_PY_CS_PARAM = re.compile(r'charset\s*=\s*["\']?\s*([A-Za-z0-9._:-]+)', re.I)
_PY_META_CS = re.compile(rb'<meta[^>]{0,200}?charset\s*=\s*["\']?\s*([A-Za-z0-9._:-]+)', re.I)


def _codec_or_none(name: str | None) -> str | None:
    if not name:
        return None
    try:
        return codecs.lookup(name).name
    except LookupError:
        return None


def detect_charset(content: bytes, content_type: str | None = None) -> str:
    """Codec name for one page: BOM -> header -> meta -> UTF-8-try ->
    ISO-8859-1. Always returns a codec Python can decode with."""
    if content.startswith(b"\xef\xbb\xbf"):
        return "utf-8-sig"
    if content.startswith(b"\xff\xfe") or content.startswith(b"\xfe\xff"):
        return "utf-16"  # codec reads byte order from the BOM and strips it
    m = _PY_CS_PARAM.search(content_type or "")
    cs = _codec_or_none(m.group(1) if m else None)
    if cs:
        return cs
    m = _PY_META_CS.search(content[:_HEAD_BYTES])
    cs = _codec_or_none(m.group(1).decode("ascii", "ignore") if m else None)
    if cs:
        return cs
    try:
        content.decode("utf-8")
        return "utf-8"
    except UnicodeDecodeError:
        return "iso8859-1"


def decode_bytes(content: bytes, content_type: str | None = None) -> str:
    """Decode one page with the detected charset; never raises."""
    text = content.decode(detect_charset(content, content_type), "replace")
    return text[1:] if text.startswith("\ufeff") else text


# ----------------------------------------------------------------------
# Page-language priority: header -> meta -> profiler
# (TikaCallable.java:241-269)
# ----------------------------------------------------------------------


def header_lang_expr(headers: Column) -> Column:
    """Primary language subtag from a Content-Language header value in a
    ``map<string,array<string>>`` headers column ('en-US, de' -> 'en');
    NULL when absent."""
    # try_element_at: missing header key / empty value list must yield
    # NULL, not an ANSI MAP_KEY_DOES_NOT_EXIST error
    raw = F.try_element_at(F.try_element_at(headers, F.lit("content-language")), F.lit(1))
    return F.nullif(
        F.lower(F.regexp_extract(F.coalesce(raw, F.lit("")), r"^\s*([A-Za-z]{2,8})", 1)),
        F.lit(""),
    )


def meta_lang_expr(html: Column) -> Column:
    """Primary language subtag from ``<meta http-equiv=content-language>``;
    NULL when absent."""
    return F.nullif(
        F.lower(F.regexp_extract(F.coalesce(html, F.lit("")), _META_LANG_RE, 1)),
        F.lit(""),
    )


def page_language_expr(
    text: Column,
    html: Column | None = None,
    headers: Column | None = None,
) -> Column:
    """Resolved page language: header -> meta -> stopword profiler."""
    from .text import lang_id_expr

    parts = []
    if headers is not None:
        parts.append(header_lang_expr(headers))
    if html is not None:
        parts.append(meta_lang_expr(html))
    parts.append(lang_id_expr(text))
    return F.coalesce(*parts)
