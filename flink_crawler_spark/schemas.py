"""Record schemas for the crawl engine.

The reference models records as a Java POJO hierarchy
(``/root/reference/src/main/java/com/scaleunlimited/flinkcrawler/pojos/``:
BaseUrl -> RawUrl -> ExtractedUrl; BaseUrl -> ValidUrl -> ScoredUrl ->
FetchUrl, plus CrawlStateUrl / FetchResultUrl / ParsedUrl). Spark-first
we keep ONE wide schema per table with nullable stage columns; stage
"type refinement" is projection, not subclassing.

FetchStatus mirrors ``pojos/FetchStatus.java:22-52`` (24 values) with the
same merge priorities (``:57``).
"""

from __future__ import annotations

from pyspark.sql import types as T

# --------------------------------------------------------------------------
# FetchStatus (reference: pojos/FetchStatus.java:22-57)
# --------------------------------------------------------------------------

FETCH_STATUS_PRIORITY: dict[str, int] = {
    "UNFETCHED": 0,
    "FETCHING": 10,
    "QUEUED": 10,
    "FETCHED": 25,
    "SKIPPED_BLOCKED": 50,
    "SKIPPED_UNKNOWN": 50,
    "SKIPPED_INVALID_URL": 50,
    "SKIPPED_DEFERRED": 50,
    "SKIPPED_BY_SCORER": 50,
    "SKIPPED_BY_SCORE": 50,
    "SKIPPED_TIME_LIMIT": 50,
    "SKIPPED_INTERRUPTED": 50,
    "SKIPPED_INEFFICIENT": 50,
    "SKIPPED_PER_SERVER_LIMIT": 50,
    "SKIPPED_CRAWLDELAY": 50,
    "ABORTED_SLOW_RESPONSE": 50,
    "ABORTED_FETCH_TIME_LIMIT": 50,
    "ABORTED_DURING_FETCH": 50,
    "ABORTED_INVALID_MIMETYPE": 50,
    "HTTP_REDIRECTION_ERROR": 50,
    "HTTP_TOO_MANY_REDIRECTS": 50,
    "HTTP_MOVED_PERMANENTLY": 50,
    # HTTP status-code failures (FetchStatus.java:42-44). The merge
    # lattice already treated these as the 50-class via the unknown-status
    # default; declaring them makes ENUMERATING consumers see them too —
    # before r8 the per-tick df.observe status counters silently dropped
    # e.g. HTTP_NOT_FOUND rows from CrawlResult.stats (caught by the
    # CrawlerMetrics parity test).
    "HTTP_CLIENT_ERROR": 50,
    "HTTP_UNAUTHORIZED": 50,
    "HTTP_FORBIDDEN": 50,
    "HTTP_NOT_FOUND": 50,
    "HTTP_GONE": 50,
    "HTTP_SERVER_ERROR": 50,
    "ERROR_INVALID_URL": 50,
    "ERROR_IOEXCEPTION": 50,
    "ERROR_PARSING_ERROR": 50,
    "FETCHED_SYNTHETIC": 25,
}

FETCH_STATUSES: tuple[str, ...] = tuple(FETCH_STATUS_PRIORITY)

# --------------------------------------------------------------------------
# Wide URL / crawl-state schemas (reference: pojos/CrawlStateUrl.java:11-17,
# ValidUrl.java:12-19, FetchResultUrl.java:6-15, ParsedUrl.java:6-12)
# --------------------------------------------------------------------------

# RawUrl (pojos/RawUrl.java:6-10): url + estimated score.
RAW_URL_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("score", T.DoubleType(), True),
    ]
)

# ExtractedUrl (pojos/ExtractedUrl.java:4-7)
EXTRACTED_URL_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("score", T.DoubleType(), True),
        T.StructField("anchor_text", T.StringType(), True),
        T.StructField("rel_attributes", T.StringType(), True),
    ]
)

# CrawlStateUrl (pojos/CrawlStateUrl.java:11-17) + derived key columns
# (ValidUrl.java:12-19). `pld` is the partition key everywhere, exactly as
# the reference keys all state by paid-level domain (functions/PldKeySelector.java).
CRAWL_STATE_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("url_hash", T.LongType(), True),
        T.StructField("pld", T.StringType(), True),
        T.StructField("status", T.StringType(), False),
        T.StructField("prev_status", T.StringType(), True),
        T.StructField("status_time", T.LongType(), False),
        T.StructField("score", T.DoubleType(), False),
        T.StructField("next_fetch_time", T.LongType(), False),
    ]
)

# FetchUrl (pojos/FetchUrl.java:4-6): frontier row handed to the fetcher.
FETCH_URL_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("pld", T.StringType(), True),
        T.StructField("score", T.DoubleType(), True),
        T.StructField("crawl_delay_ms", T.LongType(), True),
    ]
)

# FetchResultUrl (pojos/FetchResultUrl.java:6-15). headers is a multimap
# (crawlercommons Headers) -> map<string, array<string>>.
FETCH_RESULT_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("pld", T.StringType(), True),
        T.StructField("status", T.StringType(), False),
        T.StructField("status_time", T.LongType(), False),
        T.StructField("fetched_url", T.StringType(), True),
        T.StructField("headers", T.MapType(T.StringType(), T.ArrayType(T.StringType())), True),
        T.StructField("content", T.BinaryType(), True),
        T.StructField("content_type", T.StringType(), True),
        T.StructField("response_rate", T.IntegerType(), True),
        T.StructField("next_fetch_time", T.LongType(), True),
    ]
)

# ParsedUrl (pojos/ParsedUrl.java:6-12)
PARSED_URL_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("pld", T.StringType(), True),
        T.StructField("parsed_text", T.StringType(), True),
        T.StructField("language", T.StringType(), True),
        T.StructField("title", T.StringType(), True),
        T.StructField("score", T.DoubleType(), True),
        T.StructField("parsed_meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

# Outlink rows emitted by the parser (ParseFunction side output).
OUTLINK_SCHEMA = T.StructType(
    [
        T.StructField("source_url", T.StringType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("anchor_text", T.StringType(), True),
        T.StructField("score", T.DoubleType(), True),
    ]
)

# DomainScore (pojos/DomainScore.java:6-9)
DOMAIN_SCORE_SCHEMA = T.StructType(
    [
        T.StructField("pld", T.StringType(), False),
        T.StructField("score", T.DoubleType(), False),
    ]
)
