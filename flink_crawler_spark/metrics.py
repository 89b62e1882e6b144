"""Reference metric-name parity (fc/metrics/CrawlerMetrics.java:5-12).

The engine's observable equivalents have existed since r3 — per-tick
status counts ride the tick job via ``df.observe`` into
``CrawlResult.stats``, and the 30 s rate gauge lives in
``queries/core.py`` — what differed from the reference was only the
NAMED-gauge wiring. This module is that wiring: a pure translation
from the engine's per-tick stats to the reference's gauge/counter
names, so a dashboard built against ``CrawlerMetrics`` reads the same
facts from this engine. No crawl-loop code changes: the loop already
emits everything needed.

Batch-semantics mapping (documented, not fudged): Flink's gauges
sample a continuously-running topology, while a micro-batch tick
reports POST-TICK values. ``URLsInFlight`` / ``URLsCurrentlyBeingFetched``
are therefore the tick's fetch-batch size — in this engine the
in-flight set IS the batch (``operators/frontier.py`` MAX_IN_FLIGHT
semantics), and between ticks it is zero by construction.

Status → metric mapping:
  * URLsInFetchQueue      = UNFETCHED + QUEUED + FETCHING (the frontier —
                            the reference's FetchQueue holds exactly the
                            URLs awaiting a fetch slot)
  * URLsActive            = every tracked URL (all statuses; the
                            reference gauges URLs resident in its URL DB)
  * URLsInFlight /
    URLsCurrentlyBeingFetched = Δ(fetch-attempt outcomes) this tick
  * URLsFetchedPerSeconds = Δ(FETCHED*) / tick seconds (when provided)
  * PagesParsed           = cumulative FETCHED* (a page reaches FETCHED
                            only after its parse emits; parse failures
                            carry ERROR_PARSING_ERROR instead)
  * PagesFailedParse      = cumulative ERROR_PARSING_ERROR
  * UniquePLDs            = distinct plds in the URL DB (one tiny
                            aggregate on the state frame; not derivable
                            from status counts alone)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# the reference's metric names, verbatim (CrawlerMetrics.java:5-12;
# "URLsFetchedPerSeconds" including its plural is the reference spelling)
GAUGE_URLS_CURRENTLY_BEING_FETCHED = "URLsCurrentlyBeingFetched"
GAUGE_URLS_FETCHED_PER_SECOND = "URLsFetchedPerSeconds"
GAUGE_URLS_IN_FETCH_QUEUE = "URLsInFetchQueue"
GAUGE_URLS_IN_FLIGHT = "URLsInFlight"
GAUGE_URLS_ACTIVE = "URLsActive"
GAUGE_UNIQUE_PLDS = "UniquePLDs"
COUNTER_PAGES_PARSED = "PagesParsed"
COUNTER_PAGES_FAILEDPARSE = "PagesFailedParse"

_FETCHED = ("FETCHED", "FETCHED_SYNTHETIC")
_QUEUE = ("UNFETCHED", "QUEUED", "FETCHING")
# statuses only a fetch ATTEMPT can produce (skips and URL-validation
# errors happen before the fetcher; see schemas.FETCH_STATUS_PRIORITY)
_ATTEMPT_PREFIXES = ("FETCHED", "ABORTED_", "HTTP_")
_ATTEMPT_EXACT = ("ERROR_IOEXCEPTION", "ERROR_PARSING_ERROR")


def _is_attempt(status: str) -> bool:
    return status.startswith(_ATTEMPT_PREFIXES) or status in _ATTEMPT_EXACT


def crawler_metrics(
    stats: list[dict], tick_secs: list[float] | None = None
) -> list[dict]:
    """Per-tick gauges under the reference's names, from
    ``CrawlResult.stats`` (one ``{"tick": t, "frontier": n,
    "status_counts": {status: n}}`` entry per tick; a bare
    ``{status: n}`` dict is also accepted). ``tick_secs`` optionally
    supplies each tick's wall seconds for the rate gauge (omitted from
    the row when absent or zero)."""
    out: list[dict] = []
    prev_fetched = prev_attempted = 0
    for i, entry in enumerate(stats):
        counts = entry.get("status_counts", entry)
        fetched = sum(n for s, n in counts.items() if s in _FETCHED)
        attempted = sum(n for s, n in counts.items() if _is_attempt(s))
        batch = attempted - prev_attempted
        row = {
            GAUGE_URLS_IN_FETCH_QUEUE: sum(
                n for s, n in counts.items() if s in _QUEUE
            ),
            GAUGE_URLS_ACTIVE: sum(counts.values()),
            GAUGE_URLS_IN_FLIGHT: batch,
            GAUGE_URLS_CURRENTLY_BEING_FETCHED: batch,
            COUNTER_PAGES_PARSED: fetched,
            COUNTER_PAGES_FAILEDPARSE: counts.get("ERROR_PARSING_ERROR", 0),
        }
        if tick_secs is not None and i < len(tick_secs) and tick_secs[i]:
            row[GAUGE_URLS_FETCHED_PER_SECOND] = (
                fetched - prev_fetched
            ) / tick_secs[i]
        out.append(row)
        prev_fetched, prev_attempted = fetched, attempted
    return out


def unique_plds(crawl_state: DataFrame) -> int:
    """GAUGE_UNIQUE_PLDS over the URL DB — one count-distinct aggregate
    (at scale: approx_count_distinct on the same frame; exact here so
    tests pin it)."""
    return crawl_state.select(F.countDistinct("pld").alias("n")).head()["n"]
