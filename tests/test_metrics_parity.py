"""CrawlerMetrics name-level parity (fc/metrics/CrawlerMetrics.java).

The translation layer is pure (no crawl-loop changes); these tests pin
the gauge names verbatim against the reference enum and the gauge
VALUES against an actual crawl's final state.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_crawler_spark.metrics import (
    COUNTER_PAGES_FAILEDPARSE,
    COUNTER_PAGES_PARSED,
    GAUGE_UNIQUE_PLDS,
    GAUGE_URLS_ACTIVE,
    GAUGE_URLS_CURRENTLY_BEING_FETCHED,
    GAUGE_URLS_FETCHED_PER_SECOND,
    GAUGE_URLS_IN_FETCH_QUEUE,
    GAUGE_URLS_IN_FLIGHT,
    crawler_metrics,
    unique_plds,
)
from flink_crawler_spark.plans.crawl_loop import CrawlConfig, crawl
from flink_crawler_spark.sources.fixtures import render_pages, web_graph_from_adjacency


def test_metric_names_match_reference_enum():
    # CrawlerMetrics.java:5-12, verbatim (including the reference's
    # "URLsFetchedPerSeconds" spelling)
    assert GAUGE_URLS_CURRENTLY_BEING_FETCHED == "URLsCurrentlyBeingFetched"
    assert GAUGE_URLS_FETCHED_PER_SECOND == "URLsFetchedPerSeconds"
    assert GAUGE_URLS_IN_FETCH_QUEUE == "URLsInFetchQueue"
    assert GAUGE_URLS_IN_FLIGHT == "URLsInFlight"
    assert GAUGE_URLS_ACTIVE == "URLsActive"
    assert GAUGE_UNIQUE_PLDS == "UniquePLDs"
    assert COUNTER_PAGES_PARSED == "PagesParsed"
    assert COUNTER_PAGES_FAILEDPARSE == "PagesFailedParse"


@pytest.fixture(scope="module")
def crawl_result(spark):
    d = lambda h, p="": f"http://{h}/{p}"  # noqa: E731
    adjacency = {
        d("m1.com"): [d("m1.com", "a"), d("m2.com")],
        d("m1.com", "a"): [d("m2.com", "deep"), d("m1.com", "missing")],
        d("m2.com"): [],
        d("m2.com", "deep"): [],
    }
    pages = render_pages(web_graph_from_adjacency(spark, adjacency)).localCheckpoint(
        eager=True
    )
    seeds = spark.createDataFrame([(d("m1.com"), 1.0)], ["url", "score"])
    return crawl(spark, seeds, pages=pages, config=CrawlConfig(max_ticks=6))


def test_gauges_match_final_crawl_state(spark, crawl_result):
    res = crawl_result
    gauges = crawler_metrics(res.stats)
    assert len(gauges) == len(res.stats) > 0
    final = gauges[-1]

    state = res.crawl_state
    n_total = state.count()
    n_fetched = state.filter(
        F.col("status").isin("FETCHED", "FETCHED_SYNTHETIC")
    ).count()
    n_queue = state.filter(
        F.col("status").isin("UNFETCHED", "QUEUED", "FETCHING")
    ).count()

    assert final[GAUGE_URLS_ACTIVE] == n_total
    assert final[GAUGE_URLS_IN_FETCH_QUEUE] == n_queue
    assert final[COUNTER_PAGES_PARSED] == n_fetched
    assert final[COUNTER_PAGES_FAILEDPARSE] == 0
    assert unique_plds(state) == 2  # m1.com + m2.com

    # in-flight is the per-tick batch: non-negative (the loop exits the
    # tick the frontier drains, so the LAST batch is the final fetch set)
    assert all(g[GAUGE_URLS_IN_FLIGHT] >= 0 for g in gauges)
    # batches sum to the total attempted outcomes (FETCHED + 404 rows)
    n_attempted = state.filter(
        ~F.col("status").isin("UNFETCHED", "QUEUED", "FETCHING")
        & ~F.col("status").startswith("SKIPPED")
        & (F.col("status") != "ERROR_INVALID_URL")
    ).count()
    assert sum(g[GAUGE_URLS_IN_FLIGHT] for g in gauges) == n_attempted


def test_rate_gauge_uses_tick_seconds(crawl_result):
    res = crawl_result
    secs = [2.0] * len(res.stats)
    gauges = crawler_metrics(res.stats, tick_secs=secs)
    total_rate = sum(g[GAUGE_URLS_FETCHED_PER_SECOND] for g in gauges)
    n_fetched = gauges[-1][COUNTER_PAGES_PARSED]
    assert total_rate == pytest.approx(n_fetched / 2.0)
    # without tick seconds the rate gauge is absent, never fabricated
    assert GAUGE_URLS_FETCHED_PER_SECOND not in crawler_metrics(res.stats)[0]
