"""Long-crawl flat-cost A/B: compact_history on vs off.

The reference runs ONE always-on streaming job for the crawl
(CrawlTopologyBuilder.java:250-466); the batch-loop engine must
therefore sustain 1,000+ ticks with flat per-tick cost. Without history
compaction, the budget-mode moving-average plan re-unions every tick's
score frame (O(ticks^2) analysis + executor-storage growth); with
compaction each tick folds history into small checkpointed frames and
per-tick cost stays flat.

Fixture: a chain web graph across D domains (page i links to page i+1),
domain_score_budget=D. Discovery is serial — each fetch reveals exactly
one new URL — so the crawl stays busy for as many ticks as there are
pages, which is precisely what a flat-cost measurement needs.

Usage: python tools/long_crawl_ab.py [ticks] [--no-ab]
Writes per-tick timings; paste the summary into SCALE.md.
"""

from __future__ import annotations

import sys
import time

from flink_crawler_spark.plans.crawl_loop import CrawlConfig, crawl
from flink_crawler_spark.session import get_spark
from flink_crawler_spark.sources.fixtures import (
    render_pages,
    web_graph_from_adjacency,
)


def chain_graph(spark, n_pages: int, n_domains: int):
    urls = [f"http://d{i % n_domains}.com/p{i}" for i in range(n_pages)]
    adjacency = {u: [urls[i + 1]] if i + 1 < n_pages else [] for i, u in enumerate(urls)}
    return render_pages(web_graph_from_adjacency(spark, adjacency)).localCheckpoint(
        eager=True
    ), urls[0]


def timed_crawl(spark, pages, seed_url, *, ticks: int, compact: bool, domains: int):
    import flink_crawler_spark.plans.crawl_loop as cl

    seeds = spark.createDataFrame([(seed_url, 1.0)], ["url", "score"])
    cfg = CrawlConfig(
        max_ticks=ticks,
        domain_score_budget=domains,
        compact_history=compact,
        max_duration_sec=36000,
        max_queue_size=None,
    )
    marks: list[float] = []
    real = time.time

    def spy():
        marks.append(real())
        return marks[-1]

    cl.time.time = spy  # tick boundary = loop-condition evaluation
    t0 = real()
    try:
        res = crawl(spark, seeds, pages=pages, config=cfg)
    finally:
        cl.time.time = real
    total = real() - t0
    tick_times = [b - a for a, b in zip(marks[1:-1], marks[2:])]
    return res, total, tick_times


def summarize(label, res, total, tick_times):
    n = len(tick_times)
    k = max(n // 5, 1)
    first = sum(tick_times[:k]) / k
    last = sum(tick_times[-k:]) / k
    print(
        f"{label}: ticks={res.ticks} total={total:.1f}s "
        f"mean={total / max(res.ticks, 1):.2f}s/tick "
        f"first-20%={first:.2f}s last-20%={last:.2f}s ratio={last / max(first, 1e-9):.2f}"
    )


def main():
    ticks = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    ab = "--no-ab" not in sys.argv
    domains = 4
    spark = get_spark("long-crawl-ab")
    spark.sparkContext.setLogLevel("ERROR")
    pages, seed = chain_graph(spark, n_pages=ticks * domains + domains, n_domains=domains)

    res, total, tt = timed_crawl(
        spark, pages, seed, ticks=ticks, compact=True, domains=domains
    )
    summarize(f"compact=True  ({ticks} ticks)", res, total, tt)

    if ab:
        # the non-compact arm grows per-tick — cap it lower
        nt = min(ticks, 40)
        res2, total2, tt2 = timed_crawl(
            spark, pages, seed, ticks=nt, compact=False, domains=domains
        )
        summarize(f"compact=False ({nt} ticks)", res2, total2, tt2)
    spark.stop()


if __name__ == "__main__":
    main()
