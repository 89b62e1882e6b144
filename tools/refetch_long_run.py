"""Continuous re-crawl (refetch) long-run: flat per-tick cost under the
always-on operating profile.

The reference's real deployment never terminates: UrlDBFunction's
per-key timers re-emit tracked URLs when their refetch interval
arrives (UrlDBFunction.java:333-351), so the steady state is "every
tick re-fetches the slice of the URL DB that just came due" — forever.
This harness runs that profile on the batch loop: a small fully-
crawlable graph, `refetch=True` with an interval a few ticks long, the
LSM state log as the backend, for N ticks. After the initial discovery
phase every tick is a refetch tick; the claim under test is that
per-tick cost stays FLAT over hundreds of ticks (no lineage growth, no
state-table growth, no per-tick cost proportional to ticks-so-far).

Tick boundaries are measured from the per-tick delta-write timestamps
(the state_log_ab methodology — no clock monkeypatching).

Usage: python tools/refetch_long_run.py [ticks]
Paste the summary into SCALE.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import flink_crawler_spark.operators.state_table as st
from flink_crawler_spark.plans.crawl_loop import CrawlConfig, crawl
from flink_crawler_spark.session import get_spark
from flink_crawler_spark.sources.fixtures import (
    render_pages,
    web_graph_from_adjacency,
)

N_PAGES = 32
DOMAINS = 4
TICK_MS = 100_000
REFETCH_TICKS = 3  # pages come due again every 3 ticks


def ring_graph(spark):
    urls = [f"http://d{i % DOMAINS}.com/p{i}" for i in range(N_PAGES)]
    adjacency = {u: [urls[(i + 1) % N_PAGES]] for i, u in enumerate(urls)}
    return render_pages(web_graph_from_adjacency(spark, adjacency)).localCheckpoint(
        eager=True
    ), urls[0]


def main():
    ticks = int(sys.argv[1]) if len(sys.argv) > 1 else 150
    spark = get_spark("refetch-long-run")
    spark.sparkContext.setLogLevel("ERROR")
    buckets = int(spark.conf.get("spark.sql.shuffle.partitions"))
    pages, seed_url = ring_graph(spark)
    table = "refetch_long_run_state"
    for t_ in list(spark.catalog.listTables()):
        if t_.name.startswith(table):
            spark.sql(f"DROP TABLE IF EXISTS {t_.name}")

    writes: list[float] = []
    orig_save = st.save_bucketed_state

    def spy_save(state, tbl, **kw):
        orig_save(state, tbl, **kw)
        if "__delta_t" in tbl:
            writes.append(time.time())

    seeds = spark.createDataFrame([(seed_url, 1.0)], ["url", "score"])
    cfg = CrawlConfig(
        max_ticks=ticks,
        max_duration_sec=36_000,
        max_queue_size=None,
        tick_ms=TICK_MS,
        refetch=True,
        refetch_interval_ms=REFETCH_TICKS * TICK_MS,
        state_table=table,
        state_buckets=buckets,
        state_log_every=10,
        collect_stats=True,
    )
    st.save_bucketed_state = spy_save
    t0 = time.time()
    try:
        res = crawl(spark, seeds, pages=pages, config=cfg)
    finally:
        st.save_bucketed_state = orig_save
    t_end = time.time()

    bounds = [t0] + writes + [t_end]
    tt = [b - a for a, b in zip(bounds, bounds[1:])]
    n = len(tt)
    k = max(n // 5, 1)
    first = sum(tt[:k]) / k
    last = sum(tt[-k:]) / k
    state = st.read_state_log(spark, table)
    n_rows = state.count()
    fetched = state.filter("status = 'FETCHED'").count()
    # refetch ticks per page: every page refetched ~ (ticks - discovery) / 3
    print(
        f"refetch long-run: ticks={res.ticks} wall={t_end - t0:.1f}s "
        f"mean={(t_end - t0) / max(res.ticks, 1):.2f}s/tick "
        f"first20%={first:.2f}s last20%={last:.2f}s ratio={last / max(first, 1e-9):.2f}"
    )
    print(
        f"  state_rows={n_rows} fetched={fetched} "
        f"(graph={N_PAGES} pages / {DOMAINS} domains, interval={REFETCH_TICKS} ticks, "
        f"state_log_every=10)"
    )
    stats_fetched = [s["status_counts"].get("FETCHED", 0) for s in res.stats[-10:]]
    print(f"  FETCHED count over final 10 ticks (stable == steady-state): {stats_fetched}")
    for t_ in list(spark.catalog.listTables()):
        if t_.name.startswith(table):
            spark.sql(f"DROP TABLE IF EXISTS {t_.name}")
    spark.stop()


if __name__ == "__main__":
    main()
