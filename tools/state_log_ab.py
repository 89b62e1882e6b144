"""LSM state-log A/B: per-tick write cost and read amplification over a
long crawl horizon.

`CrawlConfig.state_log_every` claims: per-tick WRITES are O(delta) (one
small bucketed delta table per tick instead of rewriting the whole
state), reads are base ⋈ merge(pending deltas) with amplification
bounded by the compaction interval, and the full rewrite is amortized
1/compact_every. This harness measures all three against the default
table mode (full rewrite per tick), on a state table ballasted with
far-future FETCHED rows so state >> delta — the 100 TB shape, where the
per-tick delta is a few rows but the URL DB holds (here) 200k.

Arms: state_log_every in {None, 5, 20}, same chain-graph crawl.
Recorded per arm: per-tick wall time (flatness = last-20%/first-20%),
bytes+rows written per tick split into delta writes vs full rewrites,
and mean tick time by position within the compaction interval (read
amplification as deltas accumulate).

Usage: python tools/state_log_ab.py [ticks] [ballast_rows]
Paste the summary into SCALE.md.

Reference anchor: the always-on operating mode,
CrawlTopologyBuilder.java:250-466.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import flink_crawler_spark.operators.state_table as st
from flink_crawler_spark.plans.crawl_loop import CrawlConfig, crawl
from flink_crawler_spark.session import get_spark
from flink_crawler_spark.sources.fixtures import (
    render_pages,
    web_graph_from_adjacency,
)

DOMAINS = 4


def chain_graph(spark, n_pages: int):
    urls = [f"http://d{i % DOMAINS}.com/p{i}" for i in range(n_pages)]
    adjacency = {u: [urls[i + 1]] if i + 1 < n_pages else [] for i, u in enumerate(urls)}
    return render_pages(web_graph_from_adjacency(spark, adjacency)).localCheckpoint(
        eager=True
    ), urls[0]


def dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return total


def drop_all(spark, table: str) -> None:
    import glob
    import shutil

    for r in spark.sql(f"SHOW TABLES LIKE '{table}*'").collect():
        spark.sql(f"DROP TABLE IF EXISTS {r['tableName']}")
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for d in glob.glob(f"{warehouse}/{table}*"):
        shutil.rmtree(d, ignore_errors=True)


def seed_table(spark, table: str, seed_url: str, ballast: int, buckets: int) -> None:
    """State table = chain head (UNFETCHED) + `ballast` far-future
    FETCHED rows that never enter the frontier: state >> per-tick delta."""
    start_ms = 1_700_000_000_000
    far = start_ms + 10**12
    b = spark.range(ballast).select(
        F.concat(F.lit("http://ballast"), (F.col("id") % 97).cast("string"),
                 F.lit(".com/x"), F.col("id").cast("string")).alias("url"),
        F.concat(F.lit("ballast"), (F.col("id") % 97).cast("string"),
                 F.lit(".com")).alias("pld"),
        F.lit("FETCHED").alias("status"),
        F.lit(start_ms).cast("long").alias("status_time"),
        F.lit(1.0).alias("score"),
        F.lit(far).cast("long").alias("next_fetch_time"),
    )
    head = spark.createDataFrame(
        [(seed_url, f"d0.com", "UNFETCHED", start_ms, 1.0, start_ms)],
        "url string, pld string, status string, status_time long, score double, next_fetch_time long",
    )
    st.save_bucketed_state(b.unionByName(head), table, buckets=buckets)
    st.set_state_tick(spark, table, 0)


def run_arm(spark, pages, seed_url, *, ticks: int, log_every, ballast: int,
            buckets: int):
    table = f"slog_ab_{'none' if log_every is None else log_every}"
    drop_all(spark, table)
    seed_table(spark, table, seed_url, ballast, buckets)
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")

    # Tick boundaries come from the per-tick state write (each tick
    # writes exactly one delta table in log mode / one staging table in
    # the default mode) — no global time-module monkeypatching, which
    # would intercept every driver-side time.time() caller and shift
    # boundaries with spurious marks. A final mark after crawl() closes
    # the last interval, so the terminal (often compaction-boundary)
    # tick is included in the profile.
    writes: list[tuple[str, int, float]] = []  # (table written, bytes, t_end)
    orig_save = st.save_bucketed_state

    def spy_save(state, tbl, *, buckets=64):
        orig_save(state, tbl, buckets=buckets)
        writes.append((tbl, dir_bytes(os.path.join(warehouse, tbl)), time.time()))

    seeds = spark.createDataFrame([(seed_url, 1.0)], ["url", "score"])
    cfg = CrawlConfig(
        max_ticks=ticks,
        state_table=table,
        state_buckets=buckets,
        state_log_every=log_every,
        max_duration_sec=36000,
        max_queue_size=None,
        trace=False,
        collect_stats=False,
    )
    st.save_bucketed_state = spy_save
    t0 = time.time()
    try:
        res = crawl(spark, seeds, pages=pages, config=cfg)
    finally:
        st.save_bucketed_state = orig_save
    t_end = time.time()
    total = t_end - t0
    # per-tick write timestamps: the delta writes (log mode) or the
    # staging writes (default mode); compaction/staging writes in log
    # mode belong to the tick that triggered them and are not ticks
    per_tick = [
        w[2]
        for w in writes
        if ("__delta_t" in w[0]) == (log_every is not None)
    ]
    bounds = [t0] + per_tick + [t_end]
    tick_times = [b_ - a_ for a_, b_ in zip(bounds, bounds[1:])]
    n_rows = spark.table(table).count() if spark.catalog.tableExists(table) else -1
    drop_all(spark, table)
    return res, total, tick_times, writes, n_rows


def summarize(label, res, total, tick_times, writes, n_rows, log_every):
    n = len(tick_times)
    k = max(n // 5, 1)
    first = sum(tick_times[:k]) / k
    last = sum(tick_times[-k:]) / k
    deltas = [(w[0], w[1]) for w in writes if "__delta_t" in w[0]]
    fulls = [(w[0], w[1]) for w in writes if "__delta_t" not in w[0]]
    d_mb = sum(b for _, b in deltas) / 1e6
    f_mb = sum(b for _, b in fulls) / 1e6
    print(f"{label}: ticks={res.ticks} state_rows={n_rows} total={total:.1f}s "
          f"mean={total / max(res.ticks, 1):.2f}s/tick "
          f"first20%={first:.2f}s last20%={last:.2f}s ratio={last / max(first, 1e-9):.2f}")
    print(f"    writes: {len(deltas)} delta ({d_mb:.2f} MB, "
          f"mean {d_mb * 1000 / max(len(deltas), 1):.1f} KB) + "
          f"{len(fulls)} full ({f_mb:.1f} MB, "
          f"mean {f_mb / max(len(fulls), 1):.2f} MB) = {d_mb + f_mb:.1f} MB total")
    if log_every:
        # read amplification: mean tick time by #pending deltas at tick
        # start (tick t carries (t-1) % log_every uncompacted deltas)
        by_pos: dict[int, list[float]] = {}
        for i, tt in enumerate(tick_times):
            by_pos.setdefault(i % log_every, []).append(tt)
        prof = " ".join(
            f"p{p}={sum(v)/len(v):.2f}s" for p, v in sorted(by_pos.items())
        )
        print(f"    tick time by position in compaction interval: {prof}")


def main():
    ticks = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    ballast = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
    spark = get_spark("state-log-ab")
    spark.sparkContext.setLogLevel("ERROR")
    buckets = int(spark.conf.get("spark.sql.shuffle.partitions"))
    pages, seed = chain_graph(spark, n_pages=ticks * DOMAINS + DOMAINS)

    print(f"# state-log A/B: {ticks} ticks, ballast={ballast} rows, "
          f"buckets={buckets}")
    for log_every in (None, 5, 20):
        res, total, tt, writes, n_rows = run_arm(
            spark, pages, seed, ticks=ticks, log_every=log_every,
            ballast=ballast, buckets=buckets,
        )
        summarize(
            f"state_log_every={log_every}", res, total, tt, writes, n_rows,
            log_every,
        )
    spark.stop()


if __name__ == "__main__":
    main()
