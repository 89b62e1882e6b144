"""Durable crawl state: interrupt + resume equals an uninterrupted run."""

from __future__ import annotations

import os

from flink_crawler_spark.plans.crawl_loop import CrawlConfig, crawl
from flink_crawler_spark.sources.fixtures import render_pages, web_graph_from_adjacency


def chain_graph(spark, n=5):
    adjacency = {f"http://c.com/p{i}": [f"http://c.com/p{i+1}"] for i in range(n)}
    adjacency[f"http://c.com/p{n}"] = []
    return render_pages(web_graph_from_adjacency(spark, adjacency)).localCheckpoint(eager=True)


def state_of(res):
    return sorted((r["url"], r["status"], r["score"]) for r in res.crawl_state.collect())


def test_resume_reproduces_uninterrupted_run(spark, tmp_path):
    pages = chain_graph(spark)
    seeds = spark.createDataFrame([("http://c.com/p0", 1.0)], ["url", "score"])

    # uninterrupted reference run (chain of 6 pages -> 7 ticks max)
    full = crawl(spark, seeds, pages=pages, config=CrawlConfig(max_ticks=8, trace=False))

    # interrupted run: stop after 2 ticks, then resume from disk
    sd = str(tmp_path / "state")
    os.makedirs(sd)
    part1 = crawl(
        spark, seeds, pages=pages,
        config=CrawlConfig(max_ticks=2, trace=False, state_dir=sd),
    )
    assert part1.ticks == 2
    assert os.path.exists(os.path.join(sd, "_LATEST"))

    part2 = crawl(
        spark, seeds, pages=pages,  # seeds ignored on resume
        config=CrawlConfig(max_ticks=8, trace=False, state_dir=sd),
    )
    assert part2.ticks > 2  # picked up at tick 3, not from scratch
    assert state_of(part2) == state_of(full)


def test_resume_skips_seeding(spark, tmp_path):
    pages = chain_graph(spark, n=2)
    seeds = spark.createDataFrame([("http://c.com/p0", 1.0)], ["url", "score"])
    sd = str(tmp_path / "state2")
    os.makedirs(sd)
    crawl(spark, seeds, pages=pages, config=CrawlConfig(max_ticks=1, trace=False, state_dir=sd))

    # resume with DIFFERENT seeds — they must not re-enter (state wins)
    other = spark.createDataFrame([("http://c.com/other", 1.0)], ["url", "score"])
    res = crawl(spark, other, pages=pages, config=CrawlConfig(max_ticks=6, trace=False, state_dir=sd))
    urls = {r["url"] for r in res.crawl_state.collect()}
    assert "http://c.com/other" not in urls
    assert "http://c.com/p0" in urls


def test_checkpoint_retention_sweeps_old_snapshots(spark, tmp_path):
    """keep_checkpoints retains only the newest N state_t* dirs while
    _LATEST keeps pointing at a live snapshot; resume still works."""
    pages = chain_graph(spark)
    seeds = spark.createDataFrame([("http://c.com/p0", 1.0)], ["url", "score"])
    sd = str(tmp_path / "state")
    os.makedirs(sd)
    res = crawl(
        spark, seeds, pages=pages,
        config=CrawlConfig(max_ticks=8, trace=False, state_dir=sd, keep_checkpoints=2),
    )
    snaps = sorted(d for d in os.listdir(sd) if d.startswith("state_t"))
    assert len(snaps) == 2, snaps
    with open(os.path.join(sd, "_LATEST")) as fh:
        latest = int(fh.read().split()[0])
    assert f"state_t{latest}" in snaps  # marker points at a kept snapshot
    # resume from the swept dir reproduces the finished state
    again = crawl(
        spark, seeds, pages=pages,
        config=CrawlConfig(max_ticks=10, trace=False, state_dir=sd, keep_checkpoints=2),
    )
    assert state_of(again) == state_of(res)


def test_keep_all_checkpoints_when_disabled(spark, tmp_path):
    pages = chain_graph(spark)
    seeds = spark.createDataFrame([("http://c.com/p0", 1.0)], ["url", "score"])
    sd = str(tmp_path / "state")
    os.makedirs(sd)
    res = crawl(
        spark, seeds, pages=pages,
        config=CrawlConfig(max_ticks=4, trace=False, state_dir=sd, keep_checkpoints=None),
    )
    snaps = [d for d in os.listdir(sd) if d.startswith("state_t")]
    assert len(snaps) == min(res.ticks, 4)
