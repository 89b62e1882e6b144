"""Domain-score feedback loop: moving-average quotas focus the crawl."""

from __future__ import annotations

from flink_crawler_spark.operators.parse import title_scorer
from flink_crawler_spark.plans.crawl_loop import CrawlConfig, crawl
from flink_crawler_spark.sources.fixtures import render_pages, web_graph_from_adjacency


def test_budget_splits_by_domain_moving_average(spark):
    adjacency = {"http://good.com/": [f"http://good.com/p{i}" for i in range(8)]}
    adjacency.update({f"http://good.com/p{i}": [] for i in range(8)})
    adjacency["http://bad.com/"] = [f"http://bad.com/p{i}" for i in range(8)]
    adjacency.update({f"http://bad.com/p{i}": [] for i in range(8)})
    scores = {p: (5.0 if "good" in p else 0.5) for p in adjacency}
    pages = render_pages(web_graph_from_adjacency(spark, adjacency, scores)).localCheckpoint(
        eager=True
    )
    seeds = spark.createDataFrame(
        [("http://good.com/", 1.0), ("http://bad.com/", 1.0)], ["url", "score"]
    )
    res = crawl(
        spark,
        seeds,
        pages=pages,
        scorer=title_scorer,
        config=CrawlConfig(max_ticks=2, trace=False, domain_score_budget=6),
    )
    fetched = {"good.com": 0, "bad.com": 0}
    for r in res.crawl_state.collect():
        if r["status"] == "FETCHED" and r["url"] != f"http://{r['pld']}/":
            fetched[r["pld"]] += 1
    # tick 2 budget=6 split by moving-average scores 5.0 vs 0.5:
    # good gets round(6*5/5.5)=5, bad gets the min-quota 1
    assert fetched["good.com"] == 5
    assert fetched["bad.com"] == 1


def test_no_budget_keeps_uniform_frontier(spark):
    adjacency = {"http://a.com/": ["http://a.com/x"], "http://a.com/x": []}
    pages = render_pages(web_graph_from_adjacency(spark, adjacency)).localCheckpoint(eager=True)
    seeds = spark.createDataFrame([("http://a.com/", 1.0)], ["url", "score"])
    res = crawl(spark, seeds, pages=pages, config=CrawlConfig(max_ticks=3, trace=False))
    st = {r["url"]: r["status"] for r in res.crawl_state.collect()}
    assert st == {"http://a.com/": "FETCHED", "http://a.com/x": "FETCHED"}
