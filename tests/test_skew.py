"""Hot-key (skewed-PLD) stress properties for the crawl core.

The reference gets per-domain isolation for free from ``keyBy(pld)``
(topology/CrawlTopologyBuilder.java:365-377); the set-based engine must
PROVE it under skew. These properties drive frontiers where one domain
holds >=90% of all URLs — the shape a viral site or a link farm
produces at crawl scale — and assert:

  * the per-domain cap bounds the hot domain's admission
    (operators/frontier.py select_frontier's window cap — the
    MAX_IN_FLIGHT_URLS=100 analogue, UrlDBFunction.java:54), and cold
    domains are never crowded out by the hot one;
  * score-proportional quotas bound admission in budget mode
    (domain_quotas, UrlDBFunction.java:333-351 timer policy);
  * politeness slot spacing stays exact on the hot domain (one slot
    per crawl delay, overflow -> SKIPPED_CRAWLDELAY);
  * the hot domain still lands in EXACTLY ONE fetch task
    (politeness is enforced by sequential in-task fetching — split a
    domain and the delay guarantee silently breaks).

AQE note (SCALE.md "skew"): the merge aggregations key on *url*, not
pld, so a hot DOMAIN does not make a hot REDUCER key; the per-pld
windows here are the only pld-keyed exchanges, and their skew is
bounded by the admission caps these tests pin.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

HOT = "hot.com"
N_COLD = 5

# (is_hot-biased pld pick, path, score): ~92% of draws land on HOT
skew_row_st = st.tuples(
    st.integers(min_value=0, max_value=59).map(
        lambda i: HOT if i < 55 else f"cold{i % N_COLD}.com"
    ),
    st.integers(min_value=0, max_value=10**4),
    st.integers(min_value=0, max_value=100),
)


def _frontier(spark, rows, *, status="UNFETCHED"):
    seen, data = set(), []
    for pld, path, score in rows:
        url = f"http://{pld}/p/{path}"
        if url in seen:
            continue
        seen.add(url)
        data.append((url, pld, status, 0, float(score), 0))
    return spark.createDataFrame(
        data,
        "url string, pld string, status string, status_time long, "
        "score double, next_fetch_time long",
    )


@given(st.lists(skew_row_st, min_size=30, max_size=80))
@settings(max_examples=6, deadline=None)
def test_hot_pld_admission_capped(spark, rows):
    from flink_crawler_spark.operators.frontier import select_frontier

    state = _frontier(spark, rows)
    eligible = {r["pld"]: 0 for r in state.collect()}
    for r in state.collect():
        eligible[r["pld"]] += 1
    cap = 5
    out = select_frontier(
        state, now_ms=10, max_queue_size=None, max_per_domain=cap
    ).collect()
    per = {}
    for r in out:
        per[r["pld"]] = per.get(r["pld"], 0) + 1
    # hot domain bounded by the cap, never by less while it has supply
    for pld, n in per.items():
        assert n <= cap, f"{pld} over cap: {n}"
        assert n == min(cap, eligible[pld])
    # cold domains are NOT crowded out by the hot one (no global
    # resource is consumed by hot admission in unbounded-queue mode)
    for pld, supply in eligible.items():
        assert per.get(pld, 0) == min(cap, supply)


@given(st.lists(skew_row_st, min_size=30, max_size=80))
@settings(max_examples=6, deadline=None)
def test_hot_pld_quota_bounds_budget_mode(spark, rows):
    from flink_crawler_spark.operators.frontier import (
        domain_quotas,
        select_frontier_with_quotas,
    )

    state = _frontier(spark, rows)
    plds = sorted({r["pld"] for r in state.collect()})
    # equal domain scores: the hot domain gets NO extra quota from
    # holding more URLs — admission follows score share, not row share
    scores = spark.createDataFrame([(p, 1.0) for p in plds], ["pld", "score"])
    budget = 8
    quota = {r["pld"]: r["quota"] for r in domain_quotas(scores, budget=budget).collect()}
    out = select_frontier_with_quotas(
        state, scores, now_ms=10, budget=budget
    ).collect()
    per = {}
    for r in out:
        per[r["pld"]] = per.get(r["pld"], 0) + 1
    for pld, n in per.items():
        assert n <= quota[pld], f"{pld}: admitted {n} > quota {quota[pld]}"


@given(st.lists(skew_row_st, min_size=30, max_size=80))
@settings(max_examples=6, deadline=None)
def test_hot_pld_politeness_spacing_exact(spark, rows):
    from flink_crawler_spark.operators.fetch import politeness_split

    now, tick, delay = 1_000_000, 30_000, 10_000
    frontier = _frontier(spark, rows).withColumn(
        "crawl_delay_ms", F.lit(delay).cast("long")
    )
    out = politeness_split(frontier, now_ms=now, tick_ms=tick).collect()
    by_pld = {}
    for r in out:
        by_pld.setdefault(r["pld"], []).append(r)
    max_per_tick = tick // delay + (1 if tick % delay else 0)
    for pld, group in by_pld.items():
        fetched = [r for r in group if r["route"] == "fetch"]
        # however hot the domain, at most floor(tick/delay)+1 slots fire
        assert len(fetched) <= max_per_tick
        times = sorted(r["fetch_time"] for r in group)
        assert times[0] == now
        assert all(b - a == delay for a, b in zip(times, times[1:]))
        for r in group:
            assert (r["route"] == "fetch") == (r["fetch_time"] < now + tick)
    # the hot domain's overflow is observation-only: SKIPPED rows carry
    # their slot as next_fetch_time (they re-enter a later frontier)
    hot_skipped = [r for r in by_pld.get(HOT, []) if r["route"] == "crawldelay"]
    for r in hot_skipped:
        assert r["fetch_time"] >= now + tick


@given(st.lists(skew_row_st, min_size=25, max_size=50))
@settings(max_examples=4, deadline=None)
def test_hot_pld_never_splits_across_fetch_tasks(spark, rows):
    from flink_crawler_spark.operators.fetch import http_fetch, politeness_split

    now = 1_000_000
    frontier = politeness_split(
        _frontier(spark, rows).withColumn("crawl_delay_ms", F.lit(1000).cast("long")),
        now_ms=now,
        tick_ms=10**9,
    )

    def fetcher(url):
        from pyspark import TaskContext

        return (200, str(TaskContext.get().partitionId()).encode(), "text/html")

    out = http_fetch(frontier, fetcher=fetcher, now_ms=now).collect()
    parts = {}
    for r in out:
        parts.setdefault(r["pld"], set()).add(int(bytes(r["content"]).decode()))
    for pld, pids in parts.items():
        assert len(pids) == 1, f"domain {pld} split across tasks {pids}"
