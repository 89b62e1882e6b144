"""Wave-11 operators: invariants beyond the DuckDB value oracles."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_crawler_spark.queries.base import t
from flink_crawler_spark.queries.pipelineq10 import (
    BUDGET_TICK_MS,
    MAXSIM_QUERY_IDS,
    maxsim_label_retrieval,
    robots_crawl_delay_budget,
    temporal_split_embargo,
)


def test_maxsim_bounded_by_query_count(spark, sf_dir):
    rows = maxsim_label_retrieval(spark, sf_dir).collect()
    n_q = len(MAXSIM_QUERY_IDS)
    assert rows
    for r in rows:
        # each of the n_q max-cosines is in [-1, 1]
        assert -n_q - 1e-6 <= r["maxsim_score"] <= n_q + 1e-6, r
        assert r["n_members"] >= 1
    # a query vector's own label contains it -> that label's max cosine
    # for that query is exactly 1, so some label scores >= 1
    assert any(r["maxsim_score"] >= 1.0 - 1e-6 for r in rows)


def test_temporal_split_partitions_and_purge_shrinks(spark, sf_dir):
    rows = {r["split"]: r for r in temporal_split_embargo(spark, sf_dir).collect()}
    assert set(rows) == {"train", "embargo", "test", "test_purged"}
    total = t(spark, sf_dir, "events").count()
    assert (
        rows["train"]["n_rows"] + rows["embargo"]["n_rows"] + rows["test"]["n_rows"]
        == total
    )
    assert 0 < rows["test_purged"]["n_rows"] <= rows["test"]["n_rows"]
    # the purge must actually drop something on this dense corpus
    assert rows["test_purged"]["n_rows"] < rows["test"]["n_rows"]


def test_crawl_delay_budget_arithmetic(spark, sf_dir):
    rows = robots_crawl_delay_budget(spark, sf_dir).collect()
    n_nations = t(spark, sf_dir, "nation").count()
    assert len(rows) == n_nations
    for r in rows:
        p = BUDGET_TICK_MS // r["crawl_delay_ms"]
        assert r["pages_per_tick"] == p, r
        want = (r["n_queued"] + p - 1) // p
        assert r["ticks_to_drain"] == want, r
        # draining in ticks_to_drain ticks is feasible, one fewer is not
        assert r["ticks_to_drain"] * p >= r["n_queued"], r
        if r["n_queued"] > 0:
            assert (r["ticks_to_drain"] - 1) * p < r["n_queued"], r
