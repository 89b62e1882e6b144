"""Wave-10 operators: invariants beyond the DuckDB value oracles."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_crawler_spark.queries.base import t
from flink_crawler_spark.queries.pipelineq9 import (
    BM25_TERMS,
    BM25_TOPK,
    MAX_REDIRECT_HOPS,
    bm25_search_topk,
    incremental_mv_refresh,
    quality_dedup_calibration,
    redirect_chain_resolve,
)


def test_bm25_topk_ordered_and_bounded(spark, sf_dir):
    rows = bm25_search_topk(spark, sf_dir).collect()
    assert 0 < len(rows) <= BM25_TOPK
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    for r in rows:
        assert 1 <= r["n_hit_terms"] <= len(BM25_TERMS), r
        assert r["score"] > 0, r


def test_redirect_chains_terminate_correctly(spark, sf_dir):
    rows = redirect_chain_resolve(spark, sf_dir).collect()
    n_parts = t(spark, sf_dir, "part").count()
    assert len(rows) == n_parts  # every URL resolves to exactly one row
    for r in rows:
        assert 0 <= r["hops"] <= MAX_REDIRECT_HOPS, r
        if r["status"] == "TOO_MANY_REDIRECTS":
            # the cap is the ONLY way to leave the map unresolved
            assert r["hops"] == MAX_REDIRECT_HOPS, r
        else:
            assert r["status"] == "RESOLVED", r
    # a non-degenerate map actually chains somewhere
    assert any(r["hops"] > 0 for r in rows)


def test_incremental_merge_equals_full_recompute(spark, sf_dir):
    merged = incremental_mv_refresh(spark, sf_dir)
    full = (
        t(spark, sf_dir, "orders")
        .groupBy(
            "o_custkey",
            (F.year("o_orderdate") * 100 + F.month("o_orderdate"))
            .cast("long")
            .alias("ym"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.round(F.col("o_totalprice"), 6).cast("decimal(28,6)"))
            .cast("double")
            .alias("revenue"),
        )
    )
    assert merged.exceptAll(full).count() == 0
    assert full.exceptAll(merged).count() == 0


def test_calibration_covers_corpus_and_counts_dup_mass(spark, sf_dir):
    from flink_crawler_spark.queries.dedupq import near_dup_clusters

    rows = quality_dedup_calibration(spark, sf_dir).collect()
    n_docs = t(spark, sf_dir, "documents").count()
    assert sum(r["n_docs"] for r in rows) == n_docs
    assert {r["decile"] for r in rows} <= set(range(10))
    cl = near_dup_clusters(spark, sf_dir)
    fam = cl.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("c"))
    expected_dups = (
        cl.join(fam, "cluster_id").filter(F.col("c") >= 2).count()
    )
    assert sum(r["n_dup_members"] for r in rows) == expected_dups
    for r in rows:
        assert 0.0 <= r["dup_rate"] <= 1.0, r
