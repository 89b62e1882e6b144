"""Wave-12 operators: invariants beyond the DuckDB value oracles."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from flink_crawler_spark.queries.base import t
from flink_crawler_spark.queries.pipelineq11 import (
    FL_K,
    RFM_Q,
    facility_location_select,
    rfm_user_segments,
    stream_incremental_mv,
)


def test_facility_greedy_is_submodular(spark, sf_dir):
    rows = sorted(
        facility_location_select(spark, sf_dir).collect(),
        key=lambda r: r["sel_rank"],
    )
    assert len(rows) == FL_K
    assert len({r["vec_id"] for r in rows}) == FL_K  # no re-picks
    gains = [r["gain"] for r in rows]
    # greedy on a submodular objective has non-increasing marginal gains
    for a, b in zip(gains, gains[1:]):
        assert b <= a + 1e-9, gains
    # coverage is the running sum of gains (F(empty) = 0)
    run = 0.0
    for r in rows:
        run += r["gain"]
        assert abs(r["coverage"] - run) < 1e-6, (r, run)


def test_stream_mv_equals_batch(spark, sf_dir):
    mv = stream_incremental_mv(spark, sf_dir)
    ym = (F.year("o_orderdate") * 100 + F.month("o_orderdate")).cast("long").alias(
        "ym"
    )
    full = (
        t(spark, sf_dir, "orders")
        .groupBy("o_custkey", ym)
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.round(F.col("o_totalprice"), 6).cast("decimal(28,6)"))
            .cast("double")
            .alias("revenue"),
        )
    )
    assert mv.exceptAll(full).count() == 0
    assert full.exceptAll(mv).count() == 0


def test_rfm_quintiles_are_balanced(spark, sf_dir):
    rows = rfm_user_segments(spark, sf_dir).collect()
    n_users = t(spark, sf_dir, "events").select("user_id").distinct().count()
    assert sum(r["n_users"] for r in rows) == n_users
    for dim in ("r_q", "f_q", "m_q"):
        marg = Counter()
        for r in rows:
            assert 0 <= r[dim] < RFM_Q, r
            marg[r[dim]] += r["n_users"]
        lo, hi = n_users // RFM_Q, n_users // RFM_Q + 1
        for q in range(RFM_Q):
            assert lo <= marg[q] <= hi, (dim, dict(marg))
