"""Wave-9 operators: invariants beyond the DuckDB value oracles."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_crawler_spark.functions.text import tokens_expr
from flink_crawler_spark.queries.base import t
from flink_crawler_spark.queries.pipelineq8 import (
    EMB_DIM,
    SAMPLE_K,
    embedding_int8_quantize,
    length_bucket_packing,
    stupid_backoff_score,
    systematic_pps_sample,
)


def test_pps_sample_is_exactly_k(spark, sf_dir):
    out = systematic_pps_sample(spark, sf_dir)
    agg = out.agg(
        F.sum("n_copies").alias("k"),
        F.sum((F.col("selected") != (F.col("n_copies") > 0)).cast("long")).alias("bad"),
        F.min("n_copies").alias("mn"),
    ).collect()[0]
    assert agg["k"] == SAMPLE_K, agg
    assert agg["bad"] == 0
    assert agg["mn"] >= 0


def test_pps_tape_is_a_partition_of_total_weight(spark, sf_dir):
    rows = systematic_pps_sample(spark, sf_dir).orderBy("cum_before").collect()
    cum = 0
    for r in rows:
        assert r["cum_before"] == cum, (r, cum)
        cum += r["w"]


def test_length_buckets_cover_and_global_dominates(spark, sf_dir):
    rows = length_bucket_packing(spark, sf_dir).collect()
    n_expected = (
        t(spark, sf_dir, "documents")
        .select(F.size(tokens_expr(F.col("text"))).alias("n"))
        .filter(F.col("n") > 0)
        .count()
    )
    assert sum(r["n_docs"] for r in rows) == n_expected
    assert {r["bucket"] for r in rows} <= set(range(10))
    for r in rows:
        # padding to the global max can never waste less than padding
        # to the bucket max, and waste ratios live in [0, 1)
        assert r["pad_waste_global"] >= r["pad_waste_bucketed"] - 1e-9, r
        assert 0.0 <= r["pad_waste_bucketed"] < 1.0, r
        assert r["min_tokens"] <= r["max_tokens"], r


def test_int8_quantize_error_bound_and_saturation(spark, sf_dir):
    rows = embedding_int8_quantize(spark, sf_dir).collect()
    assert len(rows) == EMB_DIM
    for r in rows:
        if r["maxabs"] > 0:
            # max per-element error is half a quantization step
            step_half = r["maxabs"] / 127.0 / 2.0
            assert r["mse"] <= step_half * step_half + 1e-9, r
            # the corpus max itself lands exactly on q = +/-127
            assert r["n_sat"] >= 1, r


def test_stupid_backoff_paths_partition_and_scores_bounded(spark, sf_dir):
    rows = stupid_backoff_score(spark, sf_dir).collect()
    assert rows
    saw_backoff = False
    for r in rows:
        assert (
            r["n_tri_hits"] + r["n_bi_backoffs"] + r["n_uni_backoffs"]
            == r["n_scored"]
        ), r
        # every branch's score is a ratio <= 1 (0.4/0.16-damped for
        # the backoff branches), so the mean is in (0, 1]
        assert 0.0 <= r["score"] <= 1.0 + 1e-9, r
        if r["n_bi_backoffs"] + r["n_uni_backoffs"] > 0:
            saw_backoff = True
    # leave-one-out must actually exercise the backoff path somewhere
    assert saw_backoff
