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


def test_stupid_backoff_collapse_matches_per_position_bruteforce(spark, tmp_path):
    """The r8 collapse-then-score rewrite scores DISTINCT per-doc
    trigrams weighted by their own count; this pins its equivalence to
    the per-position definition on a corpus engineered so the weights
    actually exceed 1 (repeated trigrams inside one doc) — the case
    where a weighting bug would be invisible on naturally deduped text."""
    import math
    from collections import Counter

    docs = [
        (1, "x y x y x y"),        # trigram (x,y,x) occurs twice in-doc
        (2, "x y z"),
        (3, "aaa aaa aaa aaa"),    # (aaa,aaa,aaa) twice, all-same tokens
        (4, "q r"),                # <3 tokens: absent from the output
        (5, "x y x q"),
    ]
    path = str(tmp_path / "corpus")
    spark.createDataFrame(docs, "doc_id long, text string").write.parquet(
        path + "/documents.parquet"
    )
    out = {r["doc_id"]: r for r in stupid_backoff_score(spark, path).collect()}
    assert 4 not in out

    toks = {d: txt.split() for d, txt in docs}
    c3, c2, c1 = Counter(), Counter(), Counter()
    c3d, c2d, c1d = Counter(), Counter(), Counter()
    ntot = 0
    ndoc = Counter()
    for d, tk in toks.items():
        for i in range(2, len(tk)):
            c3[(tk[i - 2], tk[i - 1], tk[i])] += 1
            c3d[(d, tk[i - 2], tk[i - 1], tk[i])] += 1
        for i in range(1, len(tk)):
            c2[(tk[i - 1], tk[i])] += 1
            c2d[(d, tk[i - 1], tk[i])] += 1
        for w in tk:
            c1[w] += 1
            c1d[(d, w)] += 1
        ntot += len(tk)
        ndoc[d] = len(tk)
    for d, tk in toks.items():
        if len(tk) < 3:
            continue
        n_tri = n_bi = n_uni = 0
        ssum = 0.0
        for i in range(2, len(tk)):
            a, b, w = tk[i - 2], tk[i - 1], tk[i]
            t3 = c3[(a, b, w)] - c3d[(d, a, b, w)]
            t2ab = c2[(a, b)] - c2d[(d, a, b)]
            t2bw = c2[(b, w)] - c2d[(d, b, w)]
            t1b = c1[b] - c1d[(d, b)]
            t1w = c1[w] - c1d[(d, w)]
            npool = ntot - ndoc[d]
            if t3 > 0:
                n_tri += 1
                s = t3 / t2ab
            elif t2bw > 0:
                n_bi += 1
                s = 0.4 * t2bw / t1b
            else:
                n_uni += 1
                s = 0.16 * t1w / npool
            ssum += round(s, 12)
        r = out[d]
        assert r["n_scored"] == len(tk) - 2
        assert (r["n_tri_hits"], r["n_bi_backoffs"], r["n_uni_backoffs"]) == (
            n_tri,
            n_bi,
            n_uni,
        ), (d, r)
        assert math.isclose(
            r["score"], round(ssum / (len(tk) - 2), 9), rel_tol=0, abs_tol=1e-9
        ), (d, r["score"], ssum / (len(tk) - 2))


def test_bpe_pair_counts_weighted_by_word_frequency(spark, tmp_path):
    """bpe_merge_candidates collapses to DISTINCT words weighted by
    occurrence count (r8); pairs inside a repeated word — including a
    REPEATED pair inside one word like 'aaa' -> 'aa' x2 — must count
    once per occurrence, exactly as the per-occurrence definition."""
    from flink_crawler_spark.queries.textops2 import bpe_merge_candidates

    docs = [
        (1, "aaa aaa bc"),   # 'aa' appears 2 pairs x 2 occurrences = 4
        (2, "aaa bc bc"),    # +2 more 'aa'; 'bc' pair = 1 per occurrence
    ]
    path = str(tmp_path / "corpus")
    spark.createDataFrame(docs, "doc_id long, text string").write.parquet(
        path + "/documents.parquet"
    )
    got = {r["pair"]: r["n"] for r in bpe_merge_candidates(spark, path).collect()}
    assert got["aa"] == 6, got
    assert got["bc"] == 3, got
