"""Wave-5 corpus-statistics operators: plan shapes + invariants.

Values are pinned by the DuckDB oracle gate; these tests pin the SCALE
claims (shuffle-freedom, bounded windows) and the mathematical
invariants that hold on any corpus.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from flink_crawler_spark.queries.pipelineq5 import (
    ccnet_bigram_nll,
    doc_entropy_score,
    filter_agreement_matrix,
    word_rank_curve,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_entropy_is_shuffle_free(spark, sf_dir):
    plan = _plan(doc_entropy_score(spark, sf_dir))
    assert "Exchange" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_entropy_invariants(spark, sf_dir):
    rows = doc_entropy_score(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_distinct"] <= r["n_tokens"]
        # 0 <= H <= ln(n_distinct), within rounding slack
        assert -1e-6 <= r["entropy"], r
        if r["n_distinct"] > 0:
            assert r["entropy"] <= math.log(r["n_distinct"]) + 1e-6, r
            assert 0.0 < r["ttr"] <= 1.0 + 1e-9


def test_entropy_known_values(spark):
    import os
    import tempfile

    d = spark.createDataFrame(
        [(0, "a a a a"), (1, "a b c d"), (2, "a a b b")],
        "doc_id long, text string",
    )
    tmp = tempfile.mkdtemp(prefix="fcs_ent_")
    d.write.mode("overwrite").parquet(os.path.join(tmp, "documents.parquet"))
    got = {r["doc_id"]: r for r in doc_entropy_score(spark, tmp).collect()}
    assert got[0]["entropy"] == 0.0 and got[0]["n_distinct"] == 1
    assert abs(got[1]["entropy"] - math.log(4)) < 1e-6  # uniform over 4
    assert abs(got[2]["entropy"] - math.log(2)) < 1e-6  # 2 runs of 2
    assert got[2]["ttr"] == 0.5


def test_agreement_matrix_consistency(spark, sf_dir):
    rows = filter_agreement_matrix(spark, sf_dir).collect()
    assert len(rows) == 6
    totals = {r["n_both_keep"] + r["n_both_drop"] + r["n_disagree"] for r in rows}
    assert len(totals) == 1  # every pair sums to the same doc count
    for r in rows:
        n = r["n_both_keep"] + r["n_both_drop"] + r["n_disagree"]
        agree = r["n_both_keep"] + r["n_both_drop"]
        assert abs(r["agreement"] - agree / n) < 1e-6


def test_word_rank_curve_monotone_and_bounded(spark, sf_dir):
    df = word_rank_curve(spark, sf_dir)
    plan = _plan(df)
    assert "TakeOrderedAndProject" in plan, plan  # never a global sort
    rows = sorted(df.collect(), key=lambda r: r["rank"])
    assert 0 < len(rows) <= 50
    cnts = [r["cnt"] for r in rows]
    assert cnts == sorted(cnts, reverse=True)
    cums = [r["cum_share"] for r in rows]
    assert all(b >= a - 1e-9 for a, b in zip(cums, cums[1:]))
    assert cums[-1] <= 1.0 + 1e-6


def test_bigram_nll_positive_and_covering(spark, sf_dir):
    rows = ccnet_bigram_nll(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # smoothed probabilities are < 1, so -ln p > 0
        assert r["avg_nll"] > 0.0
        assert r["n_bigrams"] >= 1
