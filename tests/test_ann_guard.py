"""Bucketed-ANN candidate-path guards for the pair-mining queries.

Round-8 verdict task: `margin_mnn_pairs` and `hard_negative_mining`
shipped the exact broadcast cross-join candidate step as the only path;
the 100 TB swap to bucketed ANN lived in a docstring.  Both now route
through ``ivf_probe_candidates`` above a row threshold — the same guard
discipline ``exact_cosine_pairs`` applies to its collect path.  These
properties pin the routing:

  * with ``n_probe == n_lists`` every query probes every inverted list,
    so the candidate set IS the full cross product and the bucketed
    path must be row-identical to the exact path (pair-set equality);
  * with ``n_probe < n_lists`` the output is a per-anchor re-ranking of
    a candidate SUBSET: every emitted pair must exist in the exact
    pair universe with the identical cosine, and ranks stay contiguous
    from 1 (the approximation changes recall, never scoring).
"""

from __future__ import annotations

import pytest

from flink_crawler_spark.queries.pipelineq17 import _hard_negative_impl
from flink_crawler_spark.queries.pipelineq19 import _margin_mnn_impl


@pytest.fixture(autouse=True)
def _unpin_ann_candidates(monkeypatch):
    # ann_exact_path reads FCS_ANN_CANDIDATES at call time, so a leaked
    # "exact" pin (verify_local sets one in ITS process; a shared shell
    # could export it) would override max_exact_rows=0 below and turn
    # every bucketed-vs-exact property into exact-vs-exact (r10 advice).
    monkeypatch.delenv("FCS_ANN_CANDIDATES", raising=False)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("n_lists", [2, 4, 8])
def test_hard_negative_full_probe_equals_exact(spark, sf_dir, n_lists):
    exact = _rows(_hard_negative_impl(spark, sf_dir))
    bucketed = _rows(
        _hard_negative_impl(
            spark, sf_dir, max_exact_rows=0, n_lists=n_lists, n_probe=n_lists
        )
    )
    assert bucketed == exact
    assert len(exact) > 0


@pytest.mark.parametrize("n_lists", [2, 4])
def test_margin_mnn_full_probe_equals_exact(spark, sf_dir, n_lists):
    exact = _rows(_margin_mnn_impl(spark, sf_dir))
    bucketed = _rows(
        _margin_mnn_impl(
            spark, sf_dir, max_exact_rows=0, n_lists=n_lists, n_probe=n_lists
        )
    )
    assert bucketed == exact
    assert len(exact) > 0


def test_hard_negative_partial_probe_is_rescored_subset(spark, sf_dir):
    """n_probe < n_lists: emitted pairs keep exact cosines and contiguous
    per-anchor ranks; only membership (recall) may shrink."""
    from collections import defaultdict

    from pyspark.sql import functions as F

    # exact cosines for EVERY valid (anchor, other-label) pair: rerun the
    # exact impl with the rank cap effectively removed by monkeypatching
    # is invasive — instead take the exact top-k output for rank checks
    # and rebuild the full pair-cosine map for membership checks.
    approx = _hard_negative_impl(
        spark, sf_dir, max_exact_rows=0, n_lists=8, n_probe=2
    ).collect()
    assert len(approx) > 0

    import flink_crawler_spark.queries.pipelineq17 as q17
    from flink_crawler_spark.queries.base import t

    e = t(spark, sf_dir, "embeddings")
    anch = e.where(F.expr(q17._ANCHOR_SPARK)).select(
        F.col("vec_id").alias("a_id"),
        F.col("embedding").alias("a_emb"),
        F.col("label").alias("a_label"),
    )
    full = (
        e.crossJoin(F.broadcast(anch))
        .where(F.col("label") != F.col("a_label"))
        .selectExpr(
            "a_id",
            "vec_id AS neg_id",
            f"round(({q17._dot_sql('a_emb', 'embedding', 0)})"
            f" / (({q17._norm_sql('a_emb', 0)}) * ({q17._norm_sql('embedding', 0)})), 6)"
            " AS cosine",
        )
        .collect()
    )
    cos_map = {(r.a_id, r.neg_id): r.cosine for r in full}

    by_anchor = defaultdict(list)
    for r in approx:
        assert (r.a_id, r.neg_id) in cos_map, "pair outside the valid universe"
        assert r.cosine == cos_map[(r.a_id, r.neg_id)], "cosine not exact"
        by_anchor[r.a_id].append(r.rnk)
    for ranks in by_anchor.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
