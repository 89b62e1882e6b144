"""Wave-18 operators: invariants beyond the DuckDB value oracles —
SoftDeDup weights replayed via a Python shingle Counter, hard negatives
against numpy brute force, Benford counts replayed literally, ACF
against a numpy co-moment replay."""

from __future__ import annotations

import math
import re
from collections import Counter, defaultdict

import numpy as np

from flink_crawler_spark.queries.base import t
from flink_crawler_spark.queries.pipelineq17 import (
    ACF_MAX_LAG,
    HARDNEG_K,
    acf_daily_revenue,
    benford_price_digits,
    hard_negative_mining,
    softdedup_loss_weights,
)

_TOK = re.compile(r"[^a-z0-9]+")


def _shingles(text: str) -> set[str]:
    toks = [x for x in _TOK.split(text.lower()) if x != ""]
    n = max(len(toks) - 2, 1)
    return {" ".join(toks[i : i + 3]) for i in range(n)}


def test_softdedup_weights_replay(spark, sf_dir):
    out = {r["doc_id"]: r for r in softdedup_loss_weights(spark, sf_dir).collect()}
    docs = t(spark, sf_dir, "documents").select("doc_id", "text").collect()
    sh = {r["doc_id"]: _shingles(r["text"]) for r in docs}
    counts = Counter()
    for s in sh.values():
        counts.update(s)
    assert set(out) == set(sh)
    for doc_id, ss in sh.items():
        row = out[doc_id]
        assert row["n_shingles"] == len(ss)
        sum_c = sum(counts[s] for s in ss)
        assert abs(row["mean_dup_count"] - sum_c / len(ss)) < 1e-8
        assert abs(row["soft_weight"] - len(ss) / sum_c) < 1e-8
        # a weight is 1 exactly when every shingle is unique to this doc
        assert (row["soft_weight"] == 1.0) == all(counts[s] == 1 for s in ss)
        assert 0.0 < row["soft_weight"] <= 1.0


def test_hard_negatives_vs_numpy(spark, sf_dir):
    rows = hard_negative_mining(spark, sf_dir).collect()
    embs = t(spark, sf_dir, "embeddings").collect()
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in embs}
    labels = {r["vec_id"]: r["label"] for r in embs}
    by_anchor = defaultdict(list)
    for r in rows:
        by_anchor[r["a_id"]].append(r)
    assert by_anchor, "no anchors selected"
    for a_id, grp in by_anchor.items():
        assert len(grp) == HARDNEG_K
        assert [r["rnk"] for r in sorted(grp, key=lambda r: r["rnk"])] == list(
            range(1, HARDNEG_K + 1)
        )
        # every negative has a different label than the anchor
        for r in grp:
            assert labels[r["neg_id"]] != labels[a_id]
        # top-1 matches numpy brute force (same rounding, same tie-break)
        a = vecs[a_id]
        best = None
        for vid, v in vecs.items():
            if labels[vid] == labels[a_id]:
                continue
            c = round(
                float(a @ v) / (math.sqrt(float(a @ a)) * math.sqrt(float(v @ v))), 6
            )
            key = (-c, vid)
            if best is None or key < best[0]:
                best = (key, vid, c)
        top = min(grp, key=lambda r: r["rnk"])
        assert top["neg_id"] == best[1]
        assert abs(top["cosine"] - best[2]) < 2e-6


def test_benford_replay(spark, sf_dir):
    out = {r["digit"]: r for r in benford_price_digits(spark, sf_dir).collect()}
    assert set(out) == set(range(1, 10))
    data = t(spark, sf_dir, "orders").select("o_totalprice").collect()
    cnt = Counter(
        int(str(int(round(r["o_totalprice"] * 100)))[0])
        for r in data
        if r["o_totalprice"] > 0
    )
    n = sum(cnt.values())
    mad = sum(
        round(abs(cnt.get(d, 0) / n - math.log10(1 + 1 / d)), 10) for d in range(1, 10)
    ) / 9
    for d in range(1, 10):
        assert out[d]["n_obs"] == cnt.get(d, 0)
        assert abs(out[d]["p_obs"] - cnt.get(d, 0) / n) < 1e-8
        assert abs(out[d]["p_benford"] - math.log10(1 + 1 / d)) < 1e-8
    assert abs(out[1]["mad"] - mad) < 1e-8
    # probabilities are a distribution
    assert abs(sum(out[d]["p_obs"] for d in range(1, 10)) - 1.0) < 1e-6
    assert len({out[d]["chi2"] for d in range(1, 10)}) == 1


def test_acf_replay(spark, sf_dir):
    out = {r["lag"]: r for r in acf_daily_revenue(spark, sf_dir).collect()}
    assert set(out) == set(range(1, ACF_MAX_LAG + 1))
    data = t(spark, sf_dir, "orders").select("o_orderdate", "o_totalprice").collect()
    daily = defaultdict(float)
    for r in data:
        daily[r["o_orderdate"].date()] += round(r["o_totalprice"], 2)
    days = sorted(daily)
    xs = {d: daily[d] for d in days}
    mean = sum(xs.values()) / len(xs)
    den = sum((v - mean) ** 2 for v in xs.values())
    import datetime

    for lag in range(1, ACF_MAX_LAG + 1):
        num = 0.0
        n_pairs = 0
        for d in days:
            d2 = d + datetime.timedelta(days=lag)
            if d2 in xs:
                num += (xs[d] - mean) * (xs[d2] - mean)
                n_pairs += 1
        assert out[lag]["n_pairs"] == n_pairs
        assert abs(out[lag]["acf"] - num / den) < 1e-5
        assert -1.0 <= out[lag]["acf"] <= 1.0
