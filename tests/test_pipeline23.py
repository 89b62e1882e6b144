"""Wave-24 operators: invariants beyond the DuckDB value oracles —
nDCG replayed via numpy ranking, Mann-Kendall against a literal pair
sweep, lift table replayed from a sorted sweep, diversity indices
replayed from Counters."""

from __future__ import annotations

import math
import re
from collections import Counter, defaultdict

import numpy as np

from flink_crawler_spark.queries.base import t
from flink_crawler_spark.queries.pipelineq23 import (
    NDCG_K,
    _NDCG_W,
    lift_gains_deciles,
    mann_kendall_trend,
    ndcg_same_label_eval,
    source_diversity_indices,
)

_TOK = re.compile(r"[^a-z0-9]+")


def test_ndcg_replay(spark, sf_dir):
    out = {r["q_id"]: r for r in ndcg_same_label_eval(spark, sf_dir).collect()}
    assert out, "no query vectors gated"
    embs = t(spark, sf_dir, "embeddings").collect()
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in embs}
    labels = {r["vec_id"]: r["label"] for r in embs}
    for q_id, row in out.items():
        qv = vecs[q_id]
        scored = []
        for vid, v in vecs.items():
            if vid == q_id:
                continue
            c = round(
                float(qv @ v) / (math.sqrt(float(qv @ qv)) * math.sqrt(float(v @ v))), 6
            )
            scored.append((-c, vid))
        scored.sort()
        n_same = sum(1 for _, vid in scored if labels[vid] == labels[q_id])
        dcg = sum(
            round(_NDCG_W[i], 9)
            for i, (_, vid) in enumerate(scored[:NDCG_K])
            if labels[vid] == labels[q_id]
        )
        idcg = sum(_NDCG_W[: min(n_same, NDCG_K)])
        assert row["n_same"] == n_same
        assert abs(row["dcg"] - dcg) < 1e-6
        if n_same > 0:
            assert abs(row["ndcg"] - dcg / idcg) < 1e-5
            assert 0.0 <= row["ndcg"] <= 1.0 + 1e-9
        else:
            assert row["ndcg"] is None


def test_mann_kendall_literal(spark, sf_dir):
    row = mann_kendall_trend(spark, sf_dir).collect()[0]
    data = t(spark, sf_dir, "orders").select("o_orderdate", "o_totalprice").collect()
    daily = defaultdict(float)
    for r in data:
        daily[r["o_orderdate"].date()] += round(r["o_totalprice"], 2)
    days = sorted(daily)
    xs = [round(daily[d], 2) for d in days]
    n = len(xs)
    s = 0
    for i in range(n):
        for j in range(i + 1, n):
            s += (xs[j] > xs[i]) - (xs[j] < xs[i])
    ties = Counter(xs)
    tie_term = sum(tp * (tp - 1) * (2 * tp + 5) for tp in ties.values() if tp > 1)
    var_s = (n * (n - 1) * (2 * n + 5) - tie_term) / 18
    z = (s - 1) / math.sqrt(var_s) if s > 0 else ((s + 1) / math.sqrt(var_s) if s < 0 else 0.0)
    assert row["n_days"] == n
    assert row["s_stat"] == s
    assert abs(row["var_s"] - var_s) < 1e-3
    assert abs(row["z_stat"] - z) < 1e-5


def test_lift_deciles_replay(spark, sf_dir):
    out = {r["decile"]: r for r in lift_gains_deciles(spark, sf_dir).collect()}
    assert set(out) == set(range(10))
    data = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    ).collect()
    rows = sorted(
        data, key=lambda r: (-int(round(r["o_totalprice"] * 100)), r["o_orderkey"])
    )
    n = len(rows)
    npos = sum(1 for r in rows if r["o_orderpriority"] == "1-URGENT")
    per = defaultdict(lambda: [0, 0])
    for rank0, r in enumerate(rows):
        d = rank0 * 10 // n
        per[d][0] += 1
        per[d][1] += 1 if r["o_orderpriority"] == "1-URGENT" else 0
    cum_pos = cum_rows = 0
    for d in range(10):
        cum_rows += per[d][0]
        cum_pos += per[d][1]
        assert out[d]["n_rows"] == per[d][0]
        assert out[d]["n_pos"] == per[d][1]
        assert abs(out[d]["capture_rate"] - cum_pos / npos) < 1e-8
        assert abs(out[d]["lift"] - (cum_pos / npos) / (cum_rows / n)) < 1e-5
    # gains are cumulative: capture at decile 9 is exactly 1
    assert abs(out[9]["capture_rate"] - 1.0) < 1e-9
    assert abs(out[9]["lift"] - 1.0) < 1e-9


def test_diversity_replay(spark, sf_dir):
    out = {r["source"]: r for r in source_diversity_indices(spark, sf_dir).collect()}
    docs = t(spark, sf_dir, "documents").select("source", "text").collect()
    per = defaultdict(Counter)
    for r in docs:
        per[r["source"]].update(x for x in _TOK.split(r["text"].lower()) if x != "")
    assert set(out) == set(per)
    for src, cnt in per.items():
        n = sum(cnt.values())
        shannon = sum(round(-(c / n) * math.log(c / n), 12) for c in cnt.values())
        simpson = sum(c * c for c in cnt.values()) / (n * n)
        assert out[src]["n_tokens"] == n
        assert out[src]["vocab"] == len(cnt)
        assert abs(out[src]["shannon_entropy"] - shannon) < 1e-8
        assert abs(out[src]["simpson_index"] - simpson) < 1e-8
        assert abs(out[src]["effective_vocab"] - math.exp(shannon)) < 1e-4
        # effective vocab can never exceed the actual vocab
        assert out[src]["effective_vocab"] <= out[src]["vocab"] + 1e-6
