"""Wave-20 operators: invariants beyond the DuckDB value oracles —
dim stats vs numpy, margin-MNN mutual-best property replayed via the
full numpy similarity matrix, Hill estimator replayed from sorted
order statistics, Gumbel keys replayed via hashlib."""

from __future__ import annotations

import hashlib
import math
from collections import defaultdict

import numpy as np

from flink_crawler_spark.queries.base import t
from flink_crawler_spark.queries.pipelineq19 import (
    DIM_LOWVAR_THRESHOLD,
    GUMBEL_K,
    HILL_K,
    MNN_K,
    embedding_dim_stats,
    gumbel_topk_sample,
    hill_tail_index,
    margin_mnn_pairs,
)


def _load_embs(spark, sf_dir):
    embs = t(spark, sf_dir, "embeddings").collect()
    M = np.array([r["embedding"] for r in embs], dtype=np.float64)
    return embs, M


def test_dim_stats_vs_numpy(spark, sf_dir):
    rows = {r["dim"]: r for r in embedding_dim_stats(spark, sf_dir).collect()}
    embs, M = _load_embs(spark, sf_dir)
    assert set(rows) == set(range(64))
    for d in range(64):
        col = M[:, d]
        assert rows[d]["n"] == len(col)
        assert abs(rows[d]["mean"] - col.mean()) < 1e-6
        assert abs(rows[d]["std"] - col.std()) < 1e-6
        assert abs(rows[d]["vmin"] - col.min()) < 1e-6
        assert abs(rows[d]["vmax"] - col.max()) < 1e-6
        assert rows[d]["low_var"] == (1 if rows[d]["std"] < DIM_LOWVAR_THRESHOLD else 0)


def test_margin_mnn_mutual_best(spark, sf_dir):
    pairs = margin_mnn_pairs(spark, sf_dir).collect()
    assert pairs, "no mutual pairs found"
    embs, M = _load_embs(spark, sf_dir)
    ids = np.array([r["vec_id"] for r in embs])
    labels = np.array([r["label"] for r in embs])
    xm = labels < 5
    ym = ~xm
    nrm = np.sqrt((M * M).sum(axis=1))
    S = np.round((M @ M.T) / np.outer(nrm, nrm), 6)
    C = S[np.ix_(xm, ym)]  # cosines x-side x y-side
    x_ids, y_ids = ids[xm], ids[ym]

    def topk_mean(row, tie_ids):
        order = sorted(range(len(row)), key=lambda j: (-row[j], tie_ids[j]))
        take = order[:MNN_K]
        return sum(row[j] for j in take) / MNN_K

    mx = np.array([topk_mean(C[i], y_ids) for i in range(C.shape[0])])
    my = np.array([topk_mean(C[:, j], x_ids) for j in range(C.shape[1])])
    Marg = np.round(C / ((mx[:, None] + my[None, :]) / 2), 6)
    # each returned pair is the argmax of its row AND column (with id tie-break)
    xi = {v: i for i, v in enumerate(x_ids)}
    yi = {v: j for j, v in enumerate(y_ids)}
    for r in pairs:
        i, j = xi[r["x_id"]], yi[r["y_id"]]
        assert abs(r["margin"] - Marg[i, j]) < 2e-6
        row_best = min(range(Marg.shape[1]), key=lambda q: (-Marg[i, q], y_ids[q]))
        col_best = min(range(Marg.shape[0]), key=lambda q: (-Marg[q, j], x_ids[q]))
        assert row_best == j and col_best == i
    # a pair can appear at most once per side
    assert len({r["x_id"] for r in pairs}) == len(pairs)
    assert len({r["y_id"] for r in pairs}) == len(pairs)


def test_hill_replay(spark, sf_dir):
    row = hill_tail_index(spark, sf_dir).collect()[0]
    data = t(spark, sf_dir, "lineitem").select("l_extendedprice").collect()
    xs = sorted((int(round(r[0] * 100)) for r in data), reverse=True)
    top = xs[: HILL_K + 1]
    xk1 = top[-1]
    exceed = [x for x in top if x > xk1]
    s = sum(round(math.log(x / xk1), 12) for x in exceed)
    assert row["k"] == HILL_K
    assert row["threshold_cents"] == xk1
    assert row["n_exceed"] == len(exceed)
    assert abs(row["hill_alpha"] - len(exceed) / s) < 1e-4
    assert abs(row["mean_log_excess"] - s / len(exceed)) < 1e-8
    assert row["hill_alpha"] > 0


def test_gumbel_sample_replay(spark, sf_dir):
    rows = gumbel_topk_sample(spark, sf_dir).collect()
    assert len(rows) == GUMBEL_K
    docs = t(spark, sf_dir, "documents").select("doc_id", "n_chars").collect()
    keys = []
    for r in docs:
        if r["n_chars"] <= 0:
            continue
        h = int(hashlib.md5(str(r["doc_id"]).encode()).hexdigest()[:6], 16)
        u = (h + 0.5) / 16**6
        g = round(math.log(r["n_chars"]) - math.log(-math.log(u)), 6)
        keys.append((-g, r["doc_id"], g, r["n_chars"]))
    keys.sort()
    expect = keys[:GUMBEL_K]
    got = sorted(rows, key=lambda r: r["rnk"])
    for rnk, (r, (_, did, g, nc)) in enumerate(zip(got, expect), start=1):
        assert r["rnk"] == rnk
        assert r["doc_id"] == did
        assert abs(r["gumbel_key"] - g) < 1e-9
        assert r["n_chars"] == nc
    # longer docs should be overrepresented vs uniform: sample mean length
    # exceeds the corpus mean (weights are proportional to n_chars)
    corpus_mean = sum(r["n_chars"] for r in docs) / len(docs)
    sample_mean = sum(r["n_chars"] for r in rows) / len(rows)
    assert sample_mean > corpus_mean
