"""Wave-19 operators: invariants beyond the DuckDB value oracles —
Naive Bayes replayed literally (split, smoothing, argmax), info gain
replayed from brute-force entropies, EWMA replayed with the literal
weights, DBSCAN core counts against numpy."""

from __future__ import annotations

import hashlib
import math
import re
from collections import Counter, defaultdict

import numpy as np

from flink_crawler_spark.queries.base import t
from flink_crawler_spark.queries.pipelineq18 import (
    DBSCAN_EPS,
    DBSCAN_MIN_PTS,
    EWMA_WINDOW,
    _EWMA_NW,
    dbscan_core_points,
    ewma_smoothed_revenue,
    info_gain_feature_rank,
    naive_bayes_lang_classify,
)

_TOK = re.compile(r"[^a-z0-9]+")


def _toks(text: str) -> list[str]:
    return [x for x in _TOK.split(text.lower()) if x != ""]


def test_naive_bayes_replay(spark, sf_dir):
    out = {
        (r["true_lang"], r["pred_lang"]): r["n_docs"]
        for r in naive_bayes_lang_classify(spark, sf_dir).collect()
    }
    docs = t(spark, sf_dir, "documents").select("doc_id", "lang", "text").collect()
    train = [r for r in docs if hashlib.md5(str(r["doc_id"]).encode()).hexdigest()[0] <= "7"]
    test = [r for r in docs if hashlib.md5(str(r["doc_id"]).encode()).hexdigest()[0] > "7"]
    tc = defaultdict(Counter)
    tot = Counter()
    prior = Counter()
    vocab = set()
    for r in train:
        ts = _toks(r["text"])
        tc[r["lang"]].update(ts)
        tot[r["lang"]] += len(ts)
        prior[r["lang"]] += 1
        vocab.update(ts)
    v = len(vocab)
    n_train = sum(prior.values())
    langs = sorted(tot)
    conf = Counter()
    for r in test:
        ts = [x for x in _toks(r["text"]) if x in vocab]
        if not ts:
            continue
        best = None
        for lang in langs:
            ll = round(math.log(prior[lang] / n_train), 12)
            for x in ts:
                ll += round(math.log((tc[lang][x] + 1) / (tot[lang] + v)), 12)
            key = (-round(ll, 12), lang)
            if best is None or key < best:
                best = key
        conf[(r["lang"], best[1])] += 1
    assert dict(conf) == {k: int(n) for k, n in out.items()}
    # every held-out doc with at least one known token gets exactly one
    # prediction (the synthetic corpus shares one vocab across langs, so
    # accuracy itself is near-chance — the query's contract is the exact
    # confusion counts, which the literal replay above pins)
    scored_docs = sum(
        1 for r in test if any(x in vocab for x in _toks(r["text"]))
    )
    assert sum(out.values()) == scored_docs


def test_info_gain_replay(spark, sf_dir):
    rows = {r["feature"]: r for r in info_gain_feature_rank(spark, sf_dir).collect()}
    assert set(rows) == {"order_status", "order_year", "order_month"}
    data = t(spark, sf_dir, "orders").collect()

    def entropy(pos, n):
        if pos == 0 or pos == n:
            return 0.0
        p = pos / n
        return -(p * math.log(p)) - ((1 - p) * math.log(1 - p))

    feats = {
        "order_status": lambda r: r["o_orderstatus"],
        "order_year": lambda r: str(r["o_orderdate"].year),
        "order_month": lambda r: str(r["o_orderdate"].month),
    }
    for name, fx in feats.items():
        cell = defaultdict(lambda: [0, 0])
        for r in data:
            y = 1 if r["o_orderpriority"] == "1-URGENT" else 0
            c = cell[fx(r)]
            c[0] += y
            c[1] += 1
        tpos = sum(c[0] for c in cell.values())
        tn = sum(c[1] for c in cell.values())
        hy = entropy(tpos, tn)
        hcond = sum((c[1] / tn) * entropy(c[0], c[1]) for c in cell.values())
        assert rows[name]["n_values"] == len(cell)
        assert abs(rows[name]["info_gain"] - (hy - hcond)) < 1e-6
        assert rows[name]["info_gain"] >= -1e-12
    ranked = sorted(rows.values(), key=lambda r: r["rnk"])
    gains = [r["info_gain"] for r in ranked]
    assert gains == sorted(gains, reverse=True)


def test_ewma_replay(spark, sf_dir):
    out = {r["day_idx"]: r for r in ewma_smoothed_revenue(spark, sf_dir).collect()}
    data = t(spark, sf_dir, "orders").select("o_orderdate", "o_totalprice").collect()
    daily = defaultdict(float)
    epoch = None
    import datetime

    for r in data:
        d = r["o_orderdate"].date()
        di = (d - datetime.date(1970, 1, 1)).days
        daily[di] += round(r["o_totalprice"], 2)
    assert set(out) == set(daily)
    for di in list(daily)[:200]:
        s = 0.0
        for k in range(EWMA_WINDOW):
            if di - k in daily:
                s += round(_EWMA_NW[k] * round(daily[di - k], 2), 6)
        assert abs(out[di]["ewma"] - s) < 1e-5
        assert abs(out[di]["revenue"] - daily[di]) < 1e-6
    # weights are a normalized distribution over the window
    assert abs(sum(_EWMA_NW) - 1.0) < 1e-12


def test_dbscan_core_replay(spark, sf_dir):
    rows = {r["vec_id"]: r for r in dbscan_core_points(spark, sf_dir).collect()}
    embs = t(spark, sf_dir, "embeddings").collect()
    assert set(rows) == {r["vec_id"] for r in embs}
    M = np.array([r["embedding"] for r in embs], dtype=np.float64)
    ids = [r["vec_id"] for r in embs]
    nrm = np.sqrt((M * M).sum(axis=1))
    S = (M @ M.T) / np.outer(nrm, nrm)
    np.fill_diagonal(S, -2.0)
    counts = (np.round(S, 6) >= DBSCAN_EPS).sum(axis=1)
    for i, vid in enumerate(ids):
        assert rows[vid]["n_neighbors"] == counts[i]
        assert rows[vid]["is_core"] == (1 if counts[i] >= DBSCAN_MIN_PTS else 0)
    # both classes must exist at this eps on the synthetic embeddings
    assert any(r["is_core"] == 1 for r in rows.values())
    assert any(r["is_core"] == 0 for r in rows.values())
