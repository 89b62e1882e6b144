"""Wave-23 operators: invariants beyond the DuckDB value oracles —
Matryoshka recall replayed via numpy double rankings, the threshold
sweep against brute-force Jaccard, Welch's t via numpy, kappa from a
literal contingency replay."""

from __future__ import annotations

import math
import re
from collections import defaultdict

import numpy as np

from flink_crawler_spark.queries.base import t
from flink_crawler_spark.queries.pipelineq22 import (
    MRL_K,
    MRL_PREFIX,
    SWEEP_PERMILLE,
    filter_kappa_agreement,
    matryoshka_truncation_recall,
    near_dup_threshold_sweep,
    welch_t_test_price,
)

_TOK = re.compile(r"[^a-z0-9]+")


def _shingles(text: str) -> set[str]:
    toks = [x for x in _TOK.split(text.lower()) if x != ""]
    n = max(len(toks) - 2, 1)
    return {" ".join(toks[i : i + 3]) for i in range(n)}


def test_matryoshka_recall_replay(spark, sf_dir):
    out = {r["q_id"]: r for r in matryoshka_truncation_recall(spark, sf_dir).collect()}
    assert out, "no query vectors gated"
    embs = t(spark, sf_dir, "embeddings").collect()
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in embs}

    def topk(qv, qid, dims):
        scored = []
        for vid, v in vecs.items():
            if vid == qid:
                continue
            a, b = qv[:dims], v[:dims]
            c = round(float(a @ b) / (math.sqrt(float(a @ a)) * math.sqrt(float(b @ b))), 6)
            scored.append((-c, vid))
        scored.sort()
        return {vid for _, vid in scored[:MRL_K]}

    for q_id, r in out.items():
        full = topk(vecs[q_id], q_id, 64)
        trunc = topk(vecs[q_id], q_id, MRL_PREFIX)
        n_common = len(full & trunc)
        assert r["n_common"] == n_common
        assert abs(r["recall_at_k"] - n_common / MRL_K) < 1e-9
        assert 0 <= r["n_common"] <= MRL_K


def test_threshold_sweep_brute_force(spark, sf_dir):
    out = {r["permille"]: r for r in near_dup_threshold_sweep(spark, sf_dir).collect()}
    docs = t(spark, sf_dir, "documents").select("doc_id", "text").collect()
    sh = {r["doc_id"]: _shingles(r["text"]) for r in docs}
    ids = sorted(sh)
    # brute-force every pair with a shared shingle
    for permille in SWEEP_PERMILLE:
        n_pairs = 0
        doc_a, doc_b = set(), set()
        for i, a in enumerate(ids):
            for b in ids[i + 1 :]:
                c = len(sh[a] & sh[b])
                if c == 0:
                    continue
                union = len(sh[a]) + len(sh[b]) - c
                if c * 1000 >= permille * union:
                    n_pairs += 1
                    doc_a.add(a)
                    doc_b.add(b)
        assert out[permille]["n_pairs"] == n_pairs
        assert out[permille]["n_doc_slots"] == len(doc_a) + len(doc_b)
    # monotone: higher threshold, fewer pairs
    counts = [out[p]["n_pairs"] for p in sorted(SWEEP_PERMILLE)]
    assert counts == sorted(counts, reverse=True)


def test_welch_t_vs_numpy(spark, sf_dir):
    row = welch_t_test_price(spark, sf_dir).collect()[0]
    data = t(spark, sf_dir, "lineitem").select("l_extendedprice", "l_returnflag").collect()
    a = np.array([round(r[0], 2) for r in data if r[1] == "R"])
    b = np.array([round(r[0], 2) for r in data if r[1] == "N"])
    assert row["n1"] == len(a) and row["n2"] == len(b)
    v1 = a.var(ddof=1) / len(a)
    v2 = b.var(ddof=1) / len(b)
    tstat = (a.mean() - b.mean()) / math.sqrt(v1 + v2)
    df = (v1 + v2) ** 2 / (v1**2 / (len(a) - 1) + v2**2 / (len(b) - 1))
    assert abs(row["mean_diff"] - (a.mean() - b.mean())) < 1e-3
    assert abs(row["t_stat"] - tstat) < 1e-4
    assert abs(row["welch_df"] - df) < 0.5
    # df is bounded by the classic Welch inequality
    assert min(len(a), len(b)) - 1 <= row["welch_df"] <= len(a) + len(b) - 2


def test_kappa_replay(spark, sf_dir):
    from flink_crawler_spark.queries.pipelineq5 import (
        FA_MAX_MWL,
        FA_MIN_MWL,
        FA_MIN_TTR,
    )

    row = filter_kappa_agreement(spark, sf_dir).collect()[0]
    docs = t(spark, sf_dir, "documents").select("text").collect()
    n11 = n10 = n01 = n00 = 0
    for r in docs:
        toks = [x for x in _TOK.split(r["text"].lower()) if x != ""]
        if not toks:
            continue
        mwl = sum(len(x) for x in toks) / len(toks)
        ttr = len(set(toks)) / len(toks)
        a = 1 if FA_MIN_MWL <= mwl <= FA_MAX_MWL else 0
        b = 1 if ttr >= FA_MIN_TTR else 0
        if a and b:
            n11 += 1
        elif a:
            n10 += 1
        elif b:
            n01 += 1
        else:
            n00 += 1
    n = n11 + n10 + n01 + n00
    assert (row["n"], row["n11"], row["n10"], row["n01"], row["n00"]) == (
        n,
        n11,
        n10,
        n01,
        n00,
    )
    po = (n11 + n00) / n
    pe = ((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)) / (n * n)
    kappa = (po - pe) / (1 - pe)
    assert abs(row["p_observed"] - po) < 1e-8
    assert abs(row["p_chance"] - pe) < 1e-8
    assert abs(row["kappa"] - kappa) < 1e-8
    assert -1.0 <= row["kappa"] <= 1.0
