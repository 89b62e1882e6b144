"""Wave-29 operators: invariants beyond the DuckDB value oracles —
conformal coverage guarantee + literal order-statistic replay, CUPED
identity (variance_reduction == corr(x,y)^2), McNemar replayed from
the paired gate decisions."""

from __future__ import annotations

import hashlib
import math
import re
from collections import defaultdict

import numpy as np

from flink_crawler_spark.queries.base import t
from flink_crawler_spark.queries.pipelineq28 import (
    CONF_ALPHA,
    CUPED_SPLIT_DAY,
    MCN_MAX_MWL,
    MCN_MIN_MWL,
    MCN_MIN_TTR,
    conformal_prediction_interval,
    cuped_variance_reduction,
    mcnemar_gate_test,
)

_TOK = re.compile(r"[^a-z0-9]+")


def test_conformal_replay_and_guarantee(spark, sf_dir):
    row = conformal_prediction_interval(spark, sf_dir).collect()[0]
    data = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    ).collect()

    def split(k):
        h = hashlib.md5(f"conf#{k}".encode()).hexdigest()[0]
        return "train" if h <= "4" else ("cal" if h <= "9" else "test")

    train = defaultdict(lambda: [0.0, 0])
    for r in data:
        if split(r["o_orderkey"]) == "train":
            c = train[r["o_orderstatus"]]
            c[0] += round(r["o_totalprice"], 2)
            c[1] += 1
    pred = {cat: round(s / n, 6) for cat, (s, n) in train.items()}
    cal = sorted(
        (abs(round(r["o_totalprice"], 2) - pred[r["o_orderstatus"]]), r["o_orderkey"])
        for r in data
        if split(r["o_orderkey"]) == "cal" and r["o_orderstatus"] in pred
    )
    n_cal = len(cal)
    k = min(n_cal, (9 * (n_cal + 1) + 9) // 10)
    q = cal[k - 1][0]
    assert row["n_cal"] == n_cal
    assert abs(row["q_hat"] - round(q, 6)) < 1e-9
    test = [
        abs(round(r["o_totalprice"], 2) - pred[r["o_orderstatus"]])
        for r in data
        if split(r["o_orderkey"]) == "test" and r["o_orderstatus"] in pred
    ]
    covered = sum(1 for x in test if x <= q)
    assert row["n_test"] == len(test)
    assert row["n_covered"] == covered
    # split-conformal finite-sample guarantee (allow sampling slack)
    assert row["test_coverage"] >= (1 - CONF_ALPHA) - 0.05


def test_cuped_identity(spark, sf_dir):
    row = cuped_variance_reduction(spark, sf_dir).collect()[0]
    evs = t(spark, sf_dir, "events").select("user_id", "ts", "value").collect()
    per = defaultdict(lambda: [0.0, 0.0])
    for e in evs:
        d = e["ts"].date()
        pre = d.month == 1 and d.day <= CUPED_SPLIT_DAY
        per[e["user_id"]][0 if pre else 1] += round(e["value"], 6)
    xs = np.array([v[0] for v in per.values()])
    ys = np.array([v[1] for v in per.values()])
    assert row["n_users"] == len(per)
    theta = np.cov(xs, ys, bias=True)[0, 1] / xs.var()
    assert abs(row["theta"] - theta) < 1e-3
    assert abs(row["var_y"] - ys.var()) < max(1e-3 * ys.var(), 1e-3)
    # CUPED identity: variance reduction equals the squared correlation
    rho2 = float(np.corrcoef(xs, ys)[0, 1]) ** 2
    assert abs(row["variance_reduction"] - rho2) < 1e-5
    assert 0.0 <= row["variance_reduction"] <= 1.0
    assert row["var_cuped"] <= row["var_y"] + 1e-9


def test_mcnemar_replay(spark, sf_dir):
    row = mcnemar_gate_test(spark, sf_dir).collect()[0]
    docs = t(spark, sf_dir, "documents").select("text").collect()
    n = n10 = n01 = 0
    for r in docs:
        toks = [x for x in _TOK.split(r["text"].lower()) if x != ""]
        if not toks:
            continue
        n += 1
        mwl = sum(len(x) for x in toks) / len(toks)
        ttr = len(set(toks)) / len(toks)
        a = MCN_MIN_MWL <= mwl <= MCN_MAX_MWL
        b = ttr >= MCN_MIN_TTR
        if a and not b:
            n10 += 1
        elif b and not a:
            n01 += 1
    assert (row["n"], row["n10"], row["n01"]) == (n, n10, n01)
    assert row["n_discordant"] == n10 + n01
    if n10 + n01:
        chi2 = (abs(n10 - n01) - 1) ** 2 / (n10 + n01)
        assert abs(row["mcnemar_chi2"] - chi2) < 1e-6
    assert row["mcnemar_chi2"] >= 0
