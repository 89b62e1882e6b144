"""Wave-22 operators: invariants beyond the DuckDB value oracles —
CDC apply replayed literally, IPW replayed per-stratum, Brier replayed
from cell rates, AUC against a brute-force pairwise count."""

from __future__ import annotations

from collections import defaultdict

import numpy as np

from flink_crawler_spark.queries.base import t
from flink_crawler_spark.queries.pipelineq21 import (
    BRIER_BINS,
    auc_urgent_by_price,
    brier_calibration_bins,
    cdc_changelog_apply,
    ipw_treatment_effect,
)


def test_cdc_apply_replay(spark, sf_dir):
    rows = {r["user_id"]: r for r in cdc_changelog_apply(spark, sf_dir).collect()}
    evs = t(spark, sf_dir, "events").collect()
    by_user = defaultdict(list)
    for e in evs:
        op = "I" if e["event_type"] == "signup" else ("D" if e["event_type"] == "error" else "U")
        ms = int(e["ts"].timestamp() * 1000)
        by_user[e["user_id"]].append((ms, e["event_id"], op, e["value"]))
    for uid, log in by_user.items():
        log.sort(key=lambda x: (x[0], x[1]))
        last = log[-1]
        n_del = sum(1 for x in log if x[2] == "D")
        if last[2] == "D":
            assert uid not in rows
        else:
            r = rows[uid]
            assert r["last_ms"] == last[0]
            assert r["last_op"] == last[2]
            assert abs(r["final_value"] - round(last[3], 6)) < 1e-9
            assert r["n_ops"] == len(log)
            assert r["n_deletes"] == n_del
    # every surviving user came from the log
    assert set(rows) <= set(by_user)


def test_ipw_replay(spark, sf_dir):
    row = ipw_treatment_effect(spark, sf_dir).collect()[0]
    data = t(spark, sf_dir, "orders").collect()
    strata = defaultdict(lambda: [0, 0, 0.0, 0.0])  # n, n_t, sy_t, sy_c
    for r in data:
        tr = 1 if r["o_orderpriority"] == "1-URGENT" else 0
        y = round(r["o_totalprice"], 2)
        s = strata[r["o_orderstatus"]]
        s[0] += 1
        s[1] += tr
        if tr:
            s[2] += y
        else:
            s[3] += y
    n = sum(s[0] for s in strata.values())
    nt = sum(s[1] for s in strata.values())
    ate = sum(
        s[2] * s[0] / s[1] - s[3] * s[0] / (s[0] - s[1])
        for s in strata.values()
        if 0 < s[1] < s[0]
    ) / n
    syt = sum(s[2] for s in strata.values())
    syc = sum(s[3] for s in strata.values())
    naive = syt / nt - syc / (n - nt)
    assert row["n_orders"] == n and row["n_treated"] == nt
    assert abs(row["ate_ipw"] - ate) < 1e-3
    assert abs(row["naive_diff"] - naive) < 1e-3


def test_brier_replay(spark, sf_dir):
    out = {r["bin"]: r for r in brier_calibration_bins(spark, sf_dir).collect()}
    data = t(spark, sf_dir, "orders").collect()
    cell = defaultdict(lambda: [0, 0])
    rows_ = []
    for r in data:
        y = 1 if r["o_orderpriority"] == "1-URGENT" else 0
        k = (r["o_orderstatus"], r["o_orderdate"].year)
        cell[k][0] += y
        cell[k][1] += 1
        rows_.append((k, y))
    binstats = defaultdict(lambda: [0, 0.0, 0])
    se_all = 0.0
    for k, y in rows_:
        pos, n = cell[k]
        s = pos / n
        b = min(BRIER_BINS - 1, pos * BRIER_BINS // n)
        st = binstats[b]
        st[0] += 1
        st[1] += s
        st[2] += y
        se_all += (s - y) ** 2
    assert set(out) == set(binstats)
    for b, (cnt, ssum, pos) in binstats.items():
        assert out[b]["n_rows"] == cnt
        assert abs(out[b]["mean_score"] - ssum / cnt) < 1e-6
        assert abs(out[b]["obs_rate"] - pos / cnt) < 1e-8
        assert abs(out[b]["brier"] - se_all / len(rows_)) < 1e-6
    # a perfectly calibrated rate score: per-bin mean score equals obs rate
    for b in binstats:
        assert abs(out[b]["mean_score"] - out[b]["obs_rate"]) < 1e-6


def test_auc_brute_force(spark, sf_dir):
    row = auc_urgent_by_price(spark, sf_dir).collect()[0]
    data = t(spark, sf_dir, "orders").select("o_totalprice", "o_orderpriority").collect()
    xs = np.array([int(round(r["o_totalprice"] * 100)) for r in data])
    ys = np.array([1 if r["o_orderpriority"] == "1-URGENT" else 0 for r in data])
    pos = xs[ys == 1]
    neg = xs[ys == 0]
    assert row["n_pos"] == len(pos) and row["n_neg"] == len(neg)
    # brute-force Mann-Whitney with tie = 1/2
    gt = (pos[:, None] > neg[None, :]).sum()
    eq = (pos[:, None] == neg[None, :]).sum()
    auc = (gt + 0.5 * eq) / (len(pos) * len(neg))
    assert abs(row["auc"] - auc) < 1e-8
    assert 0.0 <= row["auc"] <= 1.0
