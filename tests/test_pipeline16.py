"""Wave-17 operators: invariants beyond the DuckDB value oracles —
OLS betas against numpy's least-squares solver, chi-square replayed
from brute-force contingency counts, PSI replayed in pure Python, the
KS statistic against a literal two-ECDF sweep."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import numpy as np

from flink_crawler_spark.queries.base import t
from flink_crawler_spark.queries.pipelineq16 import (
    KS_FLAG_A,
    KS_FLAG_B,
    PSI_BASE_YEAR,
    PSI_BINS,
    PSI_CURR_YEAR,
    chi_square_priority_status,
    ks_two_sample_price,
    ols_price_on_qty_discount,
    psi_price_drift,
)


def test_ols_matches_numpy_lstsq(spark, sf_dir):
    row = ols_price_on_qty_discount(spark, sf_dir).collect()[0]
    data = (
        t(spark, sf_dir, "lineitem")
        .select("l_quantity", "l_discount", "l_extendedprice")
        .collect()
    )
    q = np.array([round(r["l_quantity"], 2) for r in data])
    d = np.array([round(r["l_discount"], 2) for r in data])
    y = np.array([round(r["l_extendedprice"], 2) for r in data])
    X = np.column_stack([np.ones_like(q), q, d])
    beta, *_ = np.linalg.lstsq(X, y, rcond=None)
    assert row["n_rows"] == len(data)
    assert abs(row["beta_intercept"] - beta[0]) < 1e-3
    assert abs(row["beta_quantity"] - beta[1]) < 1e-4
    assert abs(row["beta_discount"] - beta[2]) < 1e-2
    resid = y - X @ beta
    r2 = 1.0 - float(resid @ resid) / float(((y - y.mean()) ** 2).sum())
    assert abs(row["r_squared"] - r2) < 1e-4
    # OLS R^2 is bounded above by 1 and below by 0 for a model with intercept
    assert 0.0 <= row["r_squared"] <= 1.0


def test_chi_square_brute_force(spark, sf_dir):
    row = chi_square_priority_status(spark, sf_dir).collect()[0]
    data = t(spark, sf_dir, "orders").select("o_orderpriority", "o_orderstatus").collect()
    cells = Counter((r[0], r[1]) for r in data)
    rowt = defaultdict(int)
    colt = defaultdict(int)
    for (p, s), c in cells.items():
        rowt[p] += c
        colt[s] += c
    n = sum(cells.values())
    chi2 = 0.0
    for (p, s), obs in cells.items():
        e = rowt[p] * colt[s] / n
        chi2 += round((obs - e) ** 2 / e, 9)
    assert row["n_orders"] == n
    assert row["dof"] == (len(rowt) - 1) * (len(colt) - 1)
    assert abs(row["chi2"] - chi2) < 1e-5
    v = math.sqrt(chi2 / (n * (min(len(rowt), len(colt)) - 1)))
    assert abs(row["cramers_v"] - v) < 1e-5
    assert 0.0 <= row["cramers_v"] <= 1.0


def test_psi_replay(spark, sf_dir):
    out = {r["bucket"]: r for r in psi_price_drift(spark, sf_dir).collect()}
    assert set(out) == set(range(PSI_BINS))
    data = t(spark, sf_dir, "orders").select("o_totalprice", "o_orderdate").collect()
    sides = {0: Counter(), 1: Counter()}
    cents = [
        (int(round(r["o_totalprice"] * 100)), 0 if r["o_orderdate"].year == PSI_BASE_YEAR else 1)
        for r in data
        if r["o_orderdate"].year in (PSI_BASE_YEAR, PSI_CURR_YEAR)
    ]
    mn = min(c for c, _ in cents)
    mx = max(c for c, _ in cents)
    for c, side in cents:
        b = min(PSI_BINS - 1, (c - mn) * PSI_BINS // (mx - mn + 1))
        sides[side][b] += 1
    tb = sum(sides[0].values())
    tc = sum(sides[1].values())
    psi = 0.0
    for b in range(PSI_BINS):
        assert out[b]["n_base"] == sides[0].get(b, 0)
        assert out[b]["n_curr"] == sides[1].get(b, 0)
        p = (sides[1].get(b, 0) + 1) / (tc + PSI_BINS)
        q = (sides[0].get(b, 0) + 1) / (tb + PSI_BINS)
        term = round((p - q) * math.log(p / q), 10)
        assert abs(out[b]["psi_term"] - term) < 1e-9
        psi += term
    assert abs(out[0]["psi_total"] - psi) < 1e-8
    # every row carries the same total
    assert len({r["psi_total"] for r in out.values()}) == 1


def test_ks_literal_ecdf_sweep(spark, sf_dir):
    row = ks_two_sample_price(spark, sf_dir).collect()[0]
    data = t(spark, sf_dir, "lineitem").select("l_extendedprice", "l_returnflag").collect()
    a = sorted(int(round(r[0] * 100)) for r in data if r[1] == KS_FLAG_A)
    b = sorted(int(round(r[0] * 100)) for r in data if r[1] == KS_FLAG_B)
    assert row["n_a"] == len(a) and row["n_b"] == len(b)
    # literal ECDF sweep over the merged value domain
    import bisect

    best, best_at = -1, None
    for v in sorted(set(a) | set(b)):
        fa = bisect.bisect_right(a, v) * len(b)
        fb = bisect.bisect_right(b, v) * len(a)
        gap = abs(fa - fb)
        if gap > best:
            best, best_at = gap, v
    d = best / (len(a) * len(b))
    assert abs(row["d_stat"] - d) < 1e-9
    assert abs(row["d_at_price"] - best_at / 100) < 1e-6
    assert 0.0 <= row["d_stat"] <= 1.0
    # same-distribution synthetic flags: the gap should be small and the
    # large-sample p-value formula must agree with the replay
    p = 2 * math.exp(-2 * d * d * len(a) * len(b) / (len(a) + len(b)))
    assert abs(row["p_approx"] - p) < 1e-6
