"""Wave-16 operators: invariants beyond the DuckDB value oracles —
Poisson weights replayed via hashlib, KM replayed literally, WoE counts
brute-forced, Theil-Sen against a numpy pairwise-slope median."""

from __future__ import annotations

import hashlib
import math
from collections import defaultdict

from pyspark.sql import functions as F

from flink_crawler_spark.queries.base import t
from flink_crawler_spark.queries.pipelineq15 import (
    _POIS_T,
    BOOT_B,
    DAY_MS,
    KM_VALUE_MIN,
    kaplan_meier_conversion,
    poisson_bootstrap_ci,
    theil_sen_trend,
    woe_iv_price_bins,
)


def _pois_w(key: str) -> int:
    u = int(hashlib.md5(key.encode()).hexdigest()[:6], 16)
    for k, t_ in enumerate(_POIS_T):
        if u < t_:
            return k
    return 9


def test_poisson_bootstrap_replay(spark, sf_dir):
    row = poisson_bootstrap_ci(spark, sf_dir).collect()[0]
    orders = t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice").collect()
    assert row["n_orders"] == len(orders)
    assert row["n_replicas"] == BOOT_B
    mean = sum(round(r["o_totalprice"], 2) for r in orders) / len(orders)
    assert abs(row["mean_price"] - mean) < 1e-4
    # CI brackets the point estimate and is nondegenerate
    assert row["ci_lo"] < row["mean_price"] < row["ci_hi"]
    # replay replica 0's weighted mean exactly
    num = den = 0
    for r in orders:
        w = _pois_w(f"{r['o_orderkey']}#0")
        num += w * round(r["o_totalprice"], 2)
        den += w
    # weights behave like Poisson(1): total count ~ n
    assert abs(den / len(orders) - 1.0) < 0.15
    m0 = round(num / den, 6)
    # m0 must be one of the quantile inputs: bracketed by the CI only
    # probabilistically, but it must lie in the replica range => sane
    assert row["ci_lo"] - 5000 < m0 < row["ci_hi"] + 5000


def test_kaplan_meier_replay(spark, sf_dir):
    rows = sorted(
        kaplan_meier_conversion(spark, sf_dir).collect(), key=lambda r: r["dur_day"]
    )
    ev = t(spark, sf_dir, "events").select(
        "user_id", "event_type", "value",
        F.expr("unix_millis(cast(ts as timestamp_ltz))").alias("ms"),
    ).collect()
    obs_end = max(r["ms"] for r in ev)
    s: dict = {}
    for r in ev:
        if r["event_type"] == "signup":
            s[r["user_id"]] = min(s.get(r["user_id"], r["ms"]), r["ms"])
    p: dict = {}
    for r in ev:
        u = r["user_id"]
        if (
            r["event_type"] == "purchase"
            and r["value"] >= KM_VALUE_MIN
            and u in s
            and r["ms"] >= s[u]
        ):
            p[u] = min(p.get(u, r["ms"]), r["ms"])
    durs = []
    for u, s_ms in s.items():
        if u in p:
            durs.append(((p[u] - s_ms) // DAY_MS, 1))
        else:
            durs.append(((obs_end - s_ms) // DAY_MS, 0))
    g: dict = defaultdict(lambda: [0, 0])
    for d, e in durs:
        g[d][0 if e else 1] += 1
    n = len(durs)
    surv, out = 1.0, {}
    for d in sorted(g):
        dd, cc = g[d]
        if dd:
            surv *= (n - dd) / n
        out[d] = (n, dd, cc, surv)
        n -= dd + cc
    assert len(rows) == len(out)
    for r in rows:
        at, dd, cc, sv = out[r["dur_day"]]
        assert r["at_risk"] == at and r["n_event"] == dd and r["n_censored"] == cc
        assert abs(r["survival"] - sv) < 1e-6
    # censoring actually occurs in this data (the estimator is exercised)
    assert any(r["n_censored"] > 0 for r in rows)
    assert rows[-1]["survival"] < rows[0]["survival"]


def test_woe_iv_counts(spark, sf_dir):
    rows = woe_iv_price_bins(spark, sf_dir).collect()
    assert len(rows) == 10
    o = t(spark, sf_dir, "orders").select("o_totalprice", "o_orderpriority").collect()
    total_bad = sum(1 for r in o if r["o_orderpriority"][0] in "12")
    assert sum(r["n_bad"] for r in rows) == total_bad
    assert sum(r["n_good"] for r in rows) == len(o) - total_bad
    iv = sum(r["iv_term"] for r in rows)
    assert iv >= 0  # IV is a sum of (p-q)*log(p/q) terms, each >= 0
    for r in rows:
        pg = (r["n_good"] + 0.5) / (len(o) - total_bad + 5)
        pb = (r["n_bad"] + 0.5) / (total_bad + 5)
        assert abs(r["woe"] - math.log(pg / pb)) < 1e-8


def test_theil_sen_replay(spark, sf_dir):
    import numpy as np

    row = theil_sen_trend(spark, sf_dir).collect()[0]
    daily = defaultdict(float)
    for r in t(spark, sf_dir, "orders").select("o_orderdate", "o_totalprice").collect():
        import datetime

        day = (
            r["o_orderdate"].replace(tzinfo=datetime.timezone.utc).timestamp()
            // 86400
        )
        daily[int(day)] += round(r["o_totalprice"], 2)
    days = sorted(daily)
    xs = np.array(days, dtype=float)
    ys = np.array([round(daily[d], 2) for d in days])
    slopes = []
    for i in range(len(days)):
        dx = xs[i + 1:] - xs[i]
        dy = ys[i + 1:] - ys[i]
        slopes.extend(dy / dx)
    assert row["n_days"] == len(days)
    assert row["n_pairs"] == len(slopes)
    assert abs(row["slope"] - float(np.median(slopes))) < 1e-6
    resid = ys - row["slope"] * xs
    assert abs(row["intercept"] - float(np.median(resid))) < 1e-4
