"""Wave-33 operators: invariants beyond the DuckDB value oracles —
SLO percentiles vs numpy, budget burn replayed with exact integer
accounting."""

from __future__ import annotations

import math
from collections import defaultdict

import numpy as np

from flink_crawler_spark.queries.base import t
from flink_crawler_spark.queries.pipelineq32 import (
    ERROR_BUDGET,
    SLO_P95_MAX,
    error_budget_burn,
    slo_latency_report,
)


def test_slo_report_vs_numpy(spark, sf_dir):
    out = {r["event_type"]: r for r in slo_latency_report(spark, sf_dir).collect()}
    evs = t(spark, sf_dir, "events").select("event_type", "value").collect()
    per = defaultdict(list)
    for e in evs:
        per[e["event_type"]].append(round(e["value"], 6))
    assert set(out) == set(per)
    for et, xs in per.items():
        xs = sorted(xs)
        n = len(xs)
        r = out[et]
        assert r["n_events"] == n
        # r6: EXACT order statistics (k = ceil(p*n)-th smallest), not an
        # interpolated quantile — one concrete input value, bit-identical
        # across engines (numpy equivalent: method='inverted_cdf')
        for col, q in (("p50", 0.50), ("p95", 0.95), ("p99", 0.99)):
            k = max(1, math.ceil(q * n))
            assert r[col] == xs[k - 1], (et, col)
            assert abs(
                r[col] - float(np.quantile(np.array(xs), q, method="inverted_cdf"))
            ) < 1e-12
        assert r["slo_breach"] == (1 if r["p95"] > SLO_P95_MAX else 0)
        assert r["p50"] <= r["p95"] <= r["p99"]


def test_budget_burn_replay(spark, sf_dir):
    rows = {r["day_idx"]: r for r in error_budget_burn(spark, sf_dir).collect()}
    evs = t(spark, sf_dir, "events").select("ts", "event_type").collect()
    daily = defaultdict(lambda: [0, 0])
    import datetime

    for e in evs:
        di = (e["ts"].date() - datetime.date(1970, 1, 1)).days
        daily[di][0] += 1
        daily[di][1] += 1 if e["event_type"] == "error" else 0
    assert set(rows) == set(daily)
    cum_n = cum_e = 0
    for di in sorted(daily):
        n, errs = daily[di]
        cum_n += n
        cum_e += errs
        r = rows[di]
        assert r["n_events"] == n and r["n_errors"] == errs
        assert abs(r["daily_error_rate"] - errs / n) < 1e-8
        assert abs(r["budget_burn"] - cum_e / (cum_n * ERROR_BUDGET)) < 1e-8
        assert r["budget_exhausted"] == (1 if cum_e * 100 > cum_n * 25 else 0)
    # burn is a cumulative ratio: nonnegative, and the flag fires iff > 1
    for r in rows.values():
        assert r["budget_burn"] >= 0
        assert (r["budget_burn"] > 1.0) == (r["budget_exhausted"] == 1)
