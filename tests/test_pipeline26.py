"""Wave-27 operators: invariants beyond the DuckDB value oracles —
Zipf slope vs numpy polyfit, burstiness replayed per user, Fano
factor replayed from daily Counters."""

from __future__ import annotations

import math
import re
from collections import Counter, defaultdict

import numpy as np

from flink_crawler_spark.queries.base import t
from flink_crawler_spark.queries.pipelineq26 import (
    BURST_MIN_EVENTS,
    fano_factor_daily,
    user_burstiness_index,
    zipf_fit_slope,
)

_TOK = re.compile(r"[^a-z0-9]+")


def test_zipf_slope_vs_numpy(spark, sf_dir):
    row = zipf_fit_slope(spark, sf_dir).collect()[0]
    docs = t(spark, sf_dir, "documents").select("text").collect()
    cnt = Counter()
    for r in docs:
        cnt.update(x for x in _TOK.split(r["text"].lower()) if x != "")
    ranked = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
    xs = np.log(np.arange(1, len(ranked) + 1, dtype=np.float64))
    ys = np.log(np.array([f for _, f in ranked], dtype=np.float64))
    slope, intercept = np.polyfit(xs, ys, 1)
    assert row["vocab"] == len(ranked)
    assert abs(row["zipf_slope"] - slope) < 1e-4
    assert abs(row["log_intercept"] - intercept) < 1e-3
    # frequencies decrease with rank, so the fitted slope is negative
    assert row["zipf_slope"] < 0


def test_burstiness_replay(spark, sf_dir):
    out = {r["user_id"]: r for r in user_burstiness_index(spark, sf_dir).collect()}
    evs = t(spark, sf_dir, "events").select("user_id", "ts", "event_id").collect()
    per = defaultdict(list)
    for e in evs:
        per[e["user_id"]].append((int(e["ts"].timestamp() * 1000), e["event_id"]))
    for uid, lst in per.items():
        lst.sort()
        gaps = [b[0] - a[0] for a, b in zip(lst, lst[1:])]
        if len(gaps) < BURST_MIN_EVENTS:
            assert uid not in out
            continue
        r = out[uid]
        mu = sum(gaps) / len(gaps)
        var = sum(g * g for g in gaps) / len(gaps) - mu * mu
        sd = math.sqrt(max(var, 0.0))
        assert r["n_gaps"] == len(gaps)
        assert abs(r["mean_gap_ms"] - mu) < 1e-3
        assert abs(r["std_gap_ms"] - sd) < 1e-2
        assert abs(r["burstiness"] - (sd - mu) / (sd + mu)) < 1e-6
        assert -1.0 <= r["burstiness"] <= 1.0


def test_fano_replay(spark, sf_dir):
    out = {r["event_type"]: r for r in fano_factor_daily(spark, sf_dir).collect()}
    evs = t(spark, sf_dir, "events").select("event_type", "ts").collect()
    per = defaultdict(Counter)
    for e in evs:
        per[e["event_type"]][e["ts"].date()] += 1
    assert set(out) == set(per)
    for et, days in per.items():
        cs = list(days.values())
        n = len(cs)
        mu = sum(cs) / n
        var = sum(c * c for c in cs) / n - mu * mu
        r = out[et]
        assert r["n_days"] == n
        assert r["n_events"] == sum(cs)
        assert abs(r["mean_daily"] - mu) < 1e-6
        assert abs(r["fano_factor"] - var / mu) < 1e-4
        assert r["fano_factor"] >= 0
