"""Wave-31 operators: invariants beyond the DuckDB value oracles —
SRM counts replayed via hashlib, the session-gap curve against literal
re-sessionization at each threshold."""

from __future__ import annotations

import hashlib
from collections import defaultdict

from flink_crawler_spark.queries.base import t
from flink_crawler_spark.queries.pipelineq30 import (
    GAP_MINUTES,
    ab_srm_check,
    session_gap_sensitivity,
)


def test_srm_replay(spark, sf_dir):
    row = ab_srm_check(spark, sf_dir).collect()[0]
    users = {r["user_id"] for r in t(spark, sf_dir, "events").select("user_id").collect()}
    n_a = sum(
        1 for u in users if hashlib.md5(f"srm#{u}".encode()).hexdigest()[0] <= "7"
    )
    n = len(users)
    assert row["n"] == n
    assert row["n_a"] == n_a
    assert row["n_b"] == n - n_a
    chi = (n_a - n * 0.5) ** 2 / (n * 0.5) + ((n - n_a) - n * 0.5) ** 2 / (n * 0.5)
    assert abs(row["srm_chi2"] - chi) < 1e-5
    assert row["srm_flag"] == (1 if chi > 3.841 else 0)
    # a healthy salted 50/50 hash split must NOT trip the guardrail,
    # and the realized ratio stays within ~4 binomial sigmas of 0.5
    assert row["srm_flag"] == 0
    assert abs(row["ratio_a"] - 0.5) < 4 * (0.25 / n) ** 0.5


def test_session_gap_curve_replay(spark, sf_dir):
    out = {r["gap_minutes"]: r for r in session_gap_sensitivity(spark, sf_dir).collect()}
    assert set(out) == set(GAP_MINUTES)
    evs = t(spark, sf_dir, "events").select("user_id", "ts", "event_id").collect()
    per = defaultdict(list)
    for e in evs:
        per[e["user_id"]].append((int(e["ts"].timestamp() * 1000), e["event_id"]))
    for m in GAP_MINUTES:
        n_sessions = 0
        for lst in per.values():
            lst.sort()
            n_sessions += 1 + sum(
                1 for a, b in zip(lst, lst[1:]) if b[0] - a[0] > m * 60000
            )
        r = out[m]
        assert r["n_sessions"] == n_sessions
        assert abs(r["sessions_per_user"] - n_sessions / len(per)) < 1e-6
    # the curve is monotone: larger gap threshold, fewer sessions
    counts = [out[m]["n_sessions"] for m in sorted(GAP_MINUTES)]
    assert counts == sorted(counts, reverse=True)
    # every user contributes at least one session at any threshold
    assert all(out[m]["n_sessions"] >= len(per) for m in GAP_MINUTES)
