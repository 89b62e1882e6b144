"""Wave-32 operators: invariants beyond the DuckDB value oracles —
attribution credits replayed from literal lookback windows (plus the
credit-conservation identity), stickiness replayed from day/user sets."""

from __future__ import annotations

from collections import defaultdict

from flink_crawler_spark.queries.base import t
from flink_crawler_spark.queries.pipelineq31 import (
    ATTR_WINDOW_MS,
    dau_mau_stickiness,
    purchase_attribution_models,
)


def test_attribution_replay_and_conservation(spark, sf_dir):
    rows = {r["channel"]: r for r in purchase_attribution_models(spark, sf_dir).collect()}
    evs = t(spark, sf_dir, "events").select("user_id", "event_id", "event_type", "ts").collect()
    per = defaultdict(list)
    for e in evs:
        per[e["user_id"]].append(
            (int(e["ts"].timestamp() * 1000), e["event_id"], e["event_type"])
        )
    last = defaultdict(int)
    linear = defaultdict(float)
    n_attr = 0
    for lst in per.values():
        lst.sort()
        for ms, eid, et in lst:
            if et != "purchase":
                continue
            touches = [
                (m2, e2, t2)
                for m2, e2, t2 in lst
                if t2 != "purchase"
                and m2 >= ms - ATTR_WINDOW_MS
                and (m2 < ms or (m2 == ms and e2 < eid))
            ]
            if not touches:
                continue
            n_attr += 1
            touches.sort()
            last[touches[-1][2]] += 1
            for _, _, t2 in touches:
                linear[t2] += round(1.0 / len(touches), 9)
    assert set(rows) == set(linear)
    for ch in linear:
        assert rows[ch]["last_touch"] == last[ch]
        assert abs(rows[ch]["linear_credit"] - linear[ch]) < 1e-5
        assert rows[ch]["n_conv_attributed"] == n_attr
        assert abs(rows[ch]["last_touch_share"] - last[ch] / n_attr) < 1e-8
    # conservation: both models distribute exactly one credit per
    # attributed conversion
    assert sum(r["last_touch"] for r in rows.values()) == n_attr
    assert abs(sum(r["linear_credit"] for r in rows.values()) - n_attr) < 1e-3


def test_stickiness_replay(spark, sf_dir):
    out = {(r["year"], r["month"]): r for r in dau_mau_stickiness(spark, sf_dir).collect()}
    evs = t(spark, sf_dir, "events").select("user_id", "ts").collect()
    daily = defaultdict(set)
    monthly = defaultdict(set)
    for e in evs:
        d = e["ts"].date()
        daily[(d.year, d.month, d.day)].add(e["user_id"])
        monthly[(d.year, d.month)].add(e["user_id"])
    assert set(out) == set(monthly)
    for (yr, mo), users in monthly.items():
        days = [k for k in daily if k[0] == yr and k[1] == mo]
        sum_dau = sum(len(daily[k]) for k in days)
        r = out[(yr, mo)]
        assert r["n_days"] == len(days)
        assert r["mau"] == len(users)
        assert abs(r["avg_dau"] - sum_dau / len(days)) < 1e-6
        assert abs(r["stickiness"] - (sum_dau / len(days)) / len(users)) < 1e-8
        # stickiness is a fraction of the monthly audience
        assert 0.0 < r["stickiness"] <= 1.0
