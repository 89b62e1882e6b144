"""Wave-25 operators: invariants beyond the DuckDB value oracles —
MinHash calibration replayed via hashlib signatures, winsorized mean
vs a numpy clamp, quantile bands against a literal trailing-window
sweep."""

from __future__ import annotations

import hashlib
import re
from collections import defaultdict

import numpy as np

from flink_crawler_spark.queries.base import t
from flink_crawler_spark.queries.dedupq import NUM_HASHES
from flink_crawler_spark.queries.pipelineq24 import (
    BAND_HI,
    BAND_LO,
    BAND_WINDOW,
    WINSOR_HI,
    WINSOR_LO,
    minhash_estimate_calibration,
    rolling_quantile_band_alarms,
    winsorized_mean_price,
)

_TOK = re.compile(r"[^a-z0-9]+")


def _shingles(text: str) -> set[str]:
    toks = [x for x in _TOK.split(text.lower()) if x != ""]
    n = max(len(toks) - 2, 1)
    return {" ".join(toks[i : i + 3]) for i in range(n)}


def _sig(shingles: set[str]) -> list[str]:
    return [
        min(hashlib.md5(f"{k}|{s}".encode()).hexdigest() for s in shingles)
        for k in range(NUM_HASHES)
    ]


def test_minhash_calibration_replay(spark, sf_dir):
    rows = minhash_estimate_calibration(spark, sf_dir).collect()
    assert rows, "no LSH candidate pairs"
    docs = t(spark, sf_dir, "documents").select("doc_id", "text").collect()
    sh = {r["doc_id"]: _shingles(r["text"]) for r in docs}
    sigs = {did: _sig(ss) for did, ss in sh.items() if ss}
    errs = []
    for r in rows:
        a, b = sigs[r["id_a"]], sigs[r["id_b"]]
        n_match = sum(1 for k in range(NUM_HASHES) if a[k] == b[k])
        assert r["n_match"] == n_match
        assert abs(r["jaccard_est"] - n_match / NUM_HASHES) < 1e-9
        inter = len(sh[r["id_a"]] & sh[r["id_b"]])
        union = len(sh[r["id_a"]] | sh[r["id_b"]])
        assert abs(r["jaccard_exact"] - inter / union) < 2e-6
        assert abs(r["abs_err"] - abs(r["jaccard_est"] - r["jaccard_exact"])) < 2e-6
        errs.append(abs(round(r["jaccard_est"] - r["jaccard_exact"], 9)))
    mae = sum(round(e, 9) for e in errs) / len(errs)
    assert abs(rows[0]["mae"] - mae) < 1e-6
    assert len({r["mae"] for r in rows}) == 1


def test_winsorized_mean_vs_numpy(spark, sf_dir):
    row = winsorized_mean_price(spark, sf_dir).collect()[0]
    data = t(spark, sf_dir, "lineitem").select("l_extendedprice").collect()
    xc = np.array([int(round(r[0] * 100)) for r in data], dtype=np.float64)
    lo = np.quantile(xc, WINSOR_LO)  # numpy default = linear interpolation
    hi = np.quantile(xc, WINSOR_HI)
    assert row["n"] == len(xc)
    assert abs(row["p05"] - lo / 100) < 1e-6
    assert abs(row["p95"] - hi / 100) < 1e-6
    wm = np.clip(xc, lo, hi).mean() / 100
    assert abs(row["winsorized_mean"] - wm) < 1e-4
    # winsorizing can only pull the mean toward the median, within bounds
    assert row["p05"] <= row["winsorized_mean"] <= row["p95"]


def test_quantile_band_replay(spark, sf_dir):
    out = {r["day_idx"]: r for r in rolling_quantile_band_alarms(spark, sf_dir).collect()}
    data = t(spark, sf_dir, "orders").select("o_orderdate", "o_totalprice").collect()
    daily = defaultdict(float)
    import datetime

    for r in data:
        di = (r["o_orderdate"].date() - datetime.date(1970, 1, 1)).days
        daily[di] += round(r["o_totalprice"], 2)
    days = sorted(daily)
    # day 0 has no trailing window and must be absent
    assert days[0] not in out
    n_alarms = 0
    for di in days:
        window = [
            round(daily[dj], 2)
            for dj in range(di - BAND_WINDOW, di)
            if dj in daily
        ]
        if not window:
            assert di not in out
            continue
        r = out[di]
        assert r["n_window"] == len(window)
        lo = float(np.quantile(np.array(window), BAND_LO))
        hi = float(np.quantile(np.array(window), BAND_HI))
        assert abs(r["band_lo"] - lo) < 1e-4
        assert abs(r["band_hi"] - hi) < 1e-4
        rev = round(daily[di], 2)
        expect = -1 if rev < lo else (1 if rev > hi else 0)
        assert r["alarm"] == expect
        n_alarms += expect != 0
    # a P10/P90 band flags roughly 20% of days — sanity bounds only
    assert 0 < n_alarms < len(days) * 0.6
