"""r10 adjudication plumbing: the ANN path guard's zero-action pick and
the bench-compare discriminators (no Spark session needed)."""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


# ---------------------------------------------------------------------------
# base.parquet_row_count / base.ann_exact_path
# ---------------------------------------------------------------------------


def test_parquet_row_count_matches_footer_exactly():
    import pyarrow.dataset as ds

    from flink_crawler_spark.queries.base import parquet_row_count

    want = ds.dataset(
        os.path.join(SF_DIR, "embeddings.parquet"), format="parquet"
    ).count_rows()
    assert parquet_row_count(SF_DIR, "embeddings") == want
    # cached second read returns the same value
    assert parquet_row_count(SF_DIR, "embeddings") == want


def test_ann_exact_path_env_override(monkeypatch):
    from flink_crawler_spark.queries.base import ann_exact_path

    monkeypatch.setenv("FCS_ANN_CANDIDATES", "exact")
    assert ann_exact_path(SF_DIR, 0, query="q") is True  # would flip on auto
    monkeypatch.setenv("FCS_ANN_CANDIDATES", "bucketed")
    assert ann_exact_path(SF_DIR, 10**9, query="q") is False


def test_ann_exact_path_auto_warns_on_flip(monkeypatch):
    from flink_crawler_spark.queries.base import ann_exact_path

    monkeypatch.delenv("FCS_ANN_CANDIDATES", raising=False)
    assert ann_exact_path(SF_DIR, 10**9, query="q") is True
    with pytest.warns(UserWarning, match="bucketed IVF"):
        assert ann_exact_path(SF_DIR, 0, query="q") is False


# ---------------------------------------------------------------------------
# tools/compare_bench.py discriminators
# ---------------------------------------------------------------------------


def _run_compare(tmp_path, old: dict, new: dict) -> dict:
    po, pn = tmp_path / "old.json", tmp_path / "new.json"
    po.write_text(json.dumps(old))
    pn.write_text(json.dumps(new))
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "compare_bench.py"), str(po), str(pn)],
        capture_output=True,
        text=True,
        check=True,
    )
    return json.loads(out.stdout)


def _full_map(queries: dict, calib: float) -> dict:
    return {
        "metric": "total_runtime_all_queries",
        "value": round(sum(queries.values()), 3),
        "queries": queries,
        "cpu_calib": {"py_1t_sec": calib, "jvm_32slot_sec": calib},
    }


def test_compare_bench_clustered_interference_window(tmp_path):
    # 40 queries at 1s; the "new" run spikes positions 20-24 only —
    # the contiguous-window signature of host interference
    old_q = {f"q{i:02d}": 1.0 for i in range(40)}
    new_q = dict(old_q)
    for i in range(20, 25):
        new_q[f"q{i:02d}"] = 5.0
    rep = _run_compare(tmp_path, _full_map(old_q, 1.0), _full_map(new_q, 1.0))
    assert "position-clustered" in rep["clustering_verdict"]
    assert len(rep["spike_windows"]) == 1
    assert rep["spike_windows"][0]["positions"] == "20-24"
    assert rep["total_ratio_calib_normalized"] == rep["total_ratio_raw"]


def test_compare_bench_single_spike_verdict(tmp_path):
    # exactly one spiked query -> neither "clustered" nor "spread": the
    # tool points at that query's own history (intentional changes land
    # here too, e.g. r10's ann_topk_ivf exact-twin training)
    old_q = {f"q{i:02d}": 1.0 for i in range(10)}
    new_q = dict(old_q, q05=9.0)
    rep = _run_compare(tmp_path, _full_map(old_q, 1.0), _full_map(new_q, 1.0))
    assert rep["clustering_verdict"].startswith("single spike")
    assert [s["query"] for s in rep["spikes"]] == ["q05"]


def test_compare_bench_calib_normalization(tmp_path):
    # whole host 1.5x slower, calib probes too: normalized ratio ~ 1.0
    old_q = {f"q{i:02d}": 1.0 for i in range(10)}
    new_q = {k: 1.5 for k in old_q}
    rep = _run_compare(tmp_path, _full_map(old_q, 1.0), _full_map(new_q, 1.5))
    assert rep["total_ratio_raw"] == 1.5
    assert abs(rep["total_ratio_calib_normalized"] - 1.0) < 1e-9


def test_compare_bench_spike_migration(tmp_path):
    # driver-artifact shape: only parsed.slowest available; the spike
    # moves from qa (old) to qb (new) -> migration fields catch it
    old = {"parsed": {"value": 100.0, "slowest": {"qa": 30.0, "qc": 5.0}}}
    new = {"parsed": {"value": 100.0, "slowest": {"qb": 30.0, "qc": 5.0}}}
    rep = _run_compare(tmp_path, old, new)
    assert "qa" in rep["slowest8_only_old"]
    assert "qb" in rep["slowest8_only_new"]
    assert "qc" in rep["slowest8_shared"]
