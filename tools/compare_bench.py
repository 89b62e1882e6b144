"""Bench-artifact comparison / host-noise adjudication (r10, round-9
verdict task 4).

Every round so far that looked like a perf regression was host
interference, and proving that burned a judge session each time. This
tool runs the three discriminators that settled r9, mechanically:

  (a) calib-normalized total delta — divide the total-runtime ratio by
      the cpu_calib ratio (fixed-work host-speed probes embedded in
      every artifact) before calling anything a regression;
  (b) execution-order clustering — per-query slowdowns that cluster in
      contiguous execution positions are interference windows (plan
      regressions don't respect execution order);
  (c) spike migration — if the big spikes land on DIFFERENT queries in
      the two runs, the spike is environmental (a plan property spikes
      the same query every time).

Inputs: two bench artifacts, oldest first. Accepted shapes:
  * full map (bench.py's BENCH_FULL_LAST_RUN.json / the committed
    BENCH_LOCAL_LATEST.json): has "queries" {name: sec} in execution
    order — full analysis;
  * driver round artifact (BENCH_rNN.json): has "parsed" with
    "slowest"/"cpu_calib" — totals + calib + spike-migration only
    (the driver's full map lands in BENCH_FULL_LAST_RUN.json on disk).

Usage:
  python tools/compare_bench.py BENCH_LOCAL_LATEST.json BENCH_FULL_LAST_RUN.json
  python tools/compare_bench.py BENCH_r08.json BENCH_r09.json

Exit code 0 always — this is an adjudication report, not a gate.
"""

from __future__ import annotations

import argparse
import json
import sys

SPIKE_RATIO = 2.0   # query is a "spike" when new >= ratio * old ...
SPIKE_MIN_DELTA = 2.0  # ... and the absolute delta is at least this (sec)
CLUSTER_GAP = 5     # spikes <= this many execution positions apart join a window


def _load(path: str) -> dict:
    with open(path) as fh:
        raw = json.load(fh)
    # driver round artifact: the compact line lives under "parsed"
    if "parsed" in raw and isinstance(raw.get("parsed"), dict):
        p = dict(raw["parsed"])
        p.setdefault("sf", raw.get("sf"))
        return p
    return raw


def _total(a: dict) -> float | None:
    if isinstance(a.get("value"), (int, float)):
        return float(a["value"])
    q = a.get("queries")
    return round(sum(q.values()), 3) if q else None


def _calib_ratio(old: dict, new: dict) -> dict:
    out = {}
    co, cn = old.get("cpu_calib") or {}, new.get("cpu_calib") or {}
    for k in ("py_1t_sec", "jvm_32slot_sec"):
        if co.get(k) and cn.get(k):
            out[k] = round(cn[k] / co[k], 3)
    return out


def _spikes(old_q: dict, new_q: dict) -> list[tuple[str, float, float]]:
    out = []
    for name, nv in new_q.items():
        ov = old_q.get(name)
        if ov is None or ov <= 0:
            continue
        if nv >= SPIKE_RATIO * ov and nv - ov >= SPIKE_MIN_DELTA:
            out.append((name, ov, nv))
    return sorted(out, key=lambda r: -(r[2] - r[1]))


def _windows(positions: list[int]) -> list[tuple[int, int]]:
    """Group sorted positions into contiguous windows (gap <= CLUSTER_GAP)."""
    wins: list[list[int]] = []
    for p in sorted(positions):
        if wins and p - wins[-1][-1] <= CLUSTER_GAP:
            wins[-1].append(p)
        else:
            wins.append([p])
    return [(w[0], w[-1]) for w in wins]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    args = ap.parse_args()
    old, new = _load(args.old), _load(args.new)

    to, tn = _total(old), _total(new)
    report: dict = {"old": args.old, "new": args.new, "total_old": to, "total_new": tn}

    # (a) calibration-normalized delta
    calib = _calib_ratio(old, new)
    report["cpu_calib_ratio_new_over_old"] = calib

    # (a') intra-run drift (r12, r11 verdict task 3): artifacts now carry
    # a START and an END probe; a large divergence between them marks the
    # artifact's whole window untrustworthy on its own evidence, without
    # a judge re-measure.
    for label, art in (("old", old), ("new", new)):
        cs, ce = art.get("cpu_calib") or {}, art.get("cpu_calib_end") or {}
        drift = {}
        for k in ("py_1t_sec", "jvm_32slot_sec"):
            if cs.get(k) and ce.get(k):
                drift[k] = round(ce[k] / cs[k], 3)
        if drift:
            report[f"intra_run_drift_{label}"] = drift
            if any(r > 1.15 or r < 0.87 for r in drift.values()):
                report[f"untrustworthy_window_{label}"] = (
                    "start/end calib diverge >15% — host drifted DURING "
                    "this run; per-query numbers from it are suspect"
                )
    if to and tn:
        raw_ratio = tn / to
        report["total_ratio_raw"] = round(raw_ratio, 3)
        if calib.get("jvm_32slot_sec"):
            report["total_ratio_calib_normalized"] = round(
                raw_ratio / calib["jvm_32slot_sec"], 3
            )
        report["calib_caveat"] = (
            "cpu_calib is a point sample: it catches sustained drift, NOT "
            "intermittent interference windows — read (b)/(c) for those"
        )

    oq, nq = old.get("queries"), new.get("queries")

    # (b) execution-order clustering of the per-query slowdowns
    if oq and nq:
        spikes = _spikes(oq, nq)
        names = list(nq)  # dict order == execution order in the full map
        pos = {n: i for i, n in enumerate(names)}
        spike_pos = [pos[n] for n, _, _ in spikes if n in pos]
        wins = _windows(spike_pos)
        excess = {n: round(nv - ov, 2) for n, ov, nv in spikes}
        total_excess = round(sum(excess.values()), 2)
        in_win_pos = sum(hi - lo + 1 for lo, hi in wins)
        report["spikes"] = [
            {"query": n, "old": ov, "new": nv, "pos": pos.get(n)}
            for n, ov, nv in spikes
        ]
        report["spike_total_excess_sec"] = total_excess
        report["spike_windows"] = [
            {
                "positions": f"{lo}-{hi}",
                "queries": [n for n in names[lo : hi + 1] if n in excess],
                "excess_sec": round(
                    sum(excess[n] for n in names[lo : hi + 1] if n in excess), 2
                ),
            }
            for lo, hi in wins
        ]
        if not spikes:
            report["clustering_verdict"] = "no spikes"
        elif len(spikes) == 1:
            report["clustering_verdict"] = (
                "single spike: check that query's plan/commit history first "
                "(an intentional change shows here too); if its code is "
                "unchanged, treat as environmental and re-run"
            )
        else:
            clustered = len(wins) <= max(1, len(spikes) // 3) or (
                in_win_pos <= 0.2 * len(names)
                and total_excess > 0
            )
            report["clustering_verdict"] = (
                "position-clustered: interference-window signature "
                "(plan regressions don't respect execution order)"
                if clustered
                else "spread across execution order: investigate per-query plans"
            )

    # (c) spike migration vs the other artifact's spike set
    def _top8(art: dict, q: dict | None) -> set[str]:
        src = q if q else (art.get("slowest") or {})
        return {n for n, _ in sorted(src.items(), key=lambda kv: -kv[1])[:8]}

    slowest_old, slowest_new = _top8(old, oq), _top8(new, nq)
    if slowest_old and slowest_new:
        report["slowest8_shared"] = sorted(slowest_old & slowest_new)
        report["slowest8_only_old"] = sorted(slowest_old - slowest_new)
        report["slowest8_only_new"] = sorted(slowest_new - slowest_old)
        report["migration_note"] = (
            "spikes that appear only in one run's slowest set migrated -> "
            "environmental; a plan property spikes the same query every run"
        )

    json.dump(report, sys.stdout, indent=1)
    print()
    return 0


if __name__ == "__main__":
    sys.exit(main())
