"""Wave-30 operators: invariants beyond the DuckDB value oracles —
the Shapley efficiency axiom pinned exactly, worst-group accuracy
replayed from a literal cell sweep."""

from __future__ import annotations

from collections import defaultdict

from flink_crawler_spark.queries.base import t
from flink_crawler_spark.queries.pipelineq29 import (
    shapley_two_feature,
    worst_group_metric,
)


def _cells(spark, sf_dir):
    data = t(spark, sf_dir, "orders").collect()
    cell = defaultdict(lambda: [0, 0])
    for r in data:
        y = 1 if r["o_orderpriority"] == "1-URGENT" else 0
        c = cell[(r["o_orderstatus"], r["o_orderdate"].year)]
        c[0] += y
        c[1] += 1
    return cell


def test_shapley_efficiency_and_replay(spark, sf_dir):
    rows = shapley_two_feature(spark, sf_dir).collect()
    cell = _cells(spark, sf_dir)
    assert len(rows) == len(cell)
    vs = defaultdict(lambda: [0, 0])
    vy = defaultdict(lambda: [0, 0])
    tp = tn = 0
    for (s, yr), (p, n) in cell.items():
        vs[s][0] += p
        vs[s][1] += n
        vy[yr][0] += p
        vy[yr][1] += n
        tp += p
        tn += n
    base = tp / tn
    for r in rows:
        p, n = cell[(r["status"], r["year"])]
        v_sy = p / n
        v_s = vs[r["status"]][0] / vs[r["status"]][1]
        v_y = vy[r["year"]][0] / vy[r["year"]][1]
        phi_s = 0.5 * ((v_sy - v_y) + (v_s - base))
        phi_y = 0.5 * ((v_sy - v_s) + (v_y - base))
        assert r["n_rows"] == n
        assert abs(r["prediction"] - v_sy) < 1e-8
        assert abs(r["baseline"] - base) < 1e-8
        assert abs(r["phi_status"] - phi_s) < 1e-8
        assert abs(r["phi_year"] - phi_y) < 1e-8
        # Shapley efficiency axiom: attributions sum to pred - baseline
        assert abs((r["phi_status"] + r["phi_year"]) - (v_sy - base)) < 1e-8


def test_worst_group_replay(spark, sf_dir):
    rows = {r["grp"]: r for r in worst_group_metric(spark, sf_dir).collect()}
    cell = _cells(spark, sf_dir)
    tp = sum(c[0] for c in cell.values())
    tn = sum(c[1] for c in cell.values())
    g = defaultdict(lambda: [0, 0])
    for (s, yr), (p, n) in cell.items():
        yhat = 1 if p * tn > tp * n else 0
        g[s][0] += n
        g[s][1] += p if yhat else n - p
    assert set(rows) == set(g)
    accs = {s: c / nr for s, (nr, c) in g.items()}
    worst = min(accs.values())
    avg = sum(c for _, c in g.values()) / sum(nr for nr, _ in g.values())
    for s, (nr, c) in g.items():
        r = rows[s]
        assert r["n_rows"] == nr
        assert r["n_correct"] == c
        assert abs(r["accuracy"] - accs[s]) < 1e-8
        assert abs(r["worst_group_accuracy"] - worst) < 1e-8
        assert abs(r["average_accuracy"] - avg) < 1e-8
        assert r["is_worst_group"] == (1 if abs(accs[s] - worst) < 1e-12 else 0)
    # the DRO point: the worst group can only be at or below the average
    assert worst <= avg + 1e-12
