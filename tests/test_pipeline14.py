"""Wave-15 operators: invariants beyond the DuckDB value oracles —
association rules against a brute-force basket replay, RRF fusion
algebra, ANOVA against a float replay, seasonal decomposition identity."""

from __future__ import annotations

from collections import defaultdict
from itertools import combinations

from pyspark.sql import functions as F

from flink_crawler_spark.queries.base import t
from flink_crawler_spark.queries.pipelineq14 import (
    MIN_PAIR_SUPPORT,
    RRF_K,
    RRF_TOP,
    anova_f_event_values,
    association_rules_pairs,
    rrf_rank_fusion,
    seasonal_decompose_weekly,
)


def test_association_rules_brute_force(spark, sf_dir):
    rows = association_rules_pairs(spark, sf_dir).collect()
    li = (
        t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
        .collect()
    )
    baskets = defaultdict(set)
    for r in li:
        baskets[r["l_orderkey"]].add(r["l_partkey"])
    pair_cnt: dict = defaultdict(int)
    sup: dict = defaultdict(int)
    for parts in baskets.values():
        for p in parts:
            sup[p] += 1
        for a, b in combinations(sorted(parts), 2):
            pair_cnt[(a, b)] += 1
    expected = {k: v for k, v in pair_cnt.items() if v >= MIN_PAIR_SUPPORT}
    assert {(r["part_a"], r["part_b"]): r["pair_cnt"] for r in rows} == expected
    n = len(baskets)
    for r in rows[:50]:
        a, b = r["part_a"], r["part_b"]
        assert r["sup_a"] == sup[a] and r["sup_b"] == sup[b]
        assert abs(r["conf_ab"] - r["pair_cnt"] / sup[a]) < 1e-9
        assert abs(r["lift"] - r["pair_cnt"] * n / (sup[a] * sup[b])) < 1e-9


def test_rrf_fusion_algebra(spark, sf_dir):
    rows = rrf_rank_fusion(spark, sf_dir).collect()
    # ranks are 1..TOP, every row is in at least one list, and the rrf
    # score is exactly the sum of the two reciprocal terms
    assert len(rows) >= RRF_TOP
    for r in rows:
        assert r["bm25_rank"] != -1 or r["quality_rank"] != -1
        want = 0.0
        if r["bm25_rank"] != -1:
            assert 1 <= r["bm25_rank"] <= RRF_TOP
            want += 1.0 / (RRF_K + r["bm25_rank"])
        if r["quality_rank"] != -1:
            assert 1 <= r["quality_rank"] <= RRF_TOP
            want += 1.0 / (RRF_K + r["quality_rank"])
        assert abs(r["rrf_score"] - want) < 1e-12
    # each rank appears exactly once per list
    for col in ("bm25_rank", "quality_rank"):
        ranks = sorted(r[col] for r in rows if r[col] != -1)
        assert ranks == list(range(1, len(ranks) + 1))


def test_anova_float_replay(spark, sf_dir):
    row = anova_f_event_values(spark, sf_dir).collect()[0]
    ev = t(spark, sf_dir, "events").select("event_type", "value").collect()
    groups = defaultdict(list)
    for r in ev:
        groups[r["event_type"]].append(round(r["value"], 6))
    n = sum(len(v) for v in groups.values())
    k = len(groups)
    gm = sum(sum(v) for v in groups.values()) / n
    ssb = sum(len(v) * (sum(v) / len(v) - gm) ** 2 for v in groups.values())
    ssw = sum(sum((x - sum(v) / len(v)) ** 2 for x in v) for v in groups.values())
    f = (ssb / (k - 1)) / (ssw / (n - k))
    assert row["k"] == k and row["n"] == n
    assert abs(row["ssb"] - ssb) / ssb < 1e-6
    assert abs(row["ssw"] - ssw) / ssw < 1e-6
    assert abs(row["f_stat"] - f) / f < 1e-6


def test_seasonal_decomposition_identity(spark, sf_dir):
    rows = seasonal_decompose_weekly(spark, sf_dir).collect()
    assert len(rows) > 100
    phases = defaultdict(list)
    for r in rows:
        # additive identity up to the 6dp rounds
        assert abs(r["revenue"] - (r["trend"] + r["seasonal"] + r["residual"])) < 5e-6
        phases[r["dayn"] % 7].append(r["residual"])
    assert len(phases) == 7
    # seasonal means absorb the weekday effect: per-phase residuals sum ~0
    for ph, res in phases.items():
        assert abs(sum(res) / len(res)) < 1e-3, ph
