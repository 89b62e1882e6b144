"""Wave-28 operators: invariants beyond the DuckDB value oracles —
coverage curve replayed from ranked shingle sets, entropy rate
replayed from transition Counters, the survivorship invariant
kept >= dropped."""

from __future__ import annotations

import math
import re
from collections import Counter, defaultdict

from flink_crawler_spark.queries.base import t
from flink_crawler_spark.queries.pipelineq27 import (
    BUDGET_PCTS,
    coverage_budget_curve,
    dedup_survivor_quality,
    entropy_rate_markov,
)

_TOK = re.compile(r"[^a-z0-9]+")


def _shingles(text: str) -> set[str]:
    toks = [x for x in _TOK.split(text.lower()) if x != ""]
    n = max(len(toks) - 2, 1)
    return {" ".join(toks[i : i + 3]) for i in range(n)}


def test_coverage_curve_replay(spark, sf_dir):
    out = {r["budget_pct"]: r for r in coverage_budget_curve(spark, sf_dir).collect()}
    assert set(out) == set(BUDGET_PCTS)
    from flink_crawler_spark.queries.textops import QUALITY_SELECT  # noqa: F401

    # rank via the engine's own quality query to avoid reimplementing
    # the score: doc_quality_score is oracle-verified
    from flink_crawler_spark.queries.textops import doc_quality_score

    q = {r["doc_id"]: r["quality"] for r in doc_quality_score(spark, sf_dir).collect()}
    docs = t(spark, sf_dir, "documents").select("doc_id", "text").collect()
    sh = {r["doc_id"]: _shingles(r["text"]) for r in docs}
    ranked = sorted(q, key=lambda d: (-q[d], d))
    n = len(ranked)
    all_sh = set().union(*sh.values())
    for pct in BUDGET_PCTS:
        cut = [d for i, d in enumerate(ranked, start=1) if i * 100 <= pct * n]
        covered = set().union(*(sh[d] for d in cut)) if cut else set()
        r = out[pct]
        assert r["n_docs_kept"] == n * pct // 100
        assert r["n_shingles_total"] == len(all_sh)
        assert r["n_shingles_covered"] == len(covered)
        assert abs(r["coverage"] - len(covered) / len(all_sh)) < 1e-8
    # coverage is monotone in budget and hits 1.0 at 100%
    cov = [out[p]["coverage"] for p in sorted(BUDGET_PCTS)]
    assert cov == sorted(cov)
    assert abs(out[100]["coverage"] - 1.0) < 1e-12


def test_entropy_rate_replay(spark, sf_dir):
    row = entropy_rate_markov(spark, sf_dir).collect()[0]
    evs = t(spark, sf_dir, "events").select("user_id", "ts", "event_id", "event_type").collect()
    per = defaultdict(list)
    for e in evs:
        per[e["user_id"]].append((e["ts"], e["event_id"], e["event_type"]))
    tc = Counter()
    for lst in per.values():
        lst.sort()
        for a, b in zip(lst, lst[1:]):
            tc[(a[2], b[2])] += 1
    n = sum(tc.values())
    cs = Counter()
    for (s, _), c in tc.items():
        cs[s] += c
    h = sum(round(-(c / n) * math.log(c / cs[s]), 12) for (s, _), c in tc.items())
    assert row["n_transitions"] == n
    assert row["n_states"] == len(cs)
    assert abs(row["entropy_rate_nats"] - h) < 1e-8
    assert abs(row["perplexity"] - math.exp(h)) < 1e-4
    # entropy rate is bounded by log of the state count
    assert 0.0 <= row["entropy_rate_nats"] <= math.log(len(cs)) + 1e-9


def test_survivor_quality_invariant(spark, sf_dir):
    row = dedup_survivor_quality(spark, sf_dir).collect()[0]
    assert row["n_multi_clusters"] > 0, "corpus should contain near-dup clusters"
    assert row["n_kept"] == row["n_multi_clusters"]
    assert row["n_dropped"] >= row["n_kept"]  # every multi cluster drops >= 1
    # argmax-by-quality: survivors can never average below the dropped
    assert row["mean_q_kept"] >= row["mean_q_dropped"] - 1e-9
