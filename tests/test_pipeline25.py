"""Wave-26 operators: invariants beyond the DuckDB value oracles —
query-likelihood scores replayed from Counters, link prediction
against a brute-force neighbor-set sweep, Simpson signs replayed with
exact integer cross-multiplication."""

from __future__ import annotations

import hashlib
import math
import re
from collections import Counter, defaultdict

from flink_crawler_spark.queries.base import t
from flink_crawler_spark.queries.pipelineq25 import (
    LP_TOPK,
    QL_MU,
    QL_TERMS,
    QL_TOPK,
    SP_GROUP_A,
    SP_GROUP_B,
    graph_jaccard_link_prediction,
    query_likelihood_retrieval,
    simpson_paradox_check,
)

_TOK = re.compile(r"[^a-z0-9]+")


def test_query_likelihood_replay(spark, sf_dir):
    rows = query_likelihood_retrieval(spark, sf_dir).collect()
    assert len(rows) == QL_TOPK
    docs = t(spark, sf_dir, "documents").select("doc_id", "text").collect()
    toks = {r["doc_id"]: [x for x in _TOK.split(r["text"].lower()) if x != ""] for r in docs}
    total = sum(len(v) for v in toks.values())
    cf = Counter()
    for v in toks.values():
        cf.update(w for w in v if w in QL_TERMS)
    scores = {}
    for did, v in toks.items():
        tf = Counter(w for w in v if w in QL_TERMS)
        s = sum(
            round(
                math.log((tf[w] + QL_MU * (cf[w] / total)) / (len(v) + QL_MU)), 12
            )
            for w in QL_TERMS
        )
        scores[did] = round(s, 12)
    order = sorted(scores, key=lambda d: (-scores[d], d))[:QL_TOPK]
    got = sorted(rows, key=lambda r: r["rnk"])
    assert [r["doc_id"] for r in got] == order
    for r in got:
        assert abs(r["ql_score"] - scores[r["doc_id"]]) < 1e-8
        assert r["doc_len"] == len(toks[r["doc_id"]])
    # scores are log-probabilities of a 3-term query: strictly negative
    assert all(r["ql_score"] < 0 for r in got)


def test_link_prediction_brute_force(spark, sf_dir):
    rows = graph_jaccard_link_prediction(spark, sf_dir).collect()
    assert rows, "no predictions"
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").collect()
    per_order = defaultdict(set)
    for r in li:
        per_order[r["l_orderkey"]].add(r["l_partkey"])
    nbrs = defaultdict(set)
    for parts in per_order.values():
        ps = sorted(parts)
        for i, a in enumerate(ps):
            for b in ps[i + 1 :]:
                nbrs[a].add(b)
                nbrs[b].add(a)
    by_anchor = defaultdict(list)
    for r in rows:
        by_anchor[r["part_a"]].append(r)
    expected_anchors = {
        a for a in nbrs if hashlib.md5(str(a).encode()).hexdigest()[0] == "0"
    }
    assert set(by_anchor) <= expected_anchors
    for a, grp in list(by_anchor.items())[:20]:
        cands = {}
        for c in {x for n in nbrs[a] for x in nbrs[n]} - {a} - nbrs[a]:
            cn = len(nbrs[a] & nbrs[c])
            if cn:
                cands[c] = (cn, round(cn / (len(nbrs[a]) + len(nbrs[c]) - cn), 6))
        order = sorted(cands, key=lambda c: (-cands[c][1], c))[:LP_TOPK]
        got = sorted(grp, key=lambda r: r["rnk"])
        assert [r["predicted_part"] for r in got] == order
        for r in got:
            assert r["n_common"] == cands[r["predicted_part"]][0]
            assert abs(r["jacc"] - cands[r["predicted_part"]][1]) < 1e-9
            # a predicted link is never an existing edge
            assert r["predicted_part"] not in nbrs[a]


def test_simpson_signs_replay(spark, sf_dir):
    rows = {r["yr"]: r for r in simpson_paradox_check(spark, sf_dir).collect()}
    data = t(spark, sf_dir, "orders").collect()
    cell = defaultdict(lambda: [0, 0, 0, 0])
    for r in data:
        if r["o_orderstatus"] not in (SP_GROUP_A, SP_GROUP_B):
            continue
        y = 1 if r["o_orderpriority"] == "1-URGENT" else 0
        c = cell[r["o_orderdate"].year]
        if r["o_orderstatus"] == SP_GROUP_A:
            c[0] += y
            c[1] += 1
        else:
            c[2] += y
            c[3] += 1
    assert set(rows) == set(cell)
    tpa = sum(c[0] for c in cell.values())
    tna = sum(c[1] for c in cell.values())
    tpb = sum(c[2] for c in cell.values())
    tnb = sum(c[3] for c in cell.values())
    agg_sign = 1 if tpa * tnb > tpb * tna else (-1 if tpa * tnb < tpb * tna else 0)
    any_match = False
    for yr, (pa, na, pb, nb) in cell.items():
        r = rows[yr]
        assert (r["pos_a"], r["n_a"], r["pos_b"], r["n_b"]) == (pa, na, pb, nb)
        sign = 1 if pa * nb > pb * na else (-1 if pa * nb < pb * na else 0)
        assert r["stratum_sign"] == sign
        assert r["agg_sign"] == agg_sign
        assert abs(r["stratum_diff"] - (pa / na - pb / nb)) < 1e-8
        any_match = any_match or (sign == agg_sign)
    flag = 1 if (not any_match and agg_sign != 0) else 0
    assert all(r["paradox_flag"] == flag for r in rows.values())
