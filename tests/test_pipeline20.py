"""Wave-21 operators: invariants beyond the DuckDB value oracles —
LOO encoding replayed and leak-checked, Laplace noise replayed via
hashlib inverse-CDF, novelty replayed from Python shingle sets,
balanced sample replayed and cap-checked."""

from __future__ import annotations

import hashlib
import math
import re
from collections import Counter, defaultdict

from flink_crawler_spark.queries.base import t
from flink_crawler_spark.queries.pipelineq20 import (
    BALANCE_CAP,
    DP_EPSILON,
    class_balanced_downsample,
    dp_laplace_counts,
    ngram_novelty_score,
    target_encoding_loo,
)

_TOK = re.compile(r"[^a-z0-9]+")


def _shingles(text: str) -> set[str]:
    toks = [x for x in _TOK.split(text.lower()) if x != ""]
    n = max(len(toks) - 2, 1)
    return {" ".join(toks[i : i + 3]) for i in range(n)}


def test_target_encoding_loo_replay(spark, sf_dir):
    rows = target_encoding_loo(spark, sf_dir).collect()
    data = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_orderpriority"
    ).collect()
    agg = defaultdict(lambda: [0, 0])
    ys = {}
    for r in data:
        y = 1 if r["o_orderpriority"] == "1-URGENT" else 0
        agg[r["o_orderstatus"]][0] += y
        agg[r["o_orderstatus"]][1] += 1
        ys[r["o_orderkey"]] = (r["o_orderstatus"], y)
    assert len(rows) == len(data)
    for r in rows:
        cat, y = ys[r["o_orderkey"]]
        assert r["cat"] == cat and r["y"] == y
        pos, n = agg[cat]
        if n == 1:
            assert r["te_loo"] is None
        else:
            assert abs(r["te_loo"] - (pos - y) / (n - 1)) < 1e-8
        assert abs(r["te_full"] - pos / n) < 1e-8
    # leak-free property: for rows with y=1, LOO < full; y=0, LOO > full
    for r in rows:
        if r["te_loo"] is None:
            continue
        pos, n = agg[r["cat"]]
        if 0 < pos < n:
            if r["y"] == 1:
                assert r["te_loo"] < r["te_full"]
            else:
                assert r["te_loo"] > r["te_full"]


def test_dp_laplace_replay(spark, sf_dir):
    rows = {r["pri"]: r for r in dp_laplace_counts(spark, sf_dir).collect()}
    data = t(spark, sf_dir, "orders").select("o_orderpriority").collect()
    cnt = Counter(r[0] for r in data)
    assert set(rows) == set(cnt)
    scale = 1.0 / DP_EPSILON
    for pri, n in cnt.items():
        h = int(hashlib.md5(f"dp#{pri}".encode()).hexdigest()[:6], 16)
        u = (h + 0.5) / 16**6
        noise = scale * math.log(2 * u) if u < 0.5 else -scale * math.log(2 * (1 - u))
        assert rows[pri]["true_n"] == n
        assert abs(rows[pri]["noisy_n"] - round(n + noise, 6)) < 1e-9
        assert rows[pri]["epsilon"] == DP_EPSILON
        # Laplace(2) noise at this scale stays within ~30 of the count
        assert abs(rows[pri]["noisy_n"] - n) < 40


def test_ngram_novelty_replay(spark, sf_dir):
    out = {r["doc_id"]: r for r in ngram_novelty_score(spark, sf_dir).collect()}
    docs = t(spark, sf_dir, "documents").select("doc_id", "text").collect()
    train_set = set()
    test_docs = {}
    for r in docs:
        if hashlib.md5(str(r["doc_id"]).encode()).hexdigest()[0] <= "7":
            train_set |= _shingles(r["text"])
        else:
            test_docs[r["doc_id"]] = _shingles(r["text"])
    assert set(out) == set(test_docs)
    for did, ss in test_docs.items():
        novel = sum(1 for s in ss if s not in train_set)
        assert out[did]["n_grams"] == len(ss)
        assert out[did]["n_novel"] == novel
        assert abs(out[did]["novelty"] - novel / len(ss)) < 1e-8
        assert 0.0 <= out[did]["novelty"] <= 1.0


def test_class_balanced_downsample_replay(spark, sf_dir):
    rows = class_balanced_downsample(spark, sf_dir).collect()
    embs = t(spark, sf_dir, "embeddings").select("vec_id", "label").collect()
    by_label = defaultdict(list)
    for r in embs:
        by_label[r["label"]].append(r["vec_id"])
    got = defaultdict(list)
    for r in rows:
        got[r["label"]].append(r)
    assert set(got) == {l for l, v in by_label.items() if v}
    for label, members in by_label.items():
        order = sorted(
            members, key=lambda v: (hashlib.md5(str(v).encode()).hexdigest(), v)
        )
        expect = order[:BALANCE_CAP]
        g = sorted(got[label], key=lambda r: r["sample_rank"])
        assert [r["vec_id"] for r in g] == expect
        assert all(r["n_class"] == len(members) for r in g)
        assert all(r["n_kept"] == min(len(members), BALANCE_CAP) for r in g)
        assert len(g) == min(len(members), BALANCE_CAP)
