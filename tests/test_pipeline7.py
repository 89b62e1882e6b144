"""Wave-7 operators: plan shapes + invariants (values are pinned by the
DuckDB oracle gate)."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_crawler_spark.queries.pipelineq7 import (
    RP_IN,
    RP_OUT,
    _rp_sign,
    near_dup_cluster_histogram,
    random_projection_embed,
    tokenizer_fertility_by_lang,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_projection_is_shuffle_free(spark, sf_dir):
    plan = _plan(random_projection_embed(spark, sf_dir))
    assert "Exchange" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_projection_known_vector(spark):
    import os
    import tempfile

    v = [0.0] * RP_IN
    v[0] = 4.0  # y_j = sign(j,1) * 4 / 4 = ±1 exactly
    df = spark.createDataFrame([(0, v, 0)], "vec_id long, embedding array<float>, label int")
    tmp = tempfile.mkdtemp(prefix="fcs_rp_")
    df.write.mode("overwrite").parquet(os.path.join(tmp, "embeddings.parquet"))
    row = random_projection_embed(spark, tmp).collect()[0]
    for j in range(1, RP_OUT + 1):
        assert row[f"y{j}"] == float(_rp_sign(j, 1)), (j, row[f"y{j}"])


def test_fertility_lower_bound(spark, sf_dir):
    # every whitespace word contains at least one non-whitespace
    # pre-token, so fertility >= 1 whenever a language has words
    rows = tokenizer_fertility_by_lang(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_pieces"] >= r["n_words"], r
        if r["n_words"] > 0:
            assert r["fertility"] >= 1.0 - 1e-9, r


def test_containment_bounds_and_jaccard_relation(spark, sf_dir):
    from flink_crawler_spark.queries.dedupq import ngram_jaccard_pairs
    from flink_crawler_spark.queries.pipelineq7 import excerpt_containment_pairs

    c = {
        (r["id_a"], r["id_b"]): r
        for r in excerpt_containment_pairs(spark, sf_dir).collect()
    }
    j = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(spark, sf_dir).collect()
    }
    assert set(c) == set(j)  # same LSH candidate set
    for k, r in c.items():
        ab, ba = r["containment_ab"], r["containment_ba"]
        assert 0.0 <= ab <= 1.0 + 1e-9 and 0.0 <= ba <= 1.0 + 1e-9
        # J <= C in each direction (union >= each set)
        assert j[k] <= min(ab, ba) + 1e-6, (k, j[k], ab, ba)


def test_shard_balance_consistent(spark, sf_dir):
    from flink_crawler_spark.queries.base import t
    from flink_crawler_spark.queries.pipelineq7 import shard_balance_report

    r = shard_balance_report(spark, sf_dir).collect()[0]
    n_docs = t(spark, sf_dir, "documents").count()
    assert r["min_docs"] <= r["mean_docs"] <= r["max_docs"]
    assert r["skew_ratio"] >= 1.0
    assert abs(r["mean_docs"] * r["n_shards"] - n_docs) < 0.01 * n_docs + 1


def test_cluster_histogram_reconciles(spark, sf_dir):
    from flink_crawler_spark.queries.base import t

    hist = near_dup_cluster_histogram(spark, sf_dir)
    total_docs = t(spark, sf_dir, "documents").count()
    agg = hist.agg(
        F.sum("n_docs").alias("d"), F.sum("n_clusters").alias("c")
    ).collect()[0]
    # every doc is in exactly one cluster (singletons included)
    assert agg["d"] == total_docs
    assert agg["c"] <= total_docs
