"""Wave-6 dataset-assembly operators: plan shapes + invariants.

Values are pinned by the DuckDB oracle gate; these tests pin the SCALE
claims (keyed rank never serializes a key through one task, moment/
centroid tables broadcast, LSH chain never goes all-pairs) and the
mathematical invariants that hold on any input.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_crawler_spark.operators.partitioning import (
    distributed_keyed_row_number,
    distributed_row_number,
)
from flink_crawler_spark.queries.pipelineq6 import (
    ccnet_perplexity_buckets,
    cross_source_contamination,
    embedding_outlier_prune,
    hits_hub_authority,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# ---------------------------------------------------------------------------
# distributed_keyed_row_number — the keyed two-phase rank primitive
# ---------------------------------------------------------------------------


def test_keyed_rank_matches_window_semantics(spark):
    # 3 keys with very different sizes (incl. a dominant one) across
    # more rows than partitions, so keys straddle partition boundaries
    rows = [(k, i * 7 % 251, i) for k in ("a", "b", "c") for i in range(k == "a" and 200 or 30)]
    df = spark.createDataFrame(rows, "k string, v int, id int")
    got = {
        (r["k"], r["id"]): r["rn"]
        for r in distributed_keyed_row_number(
            df, ["k"], [F.asc("v"), F.asc("id")], out="rn", nparts=8
        ).collect()
    }
    from pyspark.sql import Window

    w = Window.partitionBy("k").orderBy(F.asc("v"), F.asc("id"))
    want = {
        (r["k"], r["id"]): r["rn"]
        for r in df.withColumn("rn", F.row_number().over(w)).collect()
    }
    assert got == want


def test_keyed_rank_no_unpartitioned_window(spark, sf_dir):
    plan = _plan(ccnet_perplexity_buckets(spark, sf_dir))
    for line in plan.splitlines():
        if "Window" in line and "windowspecdefinition" in line.lower():
            assert "__pid" in line, line


def test_perplexity_buckets_partition_langs(spark, sf_dir):
    out = ccnet_perplexity_buckets(spark, sf_dir)
    per = (
        out.groupBy("lang", "bucket")
        .count()
        .groupBy("lang")
        .agg(
            F.sum("count").alias("n"),
            F.max(F.when(F.col("bucket") == "head", F.col("count"))).alias("h"),
            F.max(F.when(F.col("bucket") == "tail", F.col("count"))).alias("t"),
        )
        .collect()
    )
    assert per
    for r in per:
        # tercile sizes differ by at most 1 for n >= 3
        if r["n"] >= 3:
            assert r["h"] is not None and r["t"] is not None
            assert abs(r["h"] - r["t"]) <= 1, r


# ---------------------------------------------------------------------------
# hits_hub_authority
# ---------------------------------------------------------------------------


def test_hits_normalized_and_bounded(spark, sf_dir):
    rows = hits_hub_authority(spark, sf_dir).collect()
    assert rows
    hubs = [r["hub"] for r in rows]
    auths = [r["auth"] for r in rows]
    assert all(0.0 <= v <= 1.0 + 1e-9 for v in hubs + auths)
    # max-normalization: some node sits at exactly 1.0 on each axis
    assert max(hubs) == 1.0
    assert max(auths) == 1.0


# ---------------------------------------------------------------------------
# embedding_outlier_prune
# ---------------------------------------------------------------------------


def test_outlier_prune_broadcasts_and_rate(spark, sf_dir):
    df = embedding_outlier_prune(spark, sf_dir)
    plan = _plan(df)
    # centroid + moment joins are broadcasts; the corpus never shuffles
    # through a SortMergeJoin
    assert "SortMergeJoin" not in plan, plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    agg = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("is_outlier").cast("int")).alias("o"),
    ).collect()[0]
    assert agg["n"] > 0
    # Chebyshev: at z=2 at most 25% of any distribution can be flagged
    assert agg["o"] <= agg["n"] * 0.25 + 1


def test_outlier_known_plant(spark):
    import os
    import tempfile

    rng = [[float(i % 3), 0.0] + [0.0] * 62 for i in range(40)]
    rng.append([1000.0, 1000.0] + [0.0] * 62)  # the planted outlier
    rows = [(i, v, 0) for i, v in enumerate(rng)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    tmp = tempfile.mkdtemp(prefix="fcs_out_")
    df.write.mode("overwrite").parquet(os.path.join(tmp, "embeddings.parquet"))
    got = {r["vec_id"]: r["is_outlier"] for r in embedding_outlier_prune(spark, tmp).collect()}
    assert got[40] is True
    assert sum(got.values()) == 1


# ---------------------------------------------------------------------------
# cross_source_contamination
# ---------------------------------------------------------------------------


def test_contamination_no_cartesian(spark, sf_dir):
    plan = _plan(cross_source_contamination(spark, sf_dir))
    assert "CartesianProduct" not in plan, plan


def test_contamination_pairs_reconcile(spark, sf_dir):
    from flink_crawler_spark.operators.dedup import near_dup_pairs
    from flink_crawler_spark.queries.base import t
    from flink_crawler_spark.queries.dedupq import (
        BANDS,
        JACCARD_THRESHOLD,
        NUM_HASHES,
    )

    docs = t(spark, sf_dir, "documents")
    total_pairs = near_dup_pairs(
        docs, threshold=JACCARD_THRESHOLD, num_hashes=NUM_HASHES, bands=BANDS, shingle_n=3
    ).count()
    matrix = cross_source_contamination(spark, sf_dir)
    assert matrix.agg(F.sum("n_pairs")).collect()[0][0] == total_pairs
    # canonical ordering: source_a <= source_b always
    assert matrix.filter(F.col("source_a") > F.col("source_b")).count() == 0
