"""Wave-4 pipeline invariants (queries/pipelineq3.py) beyond the oracle:
SemDeDup keep-set admissibility and shard-layout laws."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_crawler_spark.queries.pipelineq3 import (
    N_SHARDS,
    corpus_shuffle_shard,
    semdedup_prune,
)
from flink_crawler_spark.queries.simq import PAIR_THRESHOLD
from flink_crawler_spark.queries.base import t as load


def test_semdedup_keepers_are_pairwise_below_threshold(spark, sf_dir):
    out = semdedup_prune(spark, sf_dir)
    emb = load(spark, sf_dir, "embeddings")
    assert out.count() == emb.count()  # one verdict per vector
    kept = out.filter("keep").join(emb, "vec_id").select(
        "cid", "vec_id", F.transform("embedding", lambda v: v.cast("double")).alias("e")
    )
    a = kept.select("cid", F.col("vec_id").alias("ia"), F.col("e").alias("ea"))
    b = kept.select("cid", F.col("vec_id").alias("ib"), F.col("e").alias("eb"))
    dot = F.aggregate(F.zip_with("ea", "eb", lambda p, q: p * q), F.lit(0.0), lambda s, v: s + v)
    nrm = lambda c: F.sqrt(F.aggregate(F.transform(c, lambda v: v * v), F.lit(0.0), lambda s, v: s + v))
    # keep-lowest-id rule: no kept pair within a cluster is >= threshold
    viol = (
        a.join(b, "cid")
        .filter(F.col("ia") < F.col("ib"))
        .filter(F.round(dot / (nrm("ea") * nrm("eb")), 6) >= PAIR_THRESHOLD)
        .count()
    )
    assert viol == 0


def test_corpus_shard_layout_laws(spark, sf_dir):
    out = corpus_shuffle_shard(spark, sf_dir).cache()
    docs = load(spark, sf_dir, "documents")
    assert out.count() == docs.count()                       # lossless
    assert out.select("doc_id").distinct().count() == out.count()
    bad_range = out.filter((F.col("shard") < 0) | (F.col("shard") >= N_SHARDS)).count()
    assert bad_range == 0
    # positions tile 0..n_i-1 within every shard (no gaps/dupes)
    per = out.groupBy("shard").agg(
        F.count("*").alias("n"), F.min("pos").alias("lo"),
        F.max("pos").alias("hi"), F.countDistinct("pos").alias("np"),
    ).collect()
    for r in per:
        assert r["lo"] == 0 and r["hi"] == r["n"] - 1 and r["np"] == r["n"], r
    # deterministic: identical assignment on recompute
    again = corpus_shuffle_shard(spark, sf_dir)
    assert out.exceptAll(again).count() == 0
    out.unpersist()
