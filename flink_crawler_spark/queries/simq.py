"""Similarity-search queries over the embeddings table (64-dim float).

For oracle-compared queries the dot products are generated as explicit
64-term left-associated sums — textually identical arithmetic in both
engines, so the IEEE-754 results match bit-for-bit (no reliance on
either engine's reduction order). LSH-bucketed ANN variants are
engine-internal approximations -> rows-only checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.similarity import ann_topk_lsh, embedding_near_dup_pairs
from .base import register, t

DIM = 64
TOPK = 20
# the synthetic embeddings top out around cosine 0.51 pairwise; 0.35
# yields a few hundred "near-dup" pairs at every sf
PAIR_THRESHOLD = 0.35


def _dot_sql(a: str, b: str, base: int) -> str:
    return " + ".join(
        f"CAST({a}[{i + base}] AS DOUBLE) * CAST({b}[{i + base}] AS DOUBLE)" for i in range(DIM)
    )


def _dot_sql_nocast(a: str, b: str, base: int) -> str:
    return " + ".join(f"{a}[{i + base}] * {b}[{i + base}]" for i in range(DIM))


def _norm_sql(a: str, base: int) -> str:
    return (
        "sqrt(" \
        + " + ".join(
            f"CAST({a}[{i + base}] AS DOUBLE) * CAST({a}[{i + base}] AS DOUBLE)"
            for i in range(DIM)
        )
        + ")"
    )


@register(
    "cosine_topk_bruteforce",
    oracle=f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
SELECT e.vec_id,
       round(({_dot_sql('e.embedding', 'q.qv', 1)})
             / (({_norm_sql('e.embedding', 1)}) * ({_norm_sql('q.qv', 1)})), 6) AS cosine
FROM embeddings e CROSS JOIN q
ORDER BY cosine DESC, e.vec_id ASC
LIMIT {TOPK}
""",
)
def cosine_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ANN baseline: brute-force cosine top-k against the vec_id=0
    query vector. Arrow kernel computes the same left-associated doubles
    as the oracle's explicit sum (operators/similarity.py); ordering is
    TakeOrderedAndProject."""
    from ..operators.similarity import exact_cosine_topk

    emb = t(spark, sf_dir, "embeddings")
    qv = emb.filter(F.col("vec_id") == 0).select("embedding").head()[0]
    return exact_cosine_topk(emb, qv, k=TOPK)


@register(
    "cosine_pairs_bruteforce",
    oracle=f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb,
         {_norm_sql('embedding', 1)} AS nrm
  FROM embeddings
)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(({_dot_sql_nocast('a.emb', 'b.emb', 1)}) / (a.nrm * b.nrm), 6) AS cosine
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE round(({_dot_sql_nocast('a.emb', 'b.emb', 1)}) / (a.nrm * b.nrm), 6) >= {PAIR_THRESHOLD}
""",
)
def cosine_pairs_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact embedding near-dup pairs (cosine >= threshold). The O(n^2)
    oracle shape for correctness; the LSH-blocked variant below is the
    scale path. The Arrow kernel reproduces the oracle's left-associated
    sums bit-for-bit (elementwise column accumulation) at numpy speed —
    ~4x over the codegen'd 64-term expression, no O(n^2) cache.
    """
    from ..operators.similarity import exact_cosine_pairs

    emb = t(spark, sf_dir, "embeddings")
    return exact_cosine_pairs(emb, threshold=PAIR_THRESHOLD)


@register("ann_topk_lsh")  # rows-only: LSH candidate set is engine-internal
def ann_topk_lsh_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-k via sign-LSH bucket + Hamming-2 multi-probe.

    Measured on the synthetic embeddings (near-uniform pairwise cosine):
    recall@20 ~= 0.2 at ~15% of the data scanned — sign-LSH degrades
    when neighbors are barely closer than random points. ann_topk_ivf
    measures recall@20 ~= 0.8 on the same data and is the preferred
    scale path; both are kept (LSH wins when real embedding clusters
    exist and an unsupervised bucket key is needed at write time)."""
    emb = t(spark, sf_dir, "embeddings")
    qrow = emb.filter(F.col("vec_id") == 0).select("embedding").head()
    qvec = [float(x) for x in qrow[0]]
    return ann_topk_lsh(emb, qvec, k=TOPK, n_planes=8, seed=42)


@register("ann_topk_ivf")  # rows-only: IVF lists are engine-internal
def ann_topk_ivf_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN (coarse quantizer + n_probe inverted lists + exact
    re-rank) — the partition-pruning scale path: list_id is the bucket
    key of the stored table at 100 TB."""
    from ..operators.similarity import ivf_topk

    emb = t(spark, sf_dir, "embeddings")
    qrow = emb.filter(F.col("vec_id") == 0).select("embedding").head()
    qvec = [float(x) for x in qrow[0]]
    return ivf_topk(emb, qvec, k=TOPK, n_lists=16, n_probe=4)


@register("embedding_near_dup_lsh")  # rows-only: LSH blocking is engine-internal
def embedding_near_dup_lsh_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    return embedding_near_dup_pairs(emb, threshold=PAIR_THRESHOLD, n_planes=8, seed=42)


@register("ann_recall_report")  # rows-only: candidate sets are engine-internal
def ann_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-measuring ANN quality gate: recall@k of each approximate
    method against the exact brute-force top-k, as data. Deterministic
    (seeded hyperplanes / quantizer), so the number is reproducible —
    this is the query a 100 TB deployment runs on a sample before
    trusting an index configuration."""
    from ..operators.similarity import exact_cosine_topk, ivf_topk

    emb = t(spark, sf_dir, "embeddings")
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).select("embedding").head()[0]]
    truth = exact_cosine_topk(emb, qvec, k=TOPK).select("vec_id")
    lsh = ann_topk_lsh(emb, qvec, k=TOPK, n_planes=8, seed=42).select("vec_id")
    ivf = ivf_topk(emb, qvec, k=TOPK, n_lists=16, n_probe=4).select("vec_id")

    def recall(approx: DataFrame, method: str) -> DataFrame:
        hits = approx.join(truth, "vec_id", "left_semi").count()
        return spark.createDataFrame(
            [(method, TOPK, float(hits) / TOPK)], "method string, k int, recall double"
        )

    return recall(lsh, "lsh_hamming2").unionByName(recall(ivf, "ivf_16x4"))
