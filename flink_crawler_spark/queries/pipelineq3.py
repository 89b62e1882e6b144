"""Training-data pipeline operators, wave 4: semantic dedup + corpus
sharding.

Beyond-reference extensions (the reference stops at page-level TSV
export, ``CrawlTopologyBuilder.java:455-463``); both exact-oracled:

  * semdedup_prune — SemDeDup (Abbas et al. 2023, arXiv:2303.09540):
    k-means-cluster the embedding corpus, then drop near-duplicate
    vectors WITHIN each cluster (cosine above a threshold), keeping one
    representative per duplicate group. Clustering turns the O(n^2)
    pairwise problem into sum-of-cluster-squares — the published scaling
    trick this operator reproduces.
  * corpus_shuffle_shard — the deterministic global shuffle + shard
    assignment every pretraining corpus build runs before writing
    training shards: md5-keyed order (engine-independent), uniform shard
    id from the key's hex digits, per-shard position via a window that
    parallelizes across shards.

Scale notes: semdedup's pair join shuffles once on (cid) and is
quadratic only within a cluster (K grows with corpus size to bound
cluster width; the reference paper runs K=50k on 5B embeddings).
Sharding shuffles once on shard id; position assignment is a per-shard
window, embarrassingly parallel across N_SHARDS.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .base import register, t
from .simq import PAIR_THRESHOLD, _km_a2_ctes, _norm_sql
from .simq import _km_final_assignments

# ---------------------------------------------------------------------------
# semdedup_prune
# ---------------------------------------------------------------------------

_SEM_DOT = " + ".join(f"ea.emb[{i}] * eb.emb[{i}]" for i in range(1, 65))


@register(
    "semdedup_prune",
    oracle=f"""
WITH {_km_a2_ctes()},
e AS (
  SELECT vec_id, list_transform(embedding, v -> CAST(v AS DOUBLE)) AS emb,
         {_norm_sql('embedding', 1)} AS nrm
  FROM embeddings
),
dropped AS (
  SELECT DISTINCT b.vec_id
  FROM a2 a JOIN a2 b ON a.cid = b.cid AND a.vec_id < b.vec_id
  JOIN e ea ON ea.vec_id = a.vec_id
  JOIN e eb ON eb.vec_id = b.vec_id
  WHERE round(({_SEM_DOT}) / (ea.nrm * eb.nrm), 6) >= {PAIR_THRESHOLD}
)
SELECT a2.vec_id, a2.cid, d.vec_id IS NULL AS keep
FROM a2 LEFT JOIN dropped d ON a2.vec_id = d.vec_id
""",
)
def semdedup_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup semantic dedup: cluster (2-round Lloyd's, the exact
    shared kmeans core), then within each cluster drop every vector that
    has a LOWER-id neighbor with round(cosine, 6) >= threshold — the
    deterministic keep-one-representative rule (the paper keeps the
    point closest to the centroid; keep-lowest-id is the same pruning
    set size with an engine-independent tie-break).

    Plan: assignments reuse the broadcast-centroid kmeans; the pair join
    shuffles once on cid and is quadratic only within a cluster; the
    drop set comes back as one broadcast-able distinct frame. Cosines
    are left-associated 64-term double sums (aggregate over zip_with),
    bit-identical to the oracle's spelled-out arithmetic."""
    a2 = _km_final_assignments(spark, sf_dir).select("vec_id", "cid")
    emb = t(spark, sf_dir, "embeddings")
    e = emb.select(
        "vec_id",
        F.transform("embedding", lambda v: v.cast("double")).alias("emb"),
    ).withColumn(
        "nrm",
        F.sqrt(
            F.aggregate(
                F.transform("emb", lambda v: v * v),
                F.lit(0.0).cast("double"),
                lambda acc, v: acc + v,
            )
        ),
    )
    ea = a2.join(e, "vec_id").select(
        F.col("cid"),
        F.col("vec_id").alias("id_a"),
        F.col("emb").alias("emb_a"),
        F.col("nrm").alias("nrm_a"),
    )
    eb = a2.join(e, "vec_id").select(
        F.col("cid"),
        F.col("vec_id").alias("id_b"),
        F.col("emb").alias("emb_b"),
        F.col("nrm").alias("nrm_b"),
    )
    dot = F.aggregate(
        F.zip_with("emb_a", "emb_b", lambda p, q: p * q),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )
    dropped = (
        ea.join(eb, "cid")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(F.round(dot / (F.col("nrm_a") * F.col("nrm_b")), 6) >= PAIR_THRESHOLD)
        .select(F.col("id_b").alias("vec_id"))
        .distinct()
        .withColumn("__dropped", F.lit(True))
    )
    return a2.join(dropped, "vec_id", "left").select(
        "vec_id", "cid", F.col("__dropped").isNull().alias("keep")
    )


# ---------------------------------------------------------------------------
# corpus_shuffle_shard
# ---------------------------------------------------------------------------

N_SHARDS = 64
_HEX = "0123456789abcdef"


@register(
    "corpus_shuffle_shard",
    oracle=f"""
WITH k AS (
  SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS key
  FROM documents
),
s AS (
  SELECT doc_id, key,
         CAST(((strpos('{_HEX}', substr(key, 1, 1)) - 1) * 16
               + (strpos('{_HEX}', substr(key, 2, 1)) - 1)) % {N_SHARDS}
              AS INT) AS shard
  FROM k
)
SELECT doc_id, shard,
       CAST(row_number() OVER (PARTITION BY shard ORDER BY key, doc_id) - 1
            AS BIGINT) AS pos
FROM s
""",
)
def corpus_shuffle_shard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic corpus shuffle + shard assignment: the training-tape
    layout stage. md5(doc_id) gives an engine-independent pseudo-random
    order; the key's first two hex digits give a uniform shard id
    (md5 hex digits are uniform over 16 values, and 256 % N_SHARDS == 0
    keeps the fold exact); per-shard position is a window PARTITIONED BY
    shard — no global sort, no single-partition stage, and writing the
    shards is then one partitionBy(shard) parquet write. At 100 TB the
    same plan holds: one shuffle on shard, window state bounded by the
    largest shard (corpus/N, tunable via N_SHARDS)."""
    d = t(spark, sf_dir, "documents").select(
        "doc_id",
        F.md5(F.encode(F.col("doc_id").cast("string"), "UTF-8")).alias("key"),
    )
    def hexv(i: int):
        return F.expr(f"locate(substr(key, {i}, 1), '{_HEX}') - 1")

    d = d.withColumn("shard", ((hexv(1) * 16 + hexv(2)) % N_SHARDS).cast("int"))
    w = Window.partitionBy("shard").orderBy("key", "doc_id")
    return d.select(
        "doc_id",
        "shard",
        (F.row_number().over(w) - 1).cast("long").alias("pos"),
    )
