"""Wave 7: tokenizer economics, JL projection, and dedup diagnostics.

  * tokenizer_fertility_by_lang — pieces-per-word and chars-per-piece by
    language (the fertility metric that decides whether a tokenizer is
    fair to a language before a multilingual training run).
  * random_projection_embed — Johnson-Lindenstrauss sign projection
    64 -> 16 dims: the cheap dimensionality reduction run before
    clustering / ANN when the full embedding is too wide; deterministic
    ±1 matrix derived from md5 so both engines share it exactly.
  * near_dup_cluster_histogram — cluster-size distribution of the
    MinHash->LSH->verify->components chain (how much mass sits in big
    dup families vs singletons — the shape that decides keep-one vs
    down-weight policy), oracled by WRAPPING the verified
    near_dup_clusters oracle itself.

All exact-value DuckDB oracles. These extend the LLM-pipeline surface
(SURVEY.md §6); the crawler core they feed is unchanged.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .base import register, t
from .textops2 import _PRETOK_SQL, _WS, PRETOK_RE

# ---------------------------------------------------------------------------
# tokenizer_fertility_by_lang
# ---------------------------------------------------------------------------


@register(
    "tokenizer_fertility_by_lang",
    oracle=f"""
WITH pt AS (
  SELECT doc_id, lang,
         list_filter(regexp_extract_all(lower(text), '{_PRETOK_SQL}'),
                     x -> NOT regexp_full_match(x, '[{_WS}]+')) AS pieces,
         list_filter(string_split_regex(lower(text), '[{_WS}]+'), x -> x <> '') AS words
  FROM documents
),
per AS (
  SELECT lang,
         CAST(len(pieces) AS BIGINT) AS n_pieces,
         CAST(len(words) AS BIGINT) AS n_words,
         CAST(list_sum(list_transform(pieces, x -> length(x))) AS BIGINT) AS n_chars
  FROM pt
)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_pieces) AS BIGINT) AS n_pieces,
       CAST(sum(n_words) AS BIGINT) AS n_words,
       CASE WHEN sum(n_words) = 0 THEN 0.0
            ELSE round(CAST(sum(n_pieces) AS DOUBLE) / sum(n_words), 6) END AS fertility,
       CASE WHEN sum(n_pieces) = 0 THEN 0.0
            ELSE round(CAST(sum(coalesce(n_chars, 0)) AS DOUBLE) / sum(n_pieces), 6) END AS chars_per_piece
FROM per
GROUP BY lang
""",
)
def tokenizer_fertility_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility per language: (BPE pre-tokens emitted) /
    (whitespace words), plus mean chars per piece — high fertility for a
    language means the tokenizer fragments it into many more pieces per
    word than the reference language, inflating its effective sequence
    lengths and training cost (the XLM-R/mT5 fairness diagnostic).

    Uses the SAME GPT-2-family pre-tokenizer regex as doc_bpe_pretoken
    (one source of truth in textops2) with whitespace pre-tokens
    excluded from the piece count. One codegen'd projection + one tiny
    per-language aggregate — integer counts all the way, two double
    divisions at the end; no shuffle of the corpus itself."""
    d = t(spark, sf_dir, "documents")
    pieces = F.filter(
        F.regexp_extract_all(F.lower(F.col("text")), F.lit(PRETOK_RE), F.lit(0)),
        lambda x: ~x.rlike(f"^[{_WS}]+$"),
    )
    words = F.filter(
        F.split(F.lower(F.col("text")), f"[{_WS}]+"), lambda x: x != ""
    )
    per = d.select(
        "lang",
        F.size(pieces).cast("long").alias("n_pieces"),
        F.size(words).cast("long").alias("n_words"),
        F.aggregate(
            pieces, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
        ).alias("n_chars"),
    )
    return per.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_pieces").alias("n_pieces"),
        F.sum("n_words").alias("n_words"),
        F.when(F.sum("n_words") == 0, 0.0)
        .otherwise(F.round(F.sum("n_pieces").cast("double") / F.sum("n_words"), 6))
        .alias("fertility"),
        F.when(F.sum("n_pieces") == 0, 0.0)
        .otherwise(
            F.round(
                F.sum(F.coalesce(F.col("n_chars"), F.lit(0))).cast("double")
                / F.sum("n_pieces"),
                6,
            )
        )
        .alias("chars_per_piece"),
    )


# ---------------------------------------------------------------------------
# random_projection_embed — JL sign projection 64 -> 16
# ---------------------------------------------------------------------------

RP_IN, RP_OUT = 64, 16


def _rp_sign(j: int, i: int) -> int:
    """Deterministic ±1 from md5 — the shared projection matrix. Python
    computes the matrix ONCE and inlines it into both engines' plans, so
    there is no per-engine hash evaluation to drift."""
    return 1 if int(hashlib.md5(f"{j}|{i}".encode()).hexdigest()[:2], 16) % 2 == 0 else -1


def _rp_terms(j: int, xfmt: str) -> list[str]:
    return [
        ("+ " if _rp_sign(j, i) > 0 else "- ") + xfmt.format(i=i)
        for i in range(1, RP_IN + 1)
    ]


def _rp_sql_cols() -> str:
    cols = []
    for j in range(1, RP_OUT + 1):
        # start from an explicit 0 so term order (and thus double
        # rounding) is identical to the Spark accumulator below
        cols.append(f"round((0 {' '.join(_rp_terms(j, 'x{i}'))}) / 4.0, 6) AS y{j}")
    return ",\n       ".join(cols)


@register(
    "random_projection_embed",
    oracle=f"""
WITH x AS (SELECT vec_id,
       {", ".join(f"CAST(embedding[{i}] AS DOUBLE) AS x{i}" for i in range(1, RP_IN + 1))}
       FROM embeddings)
SELECT vec_id,
       {_rp_sql_cols()}
FROM x
""",
)
def random_projection_embed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss sign projection: y = Rx / sqrt(k) with
    R ∈ {{±1}}^(16×64) derived deterministically from md5 — the standard
    cheap dimensionality reduction applied before clustering or
    LSH-bucketing when 64 (or 768) dims are too wide to shuffle.
    sqrt(16) = 4 divides exactly in IEEE, and both engines evaluate the
    same left-associated signed sum starting from an explicit 0, so the
    projected values match bit-for-bit after 6dp rounding.

    100 TB shape: the matrix is 1024 inlined literals (broadcast by
    construction), the projection is one scan with zero shuffles, and
    downstream consumers move 4× fewer bytes per vector."""
    # r12 (guide §1.2 "per-task work" applies to the DRIVER too): the
    # previous per-term Column loop built 16x64 nested py4j objects —
    # 6.0-6.5 s of pure Python plan construction for 0.2 s of execution
    # (measured; the bench times fn() + count(), so construction WAS the
    # query). One selectExpr hands the whole projection to the JVM
    # parser in a single round-trip (~0.2 s). The SQL text is the same
    # left-associated signed chain starting from an explicit 0.0 —
    # term-for-term identical association, bit-identical values.
    emb = t(spark, sf_dir, "embeddings")
    x = emb.selectExpr(
        "vec_id",
        *[
            f"CAST(element_at(embedding, {i}) AS DOUBLE) AS x{i}"
            for i in range(1, RP_IN + 1)
        ],
    )
    cols = [
        f"round((0.0D {' '.join(_rp_terms(j, 'x{i}'))}) / 4.0D, 6) AS y{j}"
        for j in range(1, RP_OUT + 1)
    ]
    return x.selectExpr("vec_id", *cols)


# ---------------------------------------------------------------------------
# near_dup_cluster_histogram — dedup mass distribution
# ---------------------------------------------------------------------------


def _cluster_hist_oracle() -> str:
    # wrap the near_dup_clusters oracle itself: the histogram is exact
    # against the SAME verified chain, with zero duplicated SQL
    from .base import REGISTRY

    base = REGISTRY["near_dup_clusters"].oracle
    return f"""
WITH base AS ({base}),
sizes AS (SELECT cluster_id, count(*) AS sz FROM base GROUP BY cluster_id)
SELECT CASE WHEN sz = 1 THEN '1'
            WHEN sz = 2 THEN '2'
            WHEN sz <= 4 THEN '3-4'
            WHEN sz <= 8 THEN '5-8'
            ELSE '9+' END AS size_bucket,
       CAST(count(*) AS BIGINT) AS n_clusters,
       CAST(sum(sz) AS BIGINT) AS n_docs
FROM sizes
GROUP BY 1
"""


@register("near_dup_cluster_histogram", oracle=_cluster_hist_oracle())
def near_dup_cluster_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-size histogram of the near-dup graph: how many docs sit
    in singletons vs 2-dup pairs vs larger families. The shape drives
    dedup POLICY — a corpus whose mass is in 9+ clusters (template/spam
    families) wants aggressive keep-one; one dominated by pairs
    (syndication) may prefer down-weighting. Buckets are powers of two
    because family sizes are heavy-tailed.

    Built ON the verified chain: Spark side reuses near_dup_clusters
    (MinHash -> LSH -> exact verify -> connected components), the
    oracle WRAPS the near_dup_clusters oracle SQL verbatim — the
    histogram cannot drift from the clustering it summarizes. The extra
    cost over the chain is two tiny aggregates of (cluster_id) pairs."""
    from .dedupq import near_dup_clusters

    clusters = near_dup_clusters(spark, sf_dir)
    sizes = clusters.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("sz"))
    bucket = (
        F.when(F.col("sz") == 1, "1")
        .when(F.col("sz") == 2, "2")
        .when(F.col("sz") <= 4, "3-4")
        .when(F.col("sz") <= 8, "5-8")
        .otherwise("9+")
    )
    return (
        sizes.select(bucket.alias("size_bucket"), "sz")
        .groupBy("size_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_clusters"),
            F.sum("sz").alias("n_docs"),
        )
    )


# ---------------------------------------------------------------------------
# excerpt_containment_pairs — asymmetric overlap (quote/excerpt detection)
# ---------------------------------------------------------------------------


def _containment_oracle() -> str:
    from .dedupq import DUCK_SHINGLES, DUCK_TOKS as DEDUP_TOKS, _buckets_sql, _sigs_sql

    return f"""
WITH {_sigs_sql().strip()},
buckets AS (
{_buckets_sql()}
),
pairs AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM buckets a JOIN buckets b ON a.band = b.band AND a.bh = b.bh
  WHERE a.doc_id < b.doc_id
),
shs AS (SELECT doc_id, {DUCK_SHINGLES} AS sh
        FROM (SELECT doc_id, {DEDUP_TOKS} AS toks FROM documents) x)
SELECT p.id_a, p.id_b,
       round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
             / CAST(len(a.sh) AS DOUBLE), 6) AS containment_ab,
       round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
             / CAST(len(b.sh) AS DOUBLE), 6) AS containment_ba
FROM pairs p
JOIN shs a ON p.id_a = a.doc_id
JOIN shs b ON p.id_b = b.doc_id
"""


@register("excerpt_containment_pairs", oracle=_containment_oracle())
def excerpt_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric shingle CONTAINMENT for LSH candidate pairs:
    C(A→B) = |sh(A) ∩ sh(B)| / |sh(A)|. Jaccard misses the
    quote/excerpt case — a short doc fully contained in a long one has
    high containment but low Jaccard (union is dominated by the long
    side) — so excerpt detection reads C in both directions, not J.
    Same candidate generation as the near-dup chain (MinHash + LSH band
    buckets; note banding recall is tuned for Jaccard, the standard
    production trade-off), exact set math on candidates only.

    100 TB shape: identical to ngram_jaccard_pairs — one signature
    scan, band equi-join, verify joins keyed on the (small) pair
    list; never all-pairs."""
    from ..operators import ensure_parallelism
    from ..operators.dedup import lsh_candidate_pairs, minhash_signatures, shingles_expr
    from .dedupq import BANDS, NUM_HASHES

    # r12 (guide §2.4): the memoized family signature table (see
    # minhash_sigs — bit-identical to the previous in-query aggregate)
    from .dedupq import minhash_sigs

    sigs = minhash_sigs(spark, sf_dir)
    pairs = lsh_candidate_pairs(sigs, num_hashes=NUM_HASHES, bands=BANDS)
    # shared family shingle base (already ensure_parallelism'd and
    # checkpointed once per session+corpus)
    from .base import shingle_tables

    sh, _ = shingle_tables(spark, sf_dir, 3)
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    return (
        pairs.join(
            sh.withColumnRenamed("doc_id", "id_a").withColumnRenamed("sh", "sh_a"),
            "id_a",
        )
        .join(
            sh.withColumnRenamed("doc_id", "id_b").withColumnRenamed("sh", "sh_b"),
            "id_b",
        )
        .select(
            "id_a",
            "id_b",
            F.round(inter / F.size("sh_a"), 6).alias("containment_ab"),
            F.round(inter / F.size("sh_b"), 6).alias("containment_ba"),
        )
    )


# ---------------------------------------------------------------------------
# shard_balance_report — straggler risk of the training-tape layout
# ---------------------------------------------------------------------------


def _shard_balance_oracle() -> str:
    # wrap the corpus_shuffle_shard oracle verbatim (the
    # near_dup_cluster_histogram reuse pattern): the report cannot
    # drift from the sharding it audits
    from .base import REGISTRY

    base = REGISTRY["corpus_shuffle_shard"].oracle
    return f"""
WITH base AS ({base}),
per AS (SELECT shard, count(*) AS n FROM base GROUP BY shard)
SELECT CAST(count(*) AS BIGINT) AS n_shards,
       CAST(min(n) AS BIGINT) AS min_docs,
       CAST(max(n) AS BIGINT) AS max_docs,
       round(avg(n), 6) AS mean_docs,
       round(CAST(max(n) AS DOUBLE) / min(n), 6) AS skew_ratio
FROM per
"""


@register("shard_balance_report", oracle=_shard_balance_oracle())
def shard_balance_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shard-balance audit of the corpus_shuffle_shard layout: doc-count
    min/max/mean per shard and the max/min skew ratio. At 100 TB the
    largest shard bounds every epoch's straggler (readers consume
    shards whole), so a skewed layout wastes cluster time every epoch
    of every run that reads the tape — this one-row report is the
    pre-write gate. Built ON the verified sharding: Spark reuses
    corpus_shuffle_shard, the oracle wraps its SQL verbatim."""
    from .pipelineq3 import corpus_shuffle_shard

    per = (
        corpus_shuffle_shard(spark, sf_dir)
        .groupBy("shard")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return per.agg(
        F.count(F.lit(1)).alias("n_shards"),
        F.min("n").alias("min_docs"),
        F.max("n").alias("max_docs"),
        F.round(F.avg("n"), 6).alias("mean_docs"),
        F.round(F.max("n").cast("double") / F.min("n"), 6).alias("skew_ratio"),
    )
