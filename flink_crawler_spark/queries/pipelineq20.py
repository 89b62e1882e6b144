"""Wave 21: feature encoding, private release, novelty, rebalancing.

  * target_encoding_loo — leave-one-out target encoding of a
    categorical feature (the high-cardinality-categorical workhorse,
    leak-free by construction).
  * dp_laplace_counts — a differentially-private count release with
    deterministic inverse-CDF Laplace noise and an epsilon ledger.
  * ngram_novelty_score — per-held-out-doc fraction of trigrams never
    seen in the training split (memorization / novelty read).
  * class_balanced_downsample — per-class deterministic cap (the
    dataset rebalancer), md5-ranked so the sample is reproducible.

All exact-value DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .base import register, t

_HEX = "0123456789abcdef"

# ---------------------------------------------------------------------------
# target_encoding_loo
# ---------------------------------------------------------------------------

_TE_LABEL = "CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END"


@register(
    "target_encoding_loo",
    oracle=f"""
WITH o AS (
  SELECT o_orderkey, o_orderstatus AS cat, {_TE_LABEL} AS y FROM orders
),
g AS (
  SELECT cat, CAST(sum(y) AS BIGINT) AS pos, CAST(count(*) AS BIGINT) AS n
  FROM o GROUP BY cat
)
SELECT o.o_orderkey, o.cat, o.y,
       CASE WHEN g.n = 1 THEN NULL
            ELSE round(CAST(g.pos - o.y AS DOUBLE) / CAST(g.n - 1 AS DOUBLE), 9)
       END AS te_loo,
       round(CAST(g.pos AS DOUBLE) / CAST(g.n AS DOUBLE), 9) AS te_full
FROM o JOIN g USING (cat)
""",
)
def target_encoding_loo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out target encoding of a categorical feature against
    the urgent-priority label — the standard high-cardinality
    categorical encoder, computed LEAK-FREE: each row's own label is
    subtracted from its category's aggregate ((sum - y) / (n - 1)), so
    no row sees itself. One category aggregate (map-side combinable,
    constant rows per category) broadcast back onto the fact scan —
    encoding at 100 TB is one shuffle-free projection after a bounded
    agg. Singleton categories yield NULL (undefined LOO), pinned in
    both engines; ratios are exact-integer divisions rounded once."""
    o = t(spark, sf_dir, "orders").selectExpr(
        "o_orderkey", "o_orderstatus AS cat", f"{_TE_LABEL} AS y"
    )
    g = o.groupBy("cat").agg(
        F.sum("y").cast("long").alias("pos"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    return o.join(F.broadcast(g), "cat").selectExpr(
        "o_orderkey",
        "cat",
        "y",
        "CASE WHEN n = 1 THEN NULL"
        " ELSE round(CAST(pos - y AS DOUBLE) / CAST(n - 1 AS DOUBLE), 9) END AS te_loo",
        "round(CAST(pos AS DOUBLE) / CAST(n AS DOUBLE), 9) AS te_full",
    )


# ---------------------------------------------------------------------------
# dp_laplace_counts
# ---------------------------------------------------------------------------

DP_EPSILON = 0.5  # per-release budget; sensitivity of a count is 1


def _md5_u01(key: str, *, duck: bool) -> str:
    """Deterministic uniform in (0,1) from the first 6 md5 hex digits.

    E-notation literals for pure DOUBLE arithmetic in BOTH engines — a
    bare `0.5` made Spark type this DECIMAL(12,10) and truncate u while
    DuckDB computed the exact double (the r11 sf1.0-gate gumbel find,
    pipelineq19._md5_u; same latent skew here feeds the Laplace inverse
    CDF's ln() near the u->0/1 tails)."""
    fn = "strpos" if duck else "locate"
    args = (
        (lambda i: f"('{_HEX}', substr(md5({key}), {i + 1}, 1))")
        if duck
        else (lambda i: f"(substr(md5({key}), {i + 1}, 1), '{_HEX}')")
    )
    h = " + ".join(f"({fn}{args(i)} - 1) * {16 ** (5 - i)}" for i in range(6))
    return f"((({h}) + 0.5e0) / {16 ** 6}e0)"


def _laplace_noise(u: str, scale: str) -> str:
    """Inverse-CDF Laplace(0, scale) from uniform ``u`` in (0,1) —
    identical expression tree in both engines."""
    return (
        f"(CASE WHEN {u} < 0.5 THEN ({scale}) * ln(2.0 * ({u}))"
        f" ELSE -({scale}) * ln(2.0 * (1.0 - ({u}))) END)"
    )


@register(
    "dp_laplace_counts",
    oracle=f"""
WITH g AS (
  SELECT o_orderpriority AS pri, CAST(count(*) AS BIGINT) AS true_n
  FROM orders GROUP BY o_orderpriority
)
SELECT pri, true_n,
       round(CAST(true_n AS DOUBLE)
             + {_laplace_noise(_md5_u01("'dp#' || pri", duck=True), f"1.0 / {DP_EPSILON}")},
             6) AS noisy_n,
       {DP_EPSILON} AS epsilon,
       1.0 AS sensitivity
FROM g
""",
)
def dp_laplace_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differentially-private count release (per-priority order counts
    + Laplace(sensitivity/epsilon) noise) with the epsilon ledger in
    the output — the aggregate-release shape a data-clean-room /
    privacy-gated pipeline uses. Noise is inverse-CDF Laplace on a
    md5-seeded uniform, so the release is REPRODUCIBLE (same seed, same
    release — re-running cannot burn extra budget) and both engines
    produce identical noise by construction. One bounded aggregate; the
    noise is a constant-size projection on the released rows only —
    raw rows never leave the aggregate."""
    u = _md5_u01("'dp#' || pri", duck=False)
    g = t(spark, sf_dir, "orders").groupBy(
        F.col("o_orderpriority").alias("pri")
    ).agg(F.count(F.lit(1)).cast("long").alias("true_n"))
    return g.selectExpr(
        "pri",
        "true_n",
        f"round(CAST(true_n AS DOUBLE)"
        f" + {_laplace_noise(u, f'1.0 / {DP_EPSILON}')}, 6) AS noisy_n",
        f"CAST({DP_EPSILON} AS DOUBLE) AS epsilon",
        "CAST(1.0 AS DOUBLE) AS sensitivity",
    )


# ---------------------------------------------------------------------------
# ngram_novelty_score
# ---------------------------------------------------------------------------

_DUCK_TOKS = "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')"
_DUCK_TRIGRAMS = (
    "list_distinct(list_transform(generate_series(1, greatest(len(toks) - 2, 1)),"
    " i -> array_to_string(toks[i:i+2], ' ')))"
)
_NOV_TRAIN_DUCK = "substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) <= '7'"
_NOV_TRAIN_SPARK = "substr(md5(CAST(doc_id AS STRING)), 1, 1) <= '7'"


@register(
    "ngram_novelty_score",
    oracle=f"""
WITH tk AS (
  SELECT doc_id, {_DUCK_TOKS} AS toks,
         CASE WHEN {_NOV_TRAIN_DUCK} THEN 1 ELSE 0 END AS is_train
  FROM documents
),
sh AS (SELECT doc_id, is_train, unnest({_DUCK_TRIGRAMS}) AS s FROM tk),
train_set AS (SELECT DISTINCT s FROM sh WHERE is_train = 1),
test_sh AS (SELECT doc_id, s FROM sh WHERE is_train = 0),
j AS (
  SELECT test_sh.doc_id,
         CAST(count(*) AS BIGINT) AS n_grams,
         CAST(sum(CASE WHEN train_set.s IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_novel
  FROM test_sh LEFT JOIN train_set ON train_set.s = test_sh.s
  GROUP BY test_sh.doc_id
)
SELECT doc_id, n_grams, n_novel,
       round(CAST(n_novel AS DOUBLE) / CAST(n_grams AS DOUBLE), 9) AS novelty
FROM j
""",
)
def ngram_novelty_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-held-out-document novelty: the fraction of its distinct word
    trigrams that NEVER occur in the training split — the memorization
    vs generalization read (a doc with novelty 0 is fully reconstructible
    from train n-grams; complements benchmark_contamination, which asks
    the same question against an eval set). One shingle explode, one
    distinct on the train side, one left anti-style join keyed on the
    shingle — the MinHash cost envelope again; the train set acts as a
    build-side that at 100 TB becomes a bloom-prefiltered shuffle join
    (the bloom_bucket_prefilter operator is the scale path)."""
    from ..operators.dedup import shingles_expr

    from .base import shingle_tables

    _, ex = shingle_tables(spark, sf_dir, 3)
    # the train gate is md5(doc_id)-derived — compute it ON the shared
    # exploded table instead of re-shingling privately
    tk = ex.select(
        "doc_id",
        F.expr(f"CASE WHEN {_NOV_TRAIN_SPARK} THEN 1 ELSE 0 END").alias("is_train"),
        "s",
    )
    train_set = tk.where(F.col("is_train") == 1).select("s").distinct()
    test_sh = tk.where(F.col("is_train") == 0).select("doc_id", "s")
    j = (
        test_sh.join(
            train_set.withColumn("seen", F.lit(1)), "s", "left"
        )
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_grams"),
            F.sum(F.when(F.col("seen").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_novel"),
        )
    )
    return j.selectExpr(
        "doc_id",
        "n_grams",
        "n_novel",
        "round(CAST(n_novel AS DOUBLE) / CAST(n_grams AS DOUBLE), 9) AS novelty",
    )


# ---------------------------------------------------------------------------
# class_balanced_downsample
# ---------------------------------------------------------------------------

BALANCE_CAP = 30  # per-class keep budget


@register(
    "class_balanced_downsample",
    oracle=f"""
WITH r AS (
  SELECT vec_id, label,
         CAST(row_number() OVER (
           PARTITION BY label
           ORDER BY md5(CAST(vec_id AS VARCHAR)) ASC, vec_id ASC) AS BIGINT) AS rn
  FROM embeddings
),
cls AS (SELECT label, CAST(count(*) AS BIGINT) AS n_class FROM r GROUP BY label)
SELECT r.vec_id, r.label, r.rn AS sample_rank, cls.n_class,
       least(cls.n_class, {BALANCE_CAP}) AS n_kept
FROM r JOIN cls ON cls.label = r.label
WHERE r.rn <= {BALANCE_CAP}
""",
)
def class_balanced_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class-balanced downsampling: keep at most CAP rows per label,
    chosen by a deterministic md5 order — the rebalancer in front of
    classifier training (and the 'cap the mega-source' move in corpus
    mixing). The md5 sample rank is a per-class window whose partition
    count equals the CLASS count (bounded); at web scale with few giant
    classes the same cap runs as the two-phase distributed-rank
    operator this repo already uses for gini/weighted-median. The
    output carries class size and kept count so downstream mixture math
    needs no second scan. Reproducible by construction — no RNG
    state, the sample is a pure function of the ids."""
    e = t(spark, sf_dir, "embeddings")
    w = Window.partitionBy("label").orderBy(
        F.md5(F.col("vec_id").cast("string")).asc(), F.col("vec_id").asc()
    )
    r = e.select(
        "vec_id", "label", F.row_number().over(w).cast("long").alias("rn")
    ).localCheckpoint(eager=True)
    cls = r.groupBy("label").agg(F.count(F.lit(1)).cast("long").alias("n_class"))
    return (
        r.join(F.broadcast(cls), "label")
        .where(F.col("rn") <= BALANCE_CAP)
        .selectExpr(
            "vec_id",
            "label",
            "rn AS sample_rank",
            "n_class",
            f"least(n_class, {BALANCE_CAP}) AS n_kept",
        )
    )
