"""Wave 23: embedding truncation QA, dedup tuning, tests, rater stats.

  * matryoshka_truncation_recall — top-k agreement between full-dim and
    prefix-truncated cosine rankings (the Matryoshka / MRL read: how
    many dims can retrieval afford to drop).
  * near_dup_threshold_sweep — exact near-dup pair/doc counts at a
    ladder of Jaccard thresholds: the threshold-tuning curve for the
    dedup chain, integer-exact at every knife edge.
  * welch_t_test_price — Welch's unequal-variance two-sample t with
    Welch-Satterthwaite degrees of freedom.
  * filter_kappa_agreement — Cohen's kappa between two quality gates:
    chance-corrected rater agreement (the LLM-judge / dual-gate audit).

All exact-value DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import shingles_expr
from .base import register, t
from .base import dec_to_double_wide as _d2dw
from .base import dec_to_double_wide_sql as _d2dws
from .simq import _norm_sql

# ---------------------------------------------------------------------------
# matryoshka_truncation_recall
# ---------------------------------------------------------------------------

MRL_K = 10
MRL_PREFIX = 16  # truncated dimensionality
# ~1/16 of vectors serve as queries (md5 gate, distinct from the
# hard-negative anchor set)
_MRL_DUCK = "substr(md5(CAST(vec_id AS VARCHAR)), 1, 1) = '1'"
_MRL_SPARK = "substr(md5(CAST(vec_id AS STRING)), 1, 1) = '1'"


def _dotn(a: str, b: str, base: int, n: int) -> str:
    return " + ".join(
        f"CAST({a}[{i + base}] AS DOUBLE) * CAST({b}[{i + base}] AS DOUBLE)"
        for i in range(n)
    )


def _normn(a: str, base: int, n: int) -> str:
    return (
        "sqrt("
        + " + ".join(
            f"CAST({a}[{i + base}] AS DOUBLE) * CAST({a}[{i + base}] AS DOUBLE)"
            for i in range(n)
        )
        + ")"
    )


@register(
    "matryoshka_truncation_recall",
    oracle=f"""
WITH q AS (
  SELECT vec_id AS q_id, embedding AS qe FROM embeddings WHERE {_MRL_DUCK}
),
p AS (
  SELECT q.q_id, e.vec_id,
         round(({_dotn('q.qe', 'e.embedding', 1, 64)})
               / (({_normn('q.qe', 1, 64)}) * ({_normn('e.embedding', 1, 64)})), 6)
           AS cos_full,
         round(({_dotn('q.qe', 'e.embedding', 1, MRL_PREFIX)})
               / (({_normn('q.qe', 1, MRL_PREFIX)}) * ({_normn('e.embedding', 1, MRL_PREFIX)})), 6)
           AS cos_trunc
  FROM q CROSS JOIN embeddings e WHERE e.vec_id <> q.q_id
),
rf AS (
  SELECT q_id, vec_id,
         row_number() OVER (PARTITION BY q_id ORDER BY cos_full DESC, vec_id ASC) AS r_full,
         row_number() OVER (PARTITION BY q_id ORDER BY cos_trunc DESC, vec_id ASC) AS r_trunc
  FROM p
)
SELECT q_id,
       CAST(sum(CASE WHEN r_full <= {MRL_K} AND r_trunc <= {MRL_K} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_common,
       round(CAST(sum(CASE WHEN r_full <= {MRL_K} AND r_trunc <= {MRL_K} THEN 1 ELSE 0 END)
             AS DOUBLE) / {MRL_K}, 6) AS recall_at_k
FROM rf GROUP BY q_id
""",
)
def matryoshka_truncation_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka truncation QA: for each md5-gated query vector, the
    top-k cosine neighbor overlap between the FULL 64-dim ranking and
    the ranking from the first 16 dims only — the decision read before
    shipping truncated embeddings (MRL-style) to cut index cost 4x.
    Recall@k per query is exact: both rankings round cosines before
    ranking with id tie-breaks, so the overlap count is engine-exact.
    Queries broadcast against the corpus (the corpus side never
    shuffles); the double-dot expression shares the single scan. At
    100 TB the candidate step is the bucketed ANN path, truncated and
    full rankings computed per bucket."""
    e = t(spark, sf_dir, "embeddings")
    q = e.where(F.expr(_MRL_SPARK)).selectExpr("vec_id AS q_id", "embedding AS qe")
    # repartition the corpus side first (single-split parquet would pin
    # the double-dot chain to one BroadcastNestedLoopJoin task)
    p = (
        e.repartition(int(spark.conf.get("spark.sql.shuffle.partitions")))
        .crossJoin(F.broadcast(q))
        .where(F.col("vec_id") != F.col("q_id"))
        .selectExpr(
            "q_id",
            "vec_id",
            f"round(({_dotn('qe', 'embedding', 0, 64)})"
            f" / (({_normn('qe', 0, 64)}) * ({_normn('embedding', 0, 64)})), 6)"
            " AS cos_full",
            f"round(({_dotn('qe', 'embedding', 0, MRL_PREFIX)})"
            f" / (({_normn('qe', 0, MRL_PREFIX)}) * ({_normn('embedding', 0, MRL_PREFIX)})), 6)"
            " AS cos_trunc",
        )
        # r12: no pin — ONE consumer (the chained window select), so the
        # dot-product stream pipelines straight into the first window
        # sort instead of materializing (single-consumer rule, change 28)
    )
    from pyspark.sql import Window

    wf = Window.partitionBy("q_id").orderBy(F.desc("cos_full"), F.asc("vec_id"))
    wt = Window.partitionBy("q_id").orderBy(F.desc("cos_trunc"), F.asc("vec_id"))
    rf = p.select(
        "q_id",
        "vec_id",
        F.row_number().over(wf).alias("r_full"),
        F.row_number().over(wt).alias("r_trunc"),
    )
    hit = (
        (F.col("r_full") <= MRL_K) & (F.col("r_trunc") <= MRL_K)
    ).cast("int")
    return rf.groupBy("q_id").agg(
        F.sum(hit).cast("long").alias("n_common"),
        F.round(F.sum(hit).cast("double") / MRL_K, 6).alias("recall_at_k"),
    )


# ---------------------------------------------------------------------------
# near_dup_threshold_sweep
# ---------------------------------------------------------------------------

SWEEP_PERMILLE = [500, 700, 800, 900]  # Jaccard thresholds x1000


@register(
    "near_dup_threshold_sweep",
    oracle=f"""
WITH tk AS (
  SELECT doc_id,
         list_distinct(list_transform(generate_series(1, greatest(len(toks) - 2, 1)),
           i -> array_to_string(toks[i:i+2], ' '))) AS sh
  FROM (SELECT doc_id,
               list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS toks
        FROM documents)
),
sz AS (SELECT doc_id, CAST(len(sh) AS BIGINT) AS n FROM tk),
ex AS (SELECT doc_id, unnest(sh) AS s FROM tk),
shared AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(count(*) AS BIGINT) AS c
  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
),
jp AS (
  SELECT shared.id_a, shared.id_b, shared.c, sa.n AS na, sb.n AS nb
  FROM shared JOIN sz sa ON sa.doc_id = shared.id_a
              JOIN sz sb ON sb.doc_id = shared.id_b
),
th AS (SELECT unnest([{", ".join(str(x) for x in SWEEP_PERMILLE)}]) AS permille)
SELECT th.permille,
       CAST(sum(CASE WHEN jp.c * 1000 >= th.permille * (jp.na + jp.nb - jp.c)
                THEN 1 ELSE 0 END) AS BIGINT) AS n_pairs,
       CAST(count(DISTINCT CASE WHEN jp.c * 1000 >= th.permille * (jp.na + jp.nb - jp.c)
                THEN jp.id_a END)
          + count(DISTINCT CASE WHEN jp.c * 1000 >= th.permille * (jp.na + jp.nb - jp.c)
                THEN jp.id_b END) AS BIGINT) AS n_doc_slots
FROM th CROSS JOIN jp
GROUP BY th.permille
""",
)
def near_dup_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup threshold-tuning curve: exact near-dup pair counts at
    a ladder of Jaccard thresholds (0.5/0.7/0.8/0.9), computed with the
    SAME shingle split as the production MinHash/LSH chain so the curve
    predicts exactly what each threshold would delete. Every knife edge
    is INTEGER-exact: jaccard >= t is evaluated as the cross-multiplied
    c*1000 >= permille*(na+nb-c) — no float ratio ever exists. Pair
    generation is the shared-shingle equi-join (never all-pairs); at
    100 TB the prefix/length filters of the ppjoin operator bound it,
    and the sweep itself adds zero shuffles (one conditional aggregate
    over the pair table)."""
    from .base import shingle_tables

    tk, ex = shingle_tables(spark, sf_dir, 3)
    sz = tk.select("doc_id", F.size("sh").cast("long").alias("n"))
    ea = ex.selectExpr("doc_id AS id_a", "s")
    eb = ex.selectExpr("doc_id AS id_b", "s")
    shared = (
        ea.join(eb, "s")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    # r12: no pin — jp has exactly ONE consumer (the sweep aggregate),
    # so the eager localCheckpoint only materialized the pair table for
    # nothing (the change-28 margin-frame case; A/B −0.6 s).
    jp = shared.join(
        F.broadcast(sz.selectExpr("doc_id AS id_a", "n AS na")), "id_a"
    ).join(F.broadcast(sz.selectExpr("doc_id AS id_b", "n AS nb")), "id_b")
    th = spark.createDataFrame(
        [(x,) for x in SWEEP_PERMILLE], "permille BIGINT"
    )
    hit = "jp_c * 1000 >= permille * (na + nb - jp_c)"
    return (
        jp.withColumnRenamed("c", "jp_c")
        .crossJoin(F.broadcast(th))
        .groupBy("permille")
        .agg(
            F.sum(F.expr(f"CASE WHEN {hit} THEN 1 ELSE 0 END"))
            .cast("long")
            .alias("n_pairs"),
            (
                F.countDistinct(F.expr(f"CASE WHEN {hit} THEN id_a END"))
                + F.countDistinct(F.expr(f"CASE WHEN {hit} THEN id_b END"))
            )
            .cast("long")
            .alias("n_doc_slots"),
        )
    )


# ---------------------------------------------------------------------------
# welch_t_test_price
# ---------------------------------------------------------------------------

@register(
    "welch_t_test_price",
    # r12: y in KILODOLLARS (t_stat and welch_df are unit-invariant;
    # mean_diff rescales back by one exact-operand multiply) so the
    # squared-price moment stays ~1e6 under the 9.0e15 wide-form guard
    # at sf1.0 instead of tripping it.
    oracle=f"""
WITH x AS (
  SELECT l_returnflag AS flag,
         CAST(round(l_extendedprice / 1000, 5) AS DECIMAL(18,5)) AS y
  FROM lineitem WHERE l_returnflag IN ('R', 'N')
),
s AS (
  SELECT flag, CAST(count(*) AS BIGINT) AS n,
         {_d2dws('sum(y)', 5)} AS sy,
         {_d2dws('sum(CAST(y*y AS DECIMAL(38,10)))', 10)} AS syy
  FROM x GROUP BY flag
),
w AS (
  SELECT
    max(CASE WHEN flag = 'R' THEN n END) AS n1,
    max(CASE WHEN flag = 'N' THEN n END) AS n2,
    max(CASE WHEN flag = 'R' THEN sy END) AS sy1,
    max(CASE WHEN flag = 'N' THEN sy END) AS sy2,
    max(CASE WHEN flag = 'R' THEN syy END) AS syy1,
    max(CASE WHEN flag = 'N' THEN syy END) AS syy2
  FROM s
)
SELECT n1, n2,
       round(1000 * (sy1/n1 - sy2/n2), 6) AS mean_diff,
       round((sy1/n1 - sy2/n2)
             / sqrt((syy1 - sy1*sy1/n1)/(n1 - 1)/n1
                    + (syy2 - sy2*sy2/n2)/(n2 - 1)/n2), 6) AS t_stat,
       round(
         ((syy1 - sy1*sy1/n1)/(n1 - 1)/n1 + (syy2 - sy2*sy2/n2)/(n2 - 1)/n2)
         * ((syy1 - sy1*sy1/n1)/(n1 - 1)/n1 + (syy2 - sy2*sy2/n2)/(n2 - 1)/n2)
         / ( ((syy1 - sy1*sy1/n1)/(n1 - 1)/n1) * ((syy1 - sy1*sy1/n1)/(n1 - 1)/n1) / (n1 - 1)
           + ((syy2 - sy2*sy2/n2)/(n2 - 1)/n2) * ((syy2 - sy2*sy2/n2)/(n2 - 1)/n2) / (n2 - 1)),
         6) AS welch_df
FROM w
""",
)
def welch_t_test_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance two-sample t-test (returned vs
    non-returned lineitem price) with Welch-Satterthwaite degrees of
    freedom — the mean-difference significance read that, unlike
    Student's t, survives the unequal group sizes/variances real data
    has (complements ANOVA's k-group F and KS's whole-distribution D).
    Co-moments are exact DECIMAL sums per group (one conditional
    aggregate); the statistic is the identical expression tree on the
    single pivoted moment row in both engines."""
    x = (
        t(spark, sf_dir, "lineitem")
        .where(F.col("l_returnflag").isin("R", "N"))
        .selectExpr(
            "l_returnflag AS flag",
            "CAST(round(l_extendedprice / 1000, 5) AS DECIMAL(18,5)) AS y",
        )
    )
    s = x.groupBy("flag").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        _d2dw(F.sum("y"), 5).alias("sy"),
        _d2dw(F.sum(F.expr("CAST(y*y AS DECIMAL(38,10))")), 10).alias("syy"),
    )
    w = s.agg(
        F.max(F.when(F.col("flag") == "R", F.col("n"))).alias("n1"),
        F.max(F.when(F.col("flag") == "N", F.col("n"))).alias("n2"),
        F.max(F.when(F.col("flag") == "R", F.col("sy"))).alias("sy1"),
        F.max(F.when(F.col("flag") == "N", F.col("sy"))).alias("sy2"),
        F.max(F.when(F.col("flag") == "R", F.col("syy"))).alias("syy1"),
        F.max(F.when(F.col("flag") == "N", F.col("syy"))).alias("syy2"),
    )
    v1 = "(syy1 - sy1*sy1/n1)/(n1 - 1)/n1"
    v2 = "(syy2 - sy2*sy2/n2)/(n2 - 1)/n2"
    return w.selectExpr(
        "n1",
        "n2",
        "round(1000 * (sy1/n1 - sy2/n2), 6) AS mean_diff",
        f"round((sy1/n1 - sy2/n2) / sqrt({v1} + {v2}), 6) AS t_stat",
        f"round(({v1} + {v2}) * ({v1} + {v2})"
        f" / ( ({v1}) * ({v1}) / (n1 - 1) + ({v2}) * ({v2}) / (n2 - 1)), 6) AS welch_df",
    )


# ---------------------------------------------------------------------------
# filter_kappa_agreement
# ---------------------------------------------------------------------------

# the two raters: mean-word-length gate and type-token-ratio gate, the
# SAME definitions as filter_agreement_matrix (pipelineq5)
from .pipelineq5 import FA_MAX_MWL, FA_MIN_MWL, FA_MIN_TTR  # noqa: E402
from .textops import DUCK_TOKS  # noqa: E402


@register(
    "filter_kappa_agreement",
    oracle=f"""
WITH stats AS (
  SELECT doc_id,
         CAST(len(toks) AS DOUBLE) AS n,
         CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE) AS tot_chars,
         CAST(len(list_distinct(toks)) AS DOUBLE) AS n_distinct
  FROM (SELECT doc_id, {DUCK_TOKS} AS toks FROM documents)
  WHERE len(toks) > 0
),
g AS (
  SELECT CASE WHEN tot_chars / n >= {FA_MIN_MWL} AND tot_chars / n <= {FA_MAX_MWL}
              THEN 1 ELSE 0 END AS a,
         CASE WHEN n_distinct / n >= {FA_MIN_TTR} THEN 1 ELSE 0 END AS b
  FROM stats
),
c AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(a * b) AS BIGINT) AS n11,
         CAST(sum(a * (1 - b)) AS BIGINT) AS n10,
         CAST(sum((1 - a) * b) AS BIGINT) AS n01,
         CAST(sum((1 - a) * (1 - b)) AS BIGINT) AS n00
  FROM g
)
SELECT n, n11, n10, n01, n00,
       round(CAST(n11 + n00 AS DOUBLE) / n, 9) AS p_observed,
       round((CAST(n11 + n10 AS DOUBLE) * CAST(n11 + n01 AS DOUBLE)
              + CAST(n01 + n00 AS DOUBLE) * CAST(n10 + n00 AS DOUBLE))
             / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)), 9) AS p_chance,
       round((CAST(n11 + n00 AS DOUBLE) / n
              - (CAST(n11 + n10 AS DOUBLE) * CAST(n11 + n01 AS DOUBLE)
                 + CAST(n01 + n00 AS DOUBLE) * CAST(n10 + n00 AS DOUBLE))
                / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
             / (1.0 - (CAST(n11 + n10 AS DOUBLE) * CAST(n11 + n01 AS DOUBLE)
                       + CAST(n01 + n00 AS DOUBLE) * CAST(n10 + n00 AS DOUBLE))
                      / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))), 9) AS kappa
FROM c
""",
)
def filter_kappa_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa between two quality gates (mean-word-length and
    type-token-ratio, the same definitions as filter_agreement_matrix)
    — CHANCE-CORRECTED rater agreement, the statistic behind 'do my two
    LLM judges / quality filters actually agree or do the base rates
    just overlap'. One corpus scan to the 2x2 contingency cell (four
    integers), then the kappa algebra on exact-integer ratios. Raw
    agreement can read 0.9 while kappa reads ~0 when both gates pass
    almost everything — this is the audit that catches it."""
    from ..functions.text import tokens_expr

    d = t(spark, sf_dir, "documents")
    ws = tokens_expr(F.col("text"))
    n = F.size(ws)
    nd = n.cast("double")
    tot_chars = F.aggregate(
        F.transform(ws, lambda x: F.length(x)), F.lit(0), lambda a, v: a + v
    ).cast("double")
    n_distinct = F.size(F.array_distinct(ws)).cast("double")
    g = d.filter(n > 0).select(
        F.when(
            (tot_chars / nd >= FA_MIN_MWL) & (tot_chars / nd <= FA_MAX_MWL), 1
        )
        .otherwise(0)
        .alias("a"),
        F.when(n_distinct / nd >= FA_MIN_TTR, 1).otherwise(0).alias("b"),
    )
    c = g.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("a") * F.col("b")).cast("long").alias("n11"),
        F.sum(F.col("a") * (1 - F.col("b"))).cast("long").alias("n10"),
        F.sum((1 - F.col("a")) * F.col("b")).cast("long").alias("n01"),
        F.sum((1 - F.col("a")) * (1 - F.col("b"))).cast("long").alias("n00"),
    )
    po = "CAST(n11 + n00 AS DOUBLE) / n"
    pe = (
        "(CAST(n11 + n10 AS DOUBLE) * CAST(n11 + n01 AS DOUBLE)"
        " + CAST(n01 + n00 AS DOUBLE) * CAST(n10 + n00 AS DOUBLE))"
        " / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))"
    )
    return c.selectExpr(
        "n",
        "n11",
        "n10",
        "n01",
        "n00",
        f"round({po}, 9) AS p_observed",
        f"round({pe}, 9) AS p_chance",
        f"round(({po} - {pe}) / (1.0 - {pe}), 9) AS kappa",
    )
