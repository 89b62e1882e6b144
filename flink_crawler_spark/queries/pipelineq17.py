"""Wave 18: corpus-weighting, retrieval-training, and audit statistics.

  * softdedup_loss_weights — SoftDeDup-style per-document loss/sampling
    weights from corpus-wide shingle commonness (down-weight instead of
    drop: the soft alternative to hard near-dup removal).
  * hard_negative_mining — per-anchor top-k nearest embeddings among
    OTHER labels: the contrastive-training data generator.
  * benford_price_digits — first-significant-digit distribution vs
    Benford's law (fraud/data-quality audit) with MAD and chi-square.
  * acf_daily_revenue — autocorrelation function (lags 1..7) of the
    daily revenue series from exact day-level decimal rollups.

All exact-value DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.dedup import shingles_expr
from .base import dec_to_double_wide as _d2dw
from .base import dec_to_double_wide_sql as _d2dws
from .base import ann_exact_path, register, t
from .simq import _dot_sql, _norm_sql

# ---------------------------------------------------------------------------
# softdedup_loss_weights
# ---------------------------------------------------------------------------

# word tokens / distinct 3-gram shingles — the same split the Spark-side
# dedup operators use (dedupq.DUCK_TOKS twin, kept local to this module)
_DUCK_TOKS = "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')"
_DUCK_SHINGLES = (
    "list_distinct(list_transform(generate_series(1, greatest(len(toks) - 2, 1)),"
    " i -> array_to_string(toks[i:i+2], ' ')))"
)


@register(
    "softdedup_loss_weights",
    oracle=f"""
WITH tk AS (SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents),
sh AS (SELECT doc_id, unnest({_DUCK_SHINGLES}) AS s FROM tk),
c AS (SELECT s, CAST(count(*) AS BIGINT) AS c FROM sh GROUP BY s),
d AS (
  SELECT sh.doc_id, CAST(count(*) AS BIGINT) AS n_shingles,
         CAST(sum(c.c) AS BIGINT) AS sum_c
  FROM sh JOIN c USING (s) GROUP BY sh.doc_id
)
SELECT doc_id, n_shingles,
       round(CAST(sum_c AS DOUBLE) / CAST(n_shingles AS DOUBLE), 9) AS mean_dup_count,
       round(CAST(n_shingles AS DOUBLE) / CAST(sum_c AS DOUBLE), 9) AS soft_weight
FROM d
""",
)
def softdedup_loss_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SoftDeDup-style loss reweighting (Xue et al. 2024, "to code or
    not to code" lineage of soft dedup): instead of DROPPING near-dups,
    every document gets a training weight 1/commonness, where
    commonness is the mean corpus-wide occurrence count of its distinct
    word 3-gram shingles. Uses the SAME shingle split as the
    MinHash/LSH chain, so the weight is consistent with the hard-dedup
    view of the corpus. Plan: one shingle explode (map-side), one
    count-by-shingle shuffle, one join back on the shingle key —
    exactly the MinHash cost envelope, no pairwise anything; at 100 TB
    the shingle-count table is the only large intermediate and it
    shuffles once."""
    from .base import shingle_tables

    _, sh = shingle_tables(spark, sf_dir, 3)
    c = sh.groupBy("s").agg(F.count(F.lit(1)).cast("long").alias("c"))
    d = (
        sh.join(c, "s")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_shingles"),
            F.sum("c").cast("long").alias("sum_c"),
        )
    )
    return d.selectExpr(
        "doc_id",
        "n_shingles",
        "round(CAST(sum_c AS DOUBLE) / CAST(n_shingles AS DOUBLE), 9) AS mean_dup_count",
        "round(CAST(n_shingles AS DOUBLE) / CAST(sum_c AS DOUBLE), 9) AS soft_weight",
    )


# ---------------------------------------------------------------------------
# hard_negative_mining
# ---------------------------------------------------------------------------

HARDNEG_K = 5
# Above this TOTAL embeddings row count the exact anchors x corpus
# broadcast pass gives way to the bucketed IVF candidate join — test
# scales stay exact (and oracle-comparable), 100 TB runs never form the
# cross product. Path pick: base.ann_exact_path — parquet-footer count
# (no Spark action) + FCS_ANN_CANDIDATES override + loud warn on flip.
HARDNEG_MAX_EXACT_ROWS = 100_000
HARDNEG_N_LISTS = 16
HARDNEG_N_PROBE = 4
# ~1/16 of vectors are anchors — an md5 gate, NOT a linear id%k residue
# (the known degenerate-map trap on derived synthetic ids)
_ANCHOR_DUCK = "substr(md5(CAST(vec_id AS VARCHAR)), 1, 1) = '0'"
_ANCHOR_SPARK = "substr(md5(CAST(vec_id AS STRING)), 1, 1) = '0'"


@register(
    "hard_negative_mining",
    oracle=f"""
WITH a AS (
  SELECT vec_id AS a_id, embedding AS a_emb, label AS a_label
  FROM embeddings WHERE {_ANCHOR_DUCK}
),
p AS (
  SELECT a.a_id, e.vec_id AS neg_id,
         round(({_dot_sql('a.a_emb', 'e.embedding', 1)})
               / (({_norm_sql('a.a_emb', 1)}) * ({_norm_sql('e.embedding', 1)})), 6)
           AS cosine
  FROM a CROSS JOIN embeddings e
  WHERE e.label <> a.a_label
),
r AS (
  SELECT a_id, neg_id, cosine,
         CAST(row_number() OVER (PARTITION BY a_id ORDER BY cosine DESC, neg_id ASC)
              AS BIGINT) AS rnk
  FROM p
)
SELECT a_id, neg_id, cosine, rnk FROM r WHERE rnk <= {HARDNEG_K}
""",
)
def hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive/retrieval training: for each
    anchor vector (a deterministic md5-gated ~1/16 sample), the top-k
    most-similar embeddings with a DIFFERENT label — the negatives that
    actually teach the model something. Below HARDNEG_MAX_EXACT_ROWS the
    candidate step is the exact broadcast pass (anchors broadcast, the
    corpus side never shuffles); above it, candidates route through the
    bucketed IVF join (``ivf_probe_candidates`` — corpus rows live in
    their nearest-centroid list, anchors probe n_probe lists, candidates
    come from an equi-join on the list id, never a cross join), the same
    guard discipline ``exact_cosine_pairs`` applies to its collect path.
    Cosine is the same unrolled left-associated 64-term chain both
    engines run, rounded BEFORE ranking so rank boundaries agree.
    Equivalence of the two candidate paths is property-tested in
    tests/test_ann_guard.py (n_probe == n_lists ==> identical output)."""
    return _hard_negative_impl(spark, sf_dir)


def _hard_negative_impl(
    spark: SparkSession,
    sf_dir: str,
    *,
    max_exact_rows: int = HARDNEG_MAX_EXACT_ROWS,
    n_lists: int = HARDNEG_N_LISTS,
    n_probe: int = HARDNEG_N_PROBE,
) -> DataFrame:
    e = t(spark, sf_dir, "embeddings")
    anch = e.where(F.expr(_ANCHOR_SPARK)).select(
        F.col("vec_id").alias("a_id"),
        F.col("embedding").alias("a_emb"),
        F.col("label").alias("a_label"),
    )
    if ann_exact_path(sf_dir, max_exact_rows, query="hard_negative_mining"):
        # repartition the corpus side first — a small parquet scan is ONE
        # split, which would serialize the anchor x corpus cosine chain
        # through a single BroadcastNestedLoopJoin task
        cand = e.repartition(
            int(spark.conf.get("spark.sql.shuffle.partitions"))
        ).crossJoin(F.broadcast(anch))
    else:
        from ..operators.similarity import ivf_centroids, ivf_probe_candidates

        cents = ivf_centroids(e, n_lists=n_lists)
        cand = ivf_probe_candidates(
            anch,
            e,
            centroids=cents,
            n_probe=n_probe,
            query_vec_col="a_emb",
            corpus_vec_col="embedding",
        )
    pairs = cand.where(F.col("label") != F.col("a_label")).select(
        "a_id",
        F.col("vec_id").alias("neg_id"),
        F.expr(
            f"round(({_dot_sql('a_emb', 'embedding', 0)})"
            f" / (({_norm_sql('a_emb', 0)}) * ({_norm_sql('embedding', 0)})), 6)"
        ).alias("cosine"),
    )
    w = Window.partitionBy("a_id").orderBy(F.desc("cosine"), F.asc("neg_id"))
    return (
        pairs.withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= HARDNEG_K)
        .select("a_id", "neg_id", "cosine", "rnk")
    )


# ---------------------------------------------------------------------------
# benford_price_digits
# ---------------------------------------------------------------------------

@register(
    "benford_price_digits",
    oracle=f"""
WITH px AS (
  SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS VARCHAR), 1, 1)
              AS BIGINT) AS digit
  FROM orders WHERE o_totalprice > 0
),
cnt AS (SELECT digit, CAST(count(*) AS BIGINT) AS n_obs FROM px GROUP BY digit),
spine AS (SELECT unnest(generate_series(1, 9)) AS digit),
wide AS (
  SELECT spine.digit, CAST(coalesce(cnt.n_obs, 0) AS BIGINT) AS n_obs
  FROM spine LEFT JOIN cnt ON cnt.digit = spine.digit
),
tot AS (SELECT CAST(sum(n_obs) AS BIGINT) AS n FROM wide),
terms AS (
  SELECT digit, n_obs,
         round(CAST(n_obs AS DOUBLE) / CAST(n AS DOUBLE), 9) AS p_obs,
         round(log10(1.0 + 1.0 / CAST(digit AS DOUBLE)), 9) AS p_benford,
         CAST(round(abs(CAST(n_obs AS DOUBLE) / CAST(n AS DOUBLE)
                        - log10(1.0 + 1.0 / CAST(digit AS DOUBLE))), 10)
              AS DECIMAL(38,10)) AS dev,
         CAST(round(CAST(n AS DOUBLE)
                    * (CAST(n_obs AS DOUBLE) / CAST(n AS DOUBLE)
                       - log10(1.0 + 1.0 / CAST(digit AS DOUBLE)))
                    * (CAST(n_obs AS DOUBLE) / CAST(n AS DOUBLE)
                       - log10(1.0 + 1.0 / CAST(digit AS DOUBLE)))
                    / log10(1.0 + 1.0 / CAST(digit AS DOUBLE)), 9)
              AS DECIMAL(38,9)) AS chi2_term
  FROM wide CROSS JOIN tot
)
SELECT digit, n_obs, p_obs, p_benford,
       round(CAST(dev AS DOUBLE), 10) AS abs_dev,
       round({_d2dws('sum(dev) OVER ()', 10)} / 9, 9) AS mad,
       round({_d2dws('sum(chi2_term) OVER ()', 9)}, 6) AS chi2
FROM terms
""",
)
def benford_price_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law audit of the order-price first significant digit —
    the classic fabricated-data / corrupted-feed detector. The digit is
    extracted integer-exactly (first digit of the cent value equals the
    first significant digit for positive prices — no float log
    bucketing), counted in one scan, and compared against
    log10(1 + 1/d) with mean-absolute-deviation and chi-square
    statistics computed on the 9-row digit table. Everything after the
    single count aggregate is constant-size."""
    px = (
        t(spark, sf_dir, "orders")
        .where(F.col("o_totalprice") > 0)
        .select(
            F.expr(
                "CAST(substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS STRING), 1, 1)"
                " AS BIGINT)"
            ).alias("digit")
        )
    )
    cnt = px.groupBy("digit").agg(F.count(F.lit(1)).cast("long").alias("n_obs"))
    spine = spark.range(1, 10).select(F.col("id").alias("digit"))
    wide = (
        spine.join(cnt, "digit", "left")
        .select("digit", F.coalesce("n_obs", F.lit(0)).cast("long").alias("n_obs"))
        .localCheckpoint(eager=True)
    )
    tot = wide.agg(F.sum("n_obs").cast("long").alias("n"))
    pb = "log10(1.0 + 1.0 / CAST(digit AS DOUBLE))"
    po = "CAST(n_obs AS DOUBLE) / CAST(n AS DOUBLE)"
    terms = (
        wide.crossJoin(F.broadcast(tot))
        .selectExpr(
            "digit",
            "n_obs",
            f"round({po}, 9) AS p_obs",
            f"round({pb}, 9) AS p_benford",
            f"CAST(round(abs({po} - {pb}), 10) AS DECIMAL(38,10)) AS dev",
            f"CAST(round(CAST(n AS DOUBLE) * ({po} - {pb}) * ({po} - {pb}) / {pb}, 9)"
            " AS DECIMAL(38,9)) AS chi2_term",
        )
        .localCheckpoint(eager=True)
    )
    tots = terms.agg(
        F.round(_d2dw(F.sum("dev"), 10) / 9, 9).alias("mad"),
        F.round(_d2dw(F.sum("chi2_term"), 9), 6).alias("chi2"),
    )
    return (
        terms.crossJoin(F.broadcast(tots))
        .selectExpr(
            "digit",
            "n_obs",
            "p_obs",
            "p_benford",
            "round(CAST(dev AS DOUBLE), 10) AS abs_dev",
            "mad",
            "chi2",
        )
    )


# ---------------------------------------------------------------------------
# acf_daily_revenue
# ---------------------------------------------------------------------------

ACF_MAX_LAG = 7


@register(
    "acf_daily_revenue",
    oracle=f"""
WITH d AS (
  SELECT date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS day_idx,
         CAST(sum(CAST(round(o_totalprice, 2) AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS rev
  FROM orders GROUP BY 1
),
st AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         {_d2dws('sum(rev)', 2)} / count(*) AS mean_rev
  FROM d
),
dd AS (
  SELECT day_idx, ({_d2dws('rev', 2)} - st.mean_rev) / 1000 AS dev
  FROM d CROSS JOIN st
),
den AS (
  SELECT {_d2dws('sum(CAST(round(dev * dev, 6) AS DECIMAL(38,6)))')} AS den
  FROM dd
),
lags AS (SELECT unnest(generate_series(1, {ACF_MAX_LAG})) AS lag),
num AS (
  SELECT lags.lag,
         CAST(count(*) AS BIGINT) AS n_pairs,
         {_d2dws('sum(CAST(round(a.dev * b.dev, 6) AS DECIMAL(38,6)))')} AS num
  FROM lags
  CROSS JOIN dd a
  JOIN dd b ON b.day_idx = a.day_idx + lags.lag
  GROUP BY lags.lag
)
SELECT num.lag, num.n_pairs,
       round(num.num / den.den, 9) AS acf
FROM num CROSS JOIN den
""",
)
def acf_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation function (lags 1..7) of the daily revenue
    series — the seasonality/memory diagnostic a forecasting pipeline
    runs before model choice (pairs with seasonal_decompose_weekly).
    The day-level rollup is the only data-sized aggregate; the series
    itself is CALENDAR-bounded (~2.4k rows here, ~36.5k for a century),
    so the lag self-join and the co-moment sums are tiny by
    construction. Deviation products are rounded once and
    DECIMAL-summed, so numerator/denominator — and hence the ACF — are
    bit-identical across engines."""
    d = (
        t(spark, sf_dir, "orders")
        .groupBy(
            F.datediff(
                F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date")
            )
            .cast("long")
            .alias("day_idx")
        )
        .agg(
            F.sum(F.round("o_totalprice", 2).cast("decimal(18,2)"))
            .cast("decimal(38,2)")
            .alias("rev")
        )
        .localCheckpoint(eager=True)
    )
    st = d.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        (_d2dw(F.sum("rev"), 2) / F.count(F.lit(1))).alias("mean_rev"),
    )
    # r12: deviations in KILODOLLARS — acf is unit-invariant (the 1e-6
    # factor cancels in num/den) and the rescale keeps the co-moment
    # sums ~1e6 under the dsum_wide 9.0e15 guard at sf1.0 magnitudes.
    dd = d.crossJoin(F.broadcast(st)).select(
        "day_idx", ((_d2dw(F.col("rev"), 2) - F.col("mean_rev")) / 1000).alias("dev")
    )
    den = dd.select(
        F.round(F.col("dev") * F.col("dev"), 6).cast("decimal(38,6)").alias("dd2")
    ).agg(_d2dw(F.sum("dd2")).alias("den"))
    lags = spark.range(1, ACF_MAX_LAG + 1).select(F.col("id").alias("lag"))
    a = dd.selectExpr("day_idx", "dev AS dev_a")
    b = dd.selectExpr("day_idx AS day_b", "dev AS dev_b")
    num = (
        a.crossJoin(F.broadcast(lags))
        .join(b, F.col("day_b") == F.col("day_idx") + F.col("lag"))
        .select(
            "lag",
            F.round(F.col("dev_a") * F.col("dev_b"), 6)
            .cast("decimal(38,6)")
            .alias("pp"),
        )
        .groupBy("lag")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            _d2dw(F.sum("pp")).alias("num"),
        )
    )
    return num.crossJoin(F.broadcast(den)).selectExpr(
        "lag", "n_pairs", "round(num / den, 9) AS acf"
    )
