"""Wave 19: classifier training, feature screening, smoothing, density.

  * naive_bayes_lang_classify — multinomial Naive Bayes language
    classifier trained on an md5-gated split, evaluated as a confusion
    matrix on the held-out half: classifier TRAINING as aggregation.
  * info_gain_feature_rank — information gain (mutual information) of
    candidate categorical features against the urgent-priority label,
    ranked: the decision-tree / feature-selection screen.
  * ewma_smoothed_revenue — exponentially weighted moving average of
    daily revenue with Python-inlined literal weights (no cross-engine
    pow drift), gap-renormalized.
  * dbscan_core_points — DBSCAN core-point classification over the
    embedding table (>= MIN_PTS neighbors at cosine >= EPS).

All exact-value DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .base import dec_to_double_wide as _d2dw
from .base import dec_to_double_wide_sql as _d2dws
from .base import register, t
from .simq import _dot_sql, _norm_sql

# ---------------------------------------------------------------------------
# naive_bayes_lang_classify
# ---------------------------------------------------------------------------

# train/test split on an md5 hex digit: '0'-'7' trains (~50%), rest evaluates
_TRAIN_DUCK = "substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) <= '7'"
_TRAIN_SPARK = "substr(md5(CAST(doc_id AS STRING)), 1, 1) <= '7'"
_DUCK_TOKS = "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')"


@register(
    "naive_bayes_lang_classify",
    oracle=f"""
WITH tk AS (
  SELECT doc_id, lang, unnest({_DUCK_TOKS}) AS tok,
         CASE WHEN {_TRAIN_DUCK} THEN 1 ELSE 0 END AS is_train
  FROM documents
),
vocab AS (SELECT DISTINCT tok FROM tk WHERE is_train = 1),
vsz AS (SELECT CAST(count(*) AS BIGINT) AS v FROM vocab),
cls AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS tot_toks
  FROM tk WHERE is_train = 1 GROUP BY lang
),
prior AS (
  SELECT lang, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
  FROM tk WHERE is_train = 1 GROUP BY lang
),
ptot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS n FROM prior),
tc AS (
  SELECT lang, tok, CAST(count(*) AS BIGINT) AS c
  FROM tk WHERE is_train = 1 GROUP BY lang, tok
),
dense AS (
  SELECT cls.lang, vocab.tok,
         CAST(round(ln(CAST(coalesce(tc.c, 0) + 1 AS DOUBLE)
                       / CAST(cls.tot_toks + vsz.v AS DOUBLE)), 12)
              AS DECIMAL(38,12)) AS logp
  FROM cls CROSS JOIN vocab CROSS JOIN vsz
  LEFT JOIN tc ON tc.lang = cls.lang AND tc.tok = vocab.tok
),
test AS (SELECT doc_id, lang AS true_lang, tok FROM tk WHERE is_train = 0),
scored AS (
  SELECT test.doc_id, test.true_lang, dense.lang AS cand,
         sum(dense.logp) AS tok_ll
  FROM test JOIN dense ON dense.tok = test.tok
  GROUP BY test.doc_id, test.true_lang, dense.lang
),
with_prior AS (
  SELECT scored.doc_id, scored.true_lang, scored.cand,
         scored.tok_ll
           + CAST(round(ln(CAST(prior.n_docs AS DOUBLE) / CAST(ptot.n AS DOUBLE)), 12)
                  AS DECIMAL(38,12)) AS ll
  FROM scored JOIN prior ON prior.lang = scored.cand CROSS JOIN ptot
),
pred AS (
  SELECT doc_id, true_lang, cand AS pred_lang,
         row_number() OVER (PARTITION BY doc_id ORDER BY ll DESC, cand ASC) AS rn
  FROM with_prior
)
SELECT true_lang, pred_lang, CAST(count(*) AS BIGINT) AS n_docs
FROM pred WHERE rn = 1
GROUP BY true_lang, pred_lang
""",
)
def naive_bayes_lang_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial Naive Bayes trained AS AGGREGATION: per-(lang, token)
    Laplace-smoothed log-likelihoods from the md5-gated train half, a
    dense (class x vocab) broadcast model table, and held-out docs
    scored by one join + one sum — then a confusion matrix. This is the
    100 TB classifier-training shape: the model is a constant-size
    aggregate (|vocab| x |classes| rows), the corpus is scanned twice
    (train counts, test scoring) and never pairwise. Token log-probs
    are rounded once to 12dp and DECIMAL-summed, so the per-class
    scores — and hence the argmax — are bit-identical across engines
    (ties broken by language name)."""
    from ..operators import ensure_parallelism

    # r12 (guide §2.5): the tokenize+explode materialization below ran on
    # the single-row-group scan's ONE task; spread before exploding
    tk = (
        ensure_parallelism(t(spark, sf_dir, "documents"))
        .select(
            "doc_id",
            "lang",
            F.explode(
                F.filter(
                    F.split(F.lower("text"), "[^a-z0-9]+"), lambda x: x != ""
                )
            ).alias("tok"),
            F.expr(f"CASE WHEN {_TRAIN_SPARK} THEN 1 ELSE 0 END").alias("is_train"),
        )
        .localCheckpoint(eager=True)
    )
    train = tk.where(F.col("is_train") == 1)
    vocab = train.select("tok").distinct()
    vsz = vocab.agg(F.count(F.lit(1)).cast("long").alias("v"))
    cls = train.groupBy("lang").agg(F.count(F.lit(1)).cast("long").alias("tot_toks"))
    prior = train.groupBy("lang").agg(
        F.countDistinct("doc_id").cast("long").alias("n_docs")
    )
    ptot = prior.agg(F.sum("n_docs").cast("long").alias("n"))
    tc = train.groupBy("lang", "tok").agg(F.count(F.lit(1)).cast("long").alias("c"))
    dense = (
        cls.crossJoin(vocab)
        .crossJoin(F.broadcast(vsz))
        .join(tc, ["lang", "tok"], "left")
        .selectExpr(
            "lang",
            "tok",
            "CAST(round(ln(CAST(coalesce(c, 0) + 1 AS DOUBLE)"
            " / CAST(tot_toks + v AS DOUBLE)), 12) AS DECIMAL(38,12)) AS logp",
        )
    )
    test = tk.where(F.col("is_train") == 0).select(
        "doc_id", F.col("lang").alias("true_lang"), "tok"
    )
    scored = (
        test.join(F.broadcast(dense), "tok")
        .groupBy("doc_id", "true_lang", F.col("lang").alias("cand"))
        .agg(F.sum("logp").alias("tok_ll"))
    )
    with_prior = (
        scored.join(F.broadcast(prior), scored["cand"] == prior["lang"])
        .crossJoin(F.broadcast(ptot))
        .selectExpr(
            "doc_id",
            "true_lang",
            "cand",
            "tok_ll + CAST(round(ln(CAST(n_docs AS DOUBLE) / CAST(n AS DOUBLE)), 12)"
            " AS DECIMAL(38,12)) AS ll",
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("ll"), F.asc("cand"))
    return (
        with_prior.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .groupBy("true_lang", F.col("cand").alias("pred_lang"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    )


# ---------------------------------------------------------------------------
# info_gain_feature_rank
# ---------------------------------------------------------------------------

# candidate categorical features on orders, as (name, duck_expr, spark_expr)
_FEATURES = [
    ("order_status", "o_orderstatus", "o_orderstatus"),
    ("order_year", "CAST(year(o_orderdate) AS VARCHAR)", "CAST(year(o_orderdate) AS STRING)"),
    ("order_month", "CAST(month(o_orderdate) AS VARCHAR)", "CAST(month(o_orderdate) AS STRING)"),
]
_LABEL = "CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END"


def _ig_union(exprs: list[tuple[str, str]]) -> str:
    return "\nUNION ALL\n".join(
        f"SELECT '{name}' AS feature, {e} AS val, {_LABEL} AS y FROM orders"
        for name, e in exprs
    )


_COND_TERM_SUM = (
    "sum(CAST(round("
    "(CAST(cell.n AS DOUBLE)/CAST(hy.tn AS DOUBLE)) * ("
    "-(CASE WHEN cell.pos = 0 THEN 0.0"
    " ELSE (CAST(cell.pos AS DOUBLE)/CAST(cell.n AS DOUBLE))"
    " * ln(CAST(cell.pos AS DOUBLE)/CAST(cell.n AS DOUBLE)) END)"
    " -(CASE WHEN cell.pos = cell.n THEN 0.0"
    " ELSE (CAST(cell.n - cell.pos AS DOUBLE)/CAST(cell.n AS DOUBLE))"
    " * ln(CAST(cell.n - cell.pos AS DOUBLE)/CAST(cell.n AS DOUBLE)) END)"
    "), 12) AS DECIMAL(38,12)))"
)


@register(
    "info_gain_feature_rank",
    oracle=f"""
WITH fv AS ({_ig_union([(n, d) for n, d, _ in _FEATURES])}),
cell AS (
  SELECT feature, val, CAST(sum(y) AS BIGINT) AS pos, CAST(count(*) AS BIGINT) AS n
  FROM fv GROUP BY feature, val
),
tot AS (
  SELECT feature, CAST(sum(pos) AS BIGINT) AS tpos, CAST(sum(n) AS BIGINT) AS tn,
         CAST(count(*) AS BIGINT) AS n_values
  FROM cell GROUP BY feature
),
hy AS (
  SELECT feature, tpos, tn, n_values,
         -(CASE WHEN tpos = 0 THEN 0.0 ELSE (CAST(tpos AS DOUBLE)/CAST(tn AS DOUBLE))
                * ln(CAST(tpos AS DOUBLE)/CAST(tn AS DOUBLE)) END)
         -(CASE WHEN tpos = tn THEN 0.0 ELSE (CAST(tn - tpos AS DOUBLE)/CAST(tn AS DOUBLE))
                * ln(CAST(tn - tpos AS DOUBLE)/CAST(tn AS DOUBLE)) END) AS h_y
  FROM tot
),
cond AS (
  SELECT cell.feature,
         {_d2dws(_COND_TERM_SUM, 12)} AS h_cond
  FROM cell JOIN hy ON hy.feature = cell.feature
  GROUP BY cell.feature
)
SELECT hy.feature, hy.n_values,
       round(hy.h_y - cond.h_cond, 9) AS info_gain,
       CAST(row_number() OVER (ORDER BY round(hy.h_y - cond.h_cond, 9) DESC, hy.feature ASC)
            AS BIGINT) AS rnk
FROM hy JOIN cond ON cond.feature = hy.feature
""",
)
def info_gain_feature_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Information gain (mutual information) of candidate categorical
    features against the urgent-priority label, ranked — the
    feature-selection / decision-stump screen (complements woe_iv's
    numeric binning). Each feature is one conditional-count aggregate;
    entropies live on the cardinality-bounded (feature, value) cell
    table, with per-value conditional-entropy terms rounded once and
    DECIMAL-summed so the gain — and the rank — is engine-exact. The
    3-way feature union is one scan each (Catalyst collapses the
    shared source); the final rank window runs on a 3-row table."""
    orders = t(spark, sf_dir, "orders")
    fv = None
    for name, _, se in _FEATURES:
        part = orders.selectExpr(
            f"'{name}' AS feature", f"{se} AS val", f"{_LABEL} AS y"
        )
        fv = part if fv is None else fv.unionAll(part)
    cell = fv.groupBy("feature", "val").agg(
        F.sum("y").cast("long").alias("pos"), F.count(F.lit(1)).cast("long").alias("n")
    )
    tot = cell.groupBy("feature").agg(
        F.sum("pos").cast("long").alias("tpos"),
        F.sum("n").cast("long").alias("tn"),
        F.count(F.lit(1)).cast("long").alias("n_values"),
    )
    hy = tot.selectExpr(
        "feature",
        "tpos",
        "tn",
        "n_values",
        "-(CASE WHEN tpos = 0 THEN 0.0 ELSE (CAST(tpos AS DOUBLE)/CAST(tn AS DOUBLE))"
        " * ln(CAST(tpos AS DOUBLE)/CAST(tn AS DOUBLE)) END)"
        " -(CASE WHEN tpos = tn THEN 0.0 ELSE (CAST(tn - tpos AS DOUBLE)/CAST(tn AS DOUBLE))"
        " * ln(CAST(tn - tpos AS DOUBLE)/CAST(tn AS DOUBLE)) END) AS h_y",
    )
    cond = (
        cell.join(F.broadcast(hy.select("feature", "tn")), "feature")
        .selectExpr(
            "feature",
            "CAST(round((CAST(n AS DOUBLE)/CAST(tn AS DOUBLE)) * ("
            " -(CASE WHEN pos = 0 THEN 0.0 ELSE (CAST(pos AS DOUBLE)/CAST(n AS DOUBLE))"
            " * ln(CAST(pos AS DOUBLE)/CAST(n AS DOUBLE)) END)"
            " -(CASE WHEN pos = n THEN 0.0 ELSE (CAST(n - pos AS DOUBLE)/CAST(n AS DOUBLE))"
            " * ln(CAST(n - pos AS DOUBLE)/CAST(n AS DOUBLE)) END)"
            "), 12) AS DECIMAL(38,12)) AS term",
        )
        .groupBy("feature")
        .agg(_d2dw(F.sum("term"), 12).alias("h_cond"))
    )
    joined = hy.join(cond, "feature").withColumn(
        "info_gain", F.round(F.col("h_y") - F.col("h_cond"), 9)
    )
    # one row per candidate feature: rank via the triangular broadcast
    # self-join — no unpartitioned WindowExec at all (r7 task 7; the r6
    # structural limit() existed only to satisfy the window lint)
    from ..operators.windows import bounded_row_number

    return bounded_row_number(
        joined.select("feature", "n_values", "info_gain"),
        [("info_gain", False), ("feature", True)],
        out="rnk",
    ).select("feature", "n_values", "info_gain", F.col("rnk").cast("long").alias("rnk"))


# ---------------------------------------------------------------------------
# ewma_smoothed_revenue
# ---------------------------------------------------------------------------

EWMA_ALPHA = 0.3
EWMA_WINDOW = 30
# literal NORMALIZED weights (alpha*(1-alpha)^k) / sum-over-window,
# inlined into BOTH engines: no pow(), and — crucially — no final
# division, so the output is a rounded-once DECIMAL sum (a num/den
# quotient of two near-16-digit doubles is unstable at the rounding
# boundary; this formulation has no quotient at all)
_EWMA_RAW = [EWMA_ALPHA * (1 - EWMA_ALPHA) ** k for k in range(EWMA_WINDOW)]
_EWMA_NW = [w / sum(_EWMA_RAW) for w in _EWMA_RAW]
# weights as E-NOTATION literals: both engines parse exponent literals
# straight to DOUBLE (correctly-rounded strtod -> identical bits),
# whereas a bare decimal literal parses as DECIMAL with engine-specific
# scale capping first — an ulp-level weight skew that at sf0.1
# magnitudes lands floor(x*1e6 + 0.5) astride integer boundaries
# (caught by the first full sf0.1 oracle gate, r10)
_EWMA_CASE = "CASE " + " ".join(
    f"WHEN lagk = {k} THEN {w:.17e}" for k, w in enumerate(_EWMA_NW)
) + " END"


@register(
    "ewma_smoothed_revenue",
    oracle=f"""
WITH d AS (
  SELECT date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS day_idx,
         CAST(sum(CAST(round(o_totalprice, 2) AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS rev
  FROM orders GROUP BY 1
),
pairs AS (
  SELECT a.day_idx, a.rev, a.day_idx - b.day_idx AS lagk, b.rev AS rev_b
  FROM d a JOIN d b
    ON b.day_idx <= a.day_idx AND b.day_idx > a.day_idx - {EWMA_WINDOW}
),
wsum AS (
  SELECT day_idx, min(rev) AS rev,
         sum(CAST(floor(({_EWMA_CASE}) * CAST(rev_b AS DOUBLE) * 1e6 + 0.5)
                  AS DECIMAL(38,0))) AS s
  FROM pairs GROUP BY day_idx
)
SELECT day_idx, CAST(rev AS DOUBLE) AS revenue,
       CAST(s AS DOUBLE) / 1e6 AS ewma
FROM wsum
""",
)
def ewma_smoothed_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average of daily revenue
    (alpha=0.3, 30-day horizon; days missing from the series act as
    zero revenue, which is the correct semantics for a revenue rate) —
    the smoothing pass behind rate dashboards and anomaly baselines.
    The recurrence is UNROLLED into a banded self-join with
    PYTHON-INLINED literal normalized weights, so neither engine
    evaluates pow() OR a final quotient: each term is rounded once and
    the output is an exact DECIMAL sum — bit-identical, and — unlike
    the sequential recurrence — embarrassingly parallel. The join is
    calendar-bounded (|days| x 30 rows); the day rollup is the only
    data-sized step."""
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
    a = d.selectExpr("day_idx", "rev")
    b = d.selectExpr("day_idx AS day_b", "rev AS rev_b")
    pairs = a.join(
        b,
        (F.col("day_b") <= F.col("day_idx"))
        & (F.col("day_b") > F.col("day_idx") - EWMA_WINDOW),
    ).selectExpr("day_idx", "rev", "day_idx - day_b AS lagk", "rev_b")
    # r10 (caught by the first full sf0.1 oracle gate): per-term
    # rounding is floor(x*1e6 + 0.5) — every op IEEE-identical across
    # engines — instead of round(x, 6), whose engine implementations
    # (BigDecimal HALF_UP vs multiply-then-nearbyint) disagree when
    # x*1e6 sits within a few ulps of a half-integer; at sf0.1
    # magnitudes (~4.5e12 scaled) that band is wide enough to draw one
    # term per ~70k and flip the 6th decimal of a day's sum. The final
    # value is the exact integer sum divided by 1e6 once (s <= 1.35e14
    # < 2^53, so both the floor integers and the quotient are exact /
    # correctly-rounded doubles in both engines — no final round()).
    # r11 (advice): the exactness proof above needs every scaled term —
    # and, because the normalized weights sum to 1, the day-sum s — to
    # stay below 2^53. Assert it per row instead of trusting the sf0.1
    # bound: |rev_b|*1e6 < 4.5e15 keeps s < 4.5e15 + EWMA_WINDOW (half-up
    # slack) < 2^53 = 9.007e15. At sf0.1 the max is ~4.5e12, so the
    # guard trips around sf~100 — loudly, naming the scheme — instead of
    # surfacing as an unexplained oracle hash mismatch. One codegen
    # comparison per row; the ELSE branch is the r10 expression verbatim.
    wsum = pairs.groupBy("day_idx").agg(
        F.min("rev").alias("rev"),
        F.sum(
            F.expr(
                "CASE WHEN abs(CAST(rev_b AS DOUBLE)) * 1e6 >= 4.5e15 THEN"
                " CAST(raise_error('ewma_smoothed_revenue: |rev|*1e6 >= 4.5e15"
                " breaches the 2^53 floor(x*1e6+0.5) exactness bound"
                " (proven to ~sf100); rescale the fixed-point factor')"
                " AS DECIMAL(38,0))"
                f" ELSE CAST(floor(({_EWMA_CASE}) * CAST(rev_b AS DOUBLE) * 1e6 + 0.5)"
                " AS DECIMAL(38,0)) END"
            )
        ).alias("s"),
    )
    return wsum.selectExpr(
        "day_idx",
        "CAST(rev AS DOUBLE) AS revenue",
        "CAST(s AS DOUBLE) / 1e6 AS ewma",
    )


# ---------------------------------------------------------------------------
# dbscan_core_points
# ---------------------------------------------------------------------------

DBSCAN_EPS = 0.30  # cosine similarity threshold (>=)
DBSCAN_MIN_PTS = 3


@register(
    "dbscan_core_points",
    oracle=f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb,
         {_norm_sql('embedding', 1)} AS nrm
  FROM embeddings
),
nbr AS (
  SELECT a.vec_id, CAST(count(*) AS BIGINT) AS n_neighbors
  FROM e a JOIN e b ON a.vec_id <> b.vec_id
  WHERE round(({" + ".join(f"a.emb[{i+1}] * b.emb[{i+1}]" for i in range(64))})
              / (a.nrm * b.nrm), 6) >= {DBSCAN_EPS}
  GROUP BY a.vec_id
)
SELECT e.vec_id,
       CAST(coalesce(nbr.n_neighbors, 0) AS BIGINT) AS n_neighbors,
       CASE WHEN coalesce(nbr.n_neighbors, 0) >= {DBSCAN_MIN_PTS} THEN 1 ELSE 0 END
         AS is_core
FROM e LEFT JOIN nbr ON nbr.vec_id = e.vec_id
""",
)
def dbscan_core_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DBSCAN core-point classification over the embedding table: a
    vector is CORE when >= MIN_PTS other vectors sit at cosine >= eps —
    the density primitive behind density-based near-dup clustering and
    outlier rejection (complements kmeans/semdedup's centroid view).
    This is the exact all-pairs verification shape (cosine rounded
    before the knife-edge threshold, like the near-dup chain); at
    100 TB candidate generation swaps to the LSH band buckets and this
    count runs per-bucket — identical to how near_dup_clusters bounds
    its pair join. Vectors with zero neighbors re-enter via the spine
    left join, so the border/noise split is explicit."""
    from ..operators import ensure_parallelism

    # r11 (caught by the sf1.0 magnitude gate): the != join below is a
    # BroadcastNestedLoopJoin that streams THIS side — a single-file
    # embeddings scan arrives as 1 partition, so without the spread the
    # 400M-pair kernel at 20k vectors ran on ONE task (the r5
    # single-split-cross-join trap, this query's instance of it)
    e = (
        ensure_parallelism(t(spark, sf_dir, "embeddings"))
        .selectExpr(
            "vec_id",
            "transform(embedding, x -> CAST(x AS DOUBLE)) AS emb",
            f"{_norm_sql('embedding', 0)} AS nrm",
        )
        .localCheckpoint(eager=True)
    )
    a = e.selectExpr("vec_id", "emb", "nrm")
    b = e.selectExpr("vec_id AS vec_b", "emb AS emb_b", "nrm AS nrm_b")
    dot = " + ".join(f"emb[{i}] * emb_b[{i}]" for i in range(64))
    nbr = (
        a.join(b, F.col("vec_id") != F.col("vec_b"))
        .where(F.expr(f"round(({dot}) / (nrm * nrm_b), 6) >= {DBSCAN_EPS}"))
        .groupBy("vec_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_neighbors"))
    )
    return (
        e.select("vec_id")
        .join(nbr, "vec_id", "left")
        .selectExpr(
            "vec_id",
            "CAST(coalesce(n_neighbors, 0) AS BIGINT) AS n_neighbors",
            f"CASE WHEN coalesce(n_neighbors, 0) >= {DBSCAN_MIN_PTS} THEN 1 ELSE 0 END"
            " AS is_core",
        )
    )
