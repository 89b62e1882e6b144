"""Wave 28: curation tradeoff curves, sequence entropy, dedup audit.

  * coverage_budget_curve — distinct-shingle coverage retained at
    quality-ranked document budgets (25/50/75/100%): the
    diversity-vs-quality tradeoff curve a curation decision reads.
  * entropy_rate_markov — empirical entropy rate (and perplexity) of
    the per-user event-type Markov chain.
  * dedup_survivor_quality — mean quality of kept vs dropped documents
    under near-dup keep-best: the survivorship audit proving the dedup
    pass keeps the right copies.

All exact-value DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.partitioning import distributed_row_number
from .base import register, t
from .base import dec_to_double_wide as _d2dw
from .base import dec_to_double_wide_sql as _d2dws
from .dedupq import (
    DUCK_SHINGLES,
    DUCK_TOKS,
    JACCARD_THRESHOLD,
    _buckets_sql,
    _sigs_sql,
    near_dup_clusters,
)
from .textops import QUALITY_CTES, QUALITY_SELECT

BUDGET_PCTS = [25, 50, 75, 100]

# ---------------------------------------------------------------------------
# coverage_budget_curve
# ---------------------------------------------------------------------------


@register(
    "coverage_budget_curve",
    oracle=f"""
WITH {QUALITY_CTES},
q AS (SELECT doc_id, {QUALITY_SELECT} AS quality FROM parts),
r AS (
  SELECT doc_id, quality,
         CAST(row_number() OVER (ORDER BY quality DESC, doc_id ASC) AS BIGINT) AS rnk
  FROM q
),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM r),
sh AS (
  SELECT doc_id, unnest({DUCK_SHINGLES}) AS s
  FROM (SELECT doc_id, {DUCK_TOKS} AS toks FROM documents) x
),
smin AS (
  SELECT sh.s, CAST(min(r.rnk) AS BIGINT) AS min_rnk
  FROM sh JOIN r ON r.doc_id = sh.doc_id
  GROUP BY sh.s
),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n_shingles FROM smin),
pcts AS (SELECT unnest([{", ".join(str(p) for p in BUDGET_PCTS)}]) AS pct),
curve AS (
  SELECT pcts.pct,
         CAST(sum(CASE WHEN smin.min_rnk * 100 <= pcts.pct * nn.n
                  THEN 1 ELSE 0 END) AS BIGINT) AS n_covered
  FROM pcts CROSS JOIN smin CROSS JOIN nn
  GROUP BY pcts.pct
)
SELECT curve.pct AS budget_pct,
       CAST(nn.n * curve.pct / 100 AS BIGINT) AS n_docs_kept,
       curve.n_covered AS n_shingles_covered,
       tot.n_shingles AS n_shingles_total,
       round(CAST(curve.n_covered AS DOUBLE) / CAST(tot.n_shingles AS DOUBLE), 9)
         AS coverage
FROM curve CROSS JOIN tot CROSS JOIN nn
""",
)
def coverage_budget_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The diversity-vs-quality tradeoff curve: rank documents by the
    shared Gopher-style quality score, keep the top 25/50/75/100%, and
    measure what fraction of the corpus's DISTINCT word shingles each
    budget retains — the read that says whether aggressive quality
    filtering is quietly collapsing corpus diversity (pairs with
    quality_dedup_calibration and source_diversity_indices). Plan: one
    quality scan + the two-phase DISTRIBUTED rank over documents, one
    shingle explode joined to the ranks, then each shingle reduces to
    its MINIMUM covering rank — and the whole curve falls out of ONE
    single-pass aggregate over the shingle-min table: one conditional
    sum PER budget point (integer-exact cut min_rnk*100 <= pct*N),
    stacked back into rows afterwards. No pcts×shingles row expansion
    (the r5 plan crossJoined a 4-row pcts frame — a 4× blow-up before
    the aggregate, flagged by the r5 verdict); adding budget points
    costs one more aggregate column, zero extra shuffles or passes."""
    from ..functions.text import quality_score_expr
    from ..operators import ensure_parallelism
    from ..operators.dedup import shingles_expr

    # r12 (guide §2.5/§2.4): spread the single-file documents scan so the
    # regex-heavy quality score isn't one task, and pin the tiny
    # (doc_id, rnk) table — its two consumers (the count and the shingle
    # join) each re-ran the quality scan + two-phase rank otherwise.
    docs = ensure_parallelism(t(spark, sf_dir, "documents"))
    q = docs.select("doc_id", quality_score_expr(F.col("text")).alias("quality"))
    r = (
        distributed_row_number(
            q.withColumn("neg_q", -F.col("quality")), ["neg_q", "doc_id"], out="rnk"
        )
        .select("doc_id", F.col("rnk").cast("long").alias("rnk"))
        .localCheckpoint(eager=True)
    )
    nn = r.agg(F.count(F.lit(1)).cast("long").alias("n"))
    from .base import shingle_tables

    _, sh = shingle_tables(spark, sf_dir, 3)
    smin = (
        sh.join(r, "doc_id")
        .groupBy("s")
        .agg(F.min("rnk").cast("long").alias("min_rnk"))
    )
    wide = (
        smin.crossJoin(F.broadcast(nn))
        .agg(
            F.max("n").alias("n"),
            F.count(F.lit(1)).cast("long").alias("n_shingles"),
            *[
                F.sum(
                    F.when(F.col("min_rnk") * 100 <= F.lit(p) * F.col("n"), 1).otherwise(0)
                )
                .cast("long")
                .alias(f"c{p}")
                for p in BUDGET_PCTS
            ],
        )
    )
    stack = ", ".join(f"CAST({p} AS BIGINT), c{p}" for p in BUDGET_PCTS)
    return wide.selectExpr(
        f"stack({len(BUDGET_PCTS)}, {stack}) AS (pct, n_covered)", "n", "n_shingles"
    ).selectExpr(
        "pct AS budget_pct",
        "CAST(n * pct / 100 AS BIGINT) AS n_docs_kept",
        "n_covered AS n_shingles_covered",
        "n_shingles AS n_shingles_total",
        "round(CAST(n_covered AS DOUBLE) / CAST(n_shingles AS DOUBLE), 9)"
        " AS coverage",
    )


# ---------------------------------------------------------------------------
# entropy_rate_markov
# ---------------------------------------------------------------------------

@register(
    "entropy_rate_markov",
    oracle=f"""
WITH e AS (
  SELECT user_id, event_type,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
  FROM events
),
tc AS (
  SELECT event_type AS src, nxt AS dst, CAST(count(*) AS BIGINT) AS c
  FROM e WHERE nxt IS NOT NULL GROUP BY src, dst
),
sc AS (SELECT src, CAST(sum(c) AS BIGINT) AS cs FROM tc GROUP BY src),
tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM tc),
terms AS (
  SELECT CAST(round(-(CAST(tc.c AS DOUBLE) / CAST(tot.n AS DOUBLE))
              * ln(CAST(tc.c AS DOUBLE) / CAST(sc.cs AS DOUBLE)), 12)
         AS DECIMAL(38,12)) AS term
  FROM tc JOIN sc ON sc.src = tc.src CROSS JOIN tot
)
SELECT tot.n AS n_transitions,
       (SELECT CAST(count(*) AS BIGINT) FROM sc) AS n_states,
       round({_d2dws('sum(term)', 12)}, 9) AS entropy_rate_nats,
       round(exp({_d2dws('sum(term)', 12)}), 6) AS perplexity
FROM terms CROSS JOIN tot
GROUP BY tot.n
""",
)
def entropy_rate_markov(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical entropy rate of the first-order event-type Markov
    chain, H = -sum_ij (c_ij/N) ln(c_ij/c_i), and its perplexity — the
    one-number predictability summary of user behavior that sits on
    top of event_markov_transitions (how many effective next-states a
    session policy must plan for). Transitions come from the keyed lag
    window (parallel on the user key); the statistic lives on the
    |states|^2-bounded transition table with exact-integer ratios and
    rounded-once DECIMAL-summed terms."""
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    e = ev.select(
        "event_type", F.lead("event_type").over(w).alias("nxt")
    ).where(F.col("nxt").isNotNull())
    tc = e.groupBy(
        F.col("event_type").alias("src"), F.col("nxt").alias("dst")
    ).agg(F.count(F.lit(1)).cast("long").alias("c")).localCheckpoint(eager=True)
    sc = tc.groupBy("src").agg(F.sum("c").cast("long").alias("cs"))
    tot = tc.agg(F.sum("c").cast("long").alias("n"))
    nst = sc.agg(F.count(F.lit(1)).cast("long").alias("n_states"))
    terms = (
        tc.join(F.broadcast(sc), "src")
        .crossJoin(F.broadcast(tot))
        .selectExpr(
            "n",
            "CAST(round(-(CAST(c AS DOUBLE) / CAST(n AS DOUBLE))"
            " * ln(CAST(c AS DOUBLE) / CAST(cs AS DOUBLE)), 12)"
            " AS DECIMAL(38,12)) AS term",
        )
    )
    return (
        terms.groupBy("n")
        .agg(F.sum("term").alias("h"))
        .crossJoin(F.broadcast(nst))
        .selectExpr(
            "n AS n_transitions",
            "n_states",
            "h",
        )
        .withColumn("hd", _d2dw(F.col("h"), 12))
        .selectExpr(
            "n_transitions",
            "n_states",
            "round(hd, 9) AS entropy_rate_nats",
            "round(exp(hd), 6) AS perplexity",
        )
    )


# ---------------------------------------------------------------------------
# dedup_survivor_quality
# ---------------------------------------------------------------------------

_Q_KEPT_SUM = "sum(CASE WHEN rn = 1 THEN CAST(quality AS DECIMAL(18,6)) END)"
_Q_DROP_SUM = "sum(CASE WHEN rn > 1 THEN CAST(quality AS DECIMAL(18,6)) END)"


@register(
    "dedup_survivor_quality",
    oracle=f"""
WITH RECURSIVE {_sigs_sql().strip()},
buckets AS (
{_buckets_sql()}
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM buckets a JOIN buckets b ON a.band = b.band AND a.bh = b.bh
  WHERE a.doc_id < b.doc_id
),
shs AS (SELECT doc_id, {DUCK_SHINGLES} AS sh
        FROM (SELECT doc_id, {DUCK_TOKS} AS toks FROM documents) x),
verified AS (
  SELECT p.id_a, p.id_b
  FROM cand p
  JOIN shs a ON p.id_a = a.doc_id
  JOIN shs b ON p.id_b = b.doc_id
  WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        / CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE)
        >= {JACCARD_THRESHOLD}
),
edges AS (SELECT id_a AS src, id_b AS dst FROM verified
          UNION SELECT id_b, id_a FROM verified),
reach(id, lbl) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.id
),
clusters AS (SELECT id AS doc_id, min(lbl) AS cluster_id FROM reach GROUP BY id),
{QUALITY_CTES},
q AS (SELECT doc_id, {QUALITY_SELECT} AS quality FROM parts),
j AS (
  SELECT c.cluster_id, c.doc_id, q.quality,
         CAST(count(*) OVER (PARTITION BY c.cluster_id) AS BIGINT) AS n_members,
         row_number() OVER (PARTITION BY c.cluster_id
                            ORDER BY q.quality DESC, c.doc_id ASC) AS rn
  FROM clusters c JOIN q USING (doc_id)
),
multi AS (SELECT * FROM j WHERE n_members > 1)
SELECT CAST(count(DISTINCT cluster_id) AS BIGINT) AS n_multi_clusters,
       CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
       round({_d2dws(_Q_KEPT_SUM)}
             / sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END), 9) AS mean_q_kept,
       round({_d2dws(_Q_DROP_SUM)}
             / sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END), 9) AS mean_q_dropped
FROM multi
""",
)
def dedup_survivor_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivorship audit of near-dup keep-best: among multi-member
    near-dup clusters, the mean quality of the KEPT copies vs the
    DROPPED copies — the invariant check (kept >= dropped by
    construction of the argmax) that catches a broken tie-break or a
    drifted quality score before a training run does. Reuses the
    verified MinHash->LSH->verify->components chain and the shared
    quality score verbatim; the audit itself is one window + one
    conditional aggregate on the cluster assignment, with 6dp-rounded
    qualities DECIMAL-summed into exact-ratio means."""
    from ..functions.text import quality_score_expr

    docs = t(spark, sf_dir, "documents")
    clusters = near_dup_clusters(spark, sf_dir)
    quality = docs.select("doc_id", quality_score_expr(F.col("text")).alias("quality"))
    j = clusters.join(quality, "doc_id")
    wc = Window.partitionBy("cluster_id")
    wr = Window.partitionBy("cluster_id").orderBy(F.desc("quality"), F.asc("doc_id"))
    multi = (
        j.withColumn("n_members", F.count(F.lit(1)).over(wc).cast("long"))
        .withColumn("rn", F.row_number().over(wr))
        .where(F.col("n_members") > 1)
    )
    return multi.agg(
        F.countDistinct("cluster_id").cast("long").alias("n_multi_clusters"),
        F.sum(F.when(F.col("rn") == 1, 1).otherwise(0)).cast("long").alias("n_kept"),
        F.sum(F.when(F.col("rn") > 1, 1).otherwise(0)).cast("long").alias("n_dropped"),
        F.round(
            _d2dw(
                F.sum(
                    F.when(F.col("rn") == 1, F.col("quality").cast("decimal(18,6)"))
                )
            )
            / F.sum(F.when(F.col("rn") == 1, 1).otherwise(0)),
            9,
        ).alias("mean_q_kept"),
        F.round(
            _d2dw(
                F.sum(
                    F.when(F.col("rn") > 1, F.col("quality").cast("decimal(18,6)"))
                )
            )
            / F.sum(F.when(F.col("rn") > 1, 1).otherwise(0)),
            9,
        ).alias("mean_q_dropped"),
    )
