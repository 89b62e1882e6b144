"""Wave 24: ranking evaluation, nonparametric trend, gains, diversity.

  * ndcg_same_label_eval — nDCG@k of the cosine ranking with same-label
    relevance: the retrieval-quality metric (log-discount weights
    Python-inlined).
  * mann_kendall_trend — Mann-Kendall nonparametric trend test on the
    daily revenue series (integer-exact S, tie-corrected variance).
  * lift_gains_deciles — cumulative gains / lift table by score decile
    (the campaign-targeting read), integer-exact decile cuts.
  * source_diversity_indices — Shannon entropy, Simpson index, and
    effective vocabulary per source (corpus diversity audit).

All exact-value DuckDB oracles.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .base import dec_to_double_wide as _d2dw
from .base import dec_to_double_wide_sql as _d2dws
from .base import register, t
from .pipelineq22 import _dotn, _normn

# ---------------------------------------------------------------------------
# ndcg_same_label_eval
# ---------------------------------------------------------------------------

NDCG_K = 10
_NDCG_Q_DUCK = "substr(md5(CAST(vec_id AS VARCHAR)), 1, 1) = '2'"
_NDCG_Q_SPARK = "substr(md5(CAST(vec_id AS STRING)), 1, 1) = '2'"
# literal discount weights 1/log2(i+1), i = 1..k — Python-inlined so the
# discounted sums are rounded-once DECIMAL accumulations in both engines
_NDCG_W = [1.0 / math.log2(i + 1) for i in range(1, NDCG_K + 1)]
_NDCG_W_CASE = (
    "CASE "
    + " ".join(f"WHEN rnk = {i + 1} THEN {w!r}" for i, w in enumerate(_NDCG_W))
    + " ELSE 0.0 END"
)
# ideal DCG for m relevant docs = sum of the first min(m, k) weights
_NDCG_IDCG = [0.0]
for _w in _NDCG_W:
    _NDCG_IDCG.append(_NDCG_IDCG[-1] + _w)
_NDCG_IDCG_CASE = (
    "CASE "
    + " ".join(
        f"WHEN n_same >= {m} THEN {s!r}"
        for m, s in sorted(enumerate(_NDCG_IDCG), reverse=True)
        if m > 0
    )
    + " ELSE NULL END"
)


@register(
    "ndcg_same_label_eval",
    oracle=f"""
WITH q AS (
  SELECT vec_id AS q_id, embedding AS qe, label AS q_label
  FROM embeddings WHERE {_NDCG_Q_DUCK}
),
p AS (
  SELECT q.q_id, q.q_label, e.vec_id, e.label,
         round(({_dotn('q.qe', 'e.embedding', 1, 64)})
               / (({_normn('q.qe', 1, 64)}) * ({_normn('e.embedding', 1, 64)})), 6)
           AS cos
  FROM q CROSS JOIN embeddings e WHERE e.vec_id <> q.q_id
),
r AS (
  SELECT q_id, q_label, label,
         row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id ASC) AS rnk
  FROM p
),
stats AS (
  SELECT q_id,
         CAST(sum(CASE WHEN label = q_label THEN 1 ELSE 0 END) AS BIGINT) AS n_same,
         CAST(sum(CASE WHEN rnk <= {NDCG_K} AND label = q_label
                  THEN CAST(round({_NDCG_W_CASE}, 9) AS DECIMAL(38,9))
                  ELSE CAST(0 AS DECIMAL(38,9)) END) AS DOUBLE) AS dcg
  FROM r GROUP BY q_id
)
SELECT q_id, n_same, round(dcg, 9) AS dcg,
       round(dcg / ({_NDCG_IDCG_CASE}), 6) AS ndcg
FROM stats
""",
)
def ndcg_same_label_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nDCG@10 of the cosine ranking with same-label relevance — THE
    retrieval-quality metric, run per md5-gated query vector. The
    log-discount weights AND the ideal-DCG lookup are Python-inlined
    literals (no cross-engine log2), discounted gains are rounded once
    and DECIMAL-summed, and the final nDCG is an O(1)-magnitude
    quotient rounded 6dp. Queries broadcast against the corpus; the
    per-query ranking window is keyed (fully parallel). At scale the
    candidate step is the bucketed ANN path, exactly like the
    hard-negative and Matryoshka evals."""
    e = t(spark, sf_dir, "embeddings")
    q = e.where(F.expr(_NDCG_Q_SPARK)).selectExpr(
        "vec_id AS q_id", "embedding AS qe", "label AS q_label"
    )
    p = (
        e.crossJoin(F.broadcast(q))
        .where(F.col("vec_id") != F.col("q_id"))
        .selectExpr(
            "q_id",
            "q_label",
            "vec_id",
            "label",
            f"round(({_dotn('qe', 'embedding', 0, 64)})"
            f" / (({_normn('qe', 0, 64)}) * ({_normn('embedding', 0, 64)})), 6) AS cos",
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    r = p.withColumn("rnk", F.row_number().over(w))
    stats = r.groupBy("q_id").agg(
        F.sum(F.when(F.col("label") == F.col("q_label"), 1).otherwise(0))
        .cast("long")
        .alias("n_same"),
        F.sum(
            F.expr(
                f"CASE WHEN rnk <= {NDCG_K} AND label = q_label"
                f" THEN CAST(round({_NDCG_W_CASE}, 9) AS DECIMAL(38,9))"
                f" ELSE CAST(0 AS DECIMAL(38,9)) END"
            )
        )
        .cast("double")
        .alias("dcg"),
    )
    return stats.selectExpr(
        "q_id",
        "n_same",
        "round(dcg, 9) AS dcg",
        f"round(dcg / ({_NDCG_IDCG_CASE}), 6) AS ndcg",
    )


# ---------------------------------------------------------------------------
# mann_kendall_trend
# ---------------------------------------------------------------------------

@register(
    "mann_kendall_trend",
    oracle="""
WITH d AS (
  SELECT date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS day_idx,
         CAST(sum(CAST(round(o_totalprice, 2) AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS rev
  FROM orders GROUP BY 1
),
s AS (
  SELECT CAST(sum(CASE WHEN b.rev > a.rev THEN 1
                       WHEN b.rev < a.rev THEN -1 ELSE 0 END) AS BIGINT) AS s_stat
  FROM d a JOIN d b ON b.day_idx > a.day_idx
),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM d),
ties AS (
  SELECT CAST(coalesce(sum(tp * (tp - 1) * (2 * tp + 5)), 0) AS BIGINT) AS tie_term
  FROM (SELECT CAST(count(*) AS BIGINT) AS tp FROM d GROUP BY rev) WHERE tp > 1
),
v AS (
  SELECT (nn.n * (nn.n - 1) * (2 * nn.n + 5) - ties.tie_term) AS var18
  FROM nn CROSS JOIN ties
)
SELECT nn.n AS n_days, s.s_stat,
       round(CAST(v.var18 AS DOUBLE) / 18.0, 6) AS var_s,
       round(CASE WHEN s.s_stat > 0
                  THEN (CAST(s.s_stat AS DOUBLE) - 1.0) / sqrt(CAST(v.var18 AS DOUBLE) / 18.0)
                  WHEN s.s_stat < 0
                  THEN (CAST(s.s_stat AS DOUBLE) + 1.0) / sqrt(CAST(v.var18 AS DOUBLE) / 18.0)
                  ELSE 0.0 END, 6) AS z_stat
FROM s CROSS JOIN nn CROSS JOIN v
""",
)
def mann_kendall_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall nonparametric trend test on the daily revenue
    series — the distribution-free 'is there a monotone trend' test
    that pairs with theil_sen_trend's slope estimate (MK gives the
    significance, Theil-Sen the magnitude). S is an INTEGER-exact pair
    sign sum, the variance carries the exact tie correction (integer
    until one final /18), and the pair join is calendar-bounded (the
    day rollup is the only data-sized step — identical cost envelope
    to the ACF/Theil-Sen family)."""
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
    a = d.selectExpr("day_idx", "rev AS rev_a")
    b = d.selectExpr("day_idx AS day_b", "rev AS rev_b")
    s = (
        a.join(b, F.col("day_b") > F.col("day_idx"))
        .agg(
            F.sum(
                F.when(F.col("rev_b") > F.col("rev_a"), 1)
                .when(F.col("rev_b") < F.col("rev_a"), -1)
                .otherwise(0)
            )
            .cast("long")
            .alias("s_stat")
        )
    )
    nn = d.agg(F.count(F.lit(1)).cast("long").alias("n"))
    ties = (
        d.groupBy("rev")
        .agg(F.count(F.lit(1)).cast("long").alias("tp"))
        .where(F.col("tp") > 1)
        .agg(
            F.coalesce(
                F.sum(
                    F.col("tp") * (F.col("tp") - 1) * (2 * F.col("tp") + 5)
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("tie_term")
        )
    )
    v = (
        F.broadcast(nn)
        .crossJoin(ties)
        .selectExpr("n", "(n * (n - 1) * (2 * n + 5) - tie_term) AS var18")
    )
    return (
        s.crossJoin(F.broadcast(v))
        .selectExpr(
            "n AS n_days",
            "s_stat",
            "round(CAST(var18 AS DOUBLE) / 18.0, 6) AS var_s",
            "round(CASE WHEN s_stat > 0"
            " THEN (CAST(s_stat AS DOUBLE) - 1.0) / sqrt(CAST(var18 AS DOUBLE) / 18.0)"
            " WHEN s_stat < 0"
            " THEN (CAST(s_stat AS DOUBLE) + 1.0) / sqrt(CAST(var18 AS DOUBLE) / 18.0)"
            " ELSE 0.0 END, 6) AS z_stat",
        )
    )


# ---------------------------------------------------------------------------
# lift_gains_deciles
# ---------------------------------------------------------------------------

@register(
    "lift_gains_deciles",
    oracle="""
WITH o AS (
  SELECT CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS y,
         row_number() OVER (ORDER BY CAST(round(o_totalprice * 100) AS BIGINT) DESC,
                            o_orderkey ASC) AS rnk
  FROM orders
),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS npos FROM o),
dec AS (
  SELECT ((o.rnk - 1) * 10) // nn.n AS decile,
         CAST(count(*) AS BIGINT) AS n_rows,
         CAST(sum(o.y) AS BIGINT) AS n_pos
  FROM o CROSS JOIN nn GROUP BY 1
),
cum AS (
  SELECT decile, n_rows, n_pos,
         CAST(sum(n_pos) OVER (ORDER BY decile
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_pos,
         CAST(sum(n_rows) OVER (ORDER BY decile
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_rows
  FROM dec
)
SELECT cum.decile, cum.n_rows, cum.n_pos,
       round(CAST(cum.cum_pos AS DOUBLE) / CAST(nn.npos AS DOUBLE), 9) AS capture_rate,
       round((CAST(cum.cum_pos AS DOUBLE) / CAST(nn.npos AS DOUBLE))
             / (CAST(cum.cum_rows AS DOUBLE) / CAST(nn.n AS DOUBLE)), 6) AS lift
FROM cum CROSS JOIN nn
""",
)
def lift_gains_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative gains / lift table by score decile (price ranking the
    urgent label) — the campaign-targeting read ('mail the top 20%,
    capture X% of responders'). The global score rank rides the
    two-phase distributed row_number (range partition + broadcast
    offsets — NEVER a single-task window over the fact table); decile
    ids are integer-exact ((rank-1)*10 div n), and the cumulative
    window runs on the 10-row decile table. Capture/lift are
    exact-integer ratios rounded once."""
    o = t(spark, sf_dir, "orders").selectExpr(
        "CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS y",
        "CAST(round(o_totalprice * 100) AS BIGINT) AS xc",
        "o_orderkey",
    )
    # r12 (guide §1.2 step 1, the rfm boundary idiom): decile ASSIGNMENT
    # needs only the 9 boundary keys — decile(rank) >= i <=> rank >=
    # ceil(i*n/10)+1 <=> (neg_xc, o_orderkey) >= the key at that rank —
    # so one slim targeted selection replaces the full two-phase rank
    # (range shuffle + checkpoint + window over every order) and the
    # decile table comes from one CASE-sum aggregation pass over the
    # scan. n/npos fold up from the 10-row decile table itself.
    from ..operators.partitioning import distributed_order_statistics

    probe, n = distributed_order_statistics(
        o.selectExpr("-xc AS neg_xc", "o_orderkey"),
        ["neg_xc", "o_orderkey"],
        lambda n_: [(i * n_ + 9) // 10 + 1 for i in range(1, 10)],
    )
    cases = " + ".join(
        f"(CASE WHEN -xc > {r['neg_xc']}L OR (-xc = {r['neg_xc']}L"
        f" AND o_orderkey >= {r['o_orderkey']}L) THEN 1 ELSE 0 END)"
        for r in (probe[(i * n + 9) // 10 + 1] for i in range(1, 10))
    )
    dec = (
        o.select(F.expr(f"CAST({cases} AS BIGINT)").alias("decile"), "y")
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum("y").cast("long").alias("n_pos"),
        )
    )
    nn = dec.agg(
        F.sum("n_rows").cast("long").alias("n"),
        F.sum("n_pos").cast("long").alias("npos"),
    )
    # 10-row decile table: prefix sums via the triangular broadcast
    # self-join, no unpartitioned WindowExec (r7 task 7)
    from ..operators.windows import bounded_cumsum

    cum = bounded_cumsum(
        dec,
        [("decile", True)],
        [("n_pos", "cp", True), ("n_rows", "cr", True)],
    ).select(
        "decile",
        "n_rows",
        "n_pos",
        F.col("cp").cast("long").alias("cum_pos"),
        F.col("cr").cast("long").alias("cum_rows"),
    )
    return cum.crossJoin(F.broadcast(nn)).selectExpr(
        "decile",
        "n_rows",
        "n_pos",
        "round(CAST(cum_pos AS DOUBLE) / CAST(npos AS DOUBLE), 9) AS capture_rate",
        "round((CAST(cum_pos AS DOUBLE) / CAST(npos AS DOUBLE))"
        " / (CAST(cum_rows AS DOUBLE) / CAST(n AS DOUBLE)), 6) AS lift",
    )


# ---------------------------------------------------------------------------
# source_diversity_indices
# ---------------------------------------------------------------------------

_DUCK_TOKS = "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')"


_SHANNON_SUM = (
    "sum(CAST(round(-(CAST(c.c AS DOUBLE) / CAST(tot.n AS DOUBLE))"
    " * ln(CAST(c.c AS DOUBLE) / CAST(tot.n AS DOUBLE)), 12)"
    " AS DECIMAL(38,12)))"
)


@register(
    "source_diversity_indices",
    oracle=f"""
WITH tk AS (
  SELECT source, unnest({_DUCK_TOKS}) AS tok FROM documents
),
c AS (
  SELECT source, tok, CAST(count(*) AS BIGINT) AS c FROM tk GROUP BY source, tok
),
tot AS (SELECT source, CAST(sum(c) AS BIGINT) AS n FROM c GROUP BY source),
h AS (
  SELECT c.source,
         CAST(count(*) AS BIGINT) AS vocab,
         {_d2dws(_SHANNON_SUM, 12)} AS shannon,
         CAST(sum(c.c * c.c) AS BIGINT) AS sum_c2
  FROM c JOIN tot ON tot.source = c.source
  GROUP BY c.source
)
SELECT h.source, tot.n AS n_tokens, h.vocab,
       round(h.shannon, 9) AS shannon_entropy,
       round(CAST(h.sum_c2 AS DOUBLE) / (CAST(tot.n AS DOUBLE) * CAST(tot.n AS DOUBLE)), 9)
         AS simpson_index,
       round(exp(h.shannon), 6) AS effective_vocab
FROM h JOIN tot ON tot.source = h.source
""",
)
def source_diversity_indices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus diversity: Shannon entropy, Simpson
    concentration, and the effective vocabulary exp(H) — the 'is this
    source actually adding variety or repeating itself' read that
    complements the mixture/temperature-sampling weights. One token
    explode into a (source, token) count (the only data-sized shuffle);
    entropy terms are rounded once and DECIMAL-summed, Simpson is an
    exact INTEGER ratio (sum of squared counts over n^2). Output is one
    row per source."""
    tk = t(spark, sf_dir, "documents").select(
        "source",
        F.explode(
            F.filter(F.split(F.lower("text"), "[^a-z0-9]+"), lambda x: x != "")
        ).alias("tok"),
    )
    c = tk.groupBy("source", "tok").agg(F.count(F.lit(1)).cast("long").alias("c"))
    tot = c.groupBy("source").agg(F.sum("c").cast("long").alias("n"))
    h = (
        c.join(F.broadcast(tot), "source")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("vocab"),
            _d2dw(
                F.sum(
                    F.expr(
                        "CAST(round(-(CAST(c AS DOUBLE) / CAST(n AS DOUBLE))"
                        " * ln(CAST(c AS DOUBLE) / CAST(n AS DOUBLE)), 12)"
                        " AS DECIMAL(38,12))"
                    )
                ),
                12,
            ).alias("shannon"),
            F.sum(F.col("c") * F.col("c")).cast("long").alias("sum_c2"),
        )
    )
    return h.join(F.broadcast(tot), "source").selectExpr(
        "source",
        "n AS n_tokens",
        "vocab",
        "round(shannon, 9) AS shannon_entropy",
        "round(CAST(sum_c2 AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)), 9)"
        " AS simpson_index",
        "round(exp(shannon), 6) AS effective_vocab",
    )
