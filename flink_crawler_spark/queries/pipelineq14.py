"""Wave 15: market-basket rules, rank fusion, ANOVA, seasonal decomposition.

  * association_rules_pairs — a-priori-style pair association rules
    (support / confidence / lift) over parts co-ordered in one order.
  * rrf_rank_fusion — Reciprocal Rank Fusion (Cormack et al. 2009) of
    the BM25 retrieval ranking with the quality-score ranking — the
    hybrid-retrieval / multi-signal curation rank aggregator.
  * anova_f_event_values — one-way ANOVA F statistic of event value by
    event type, exact decimal co-moments (the A/B gate primitive).
  * seasonal_decompose_weekly — additive trend/seasonal/residual
    decomposition of the daily revenue series (centered 7-day trend,
    day-of-week seasonal means).

All exact-value DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import quality_score_expr
from .base import dec_to_double_wide as _d2dw
from .base import dec_to_double_wide_sql as _d2dws
from .base import REGISTRY, register, t
from .pipelineq9 import bm25_search_topk  # noqa: F401  (registers its oracle)
from .textops import QUALITY_CTES, QUALITY_SELECT

DAY_MS = 86_400_000

# ---------------------------------------------------------------------------
# association_rules_pairs
# ---------------------------------------------------------------------------

MIN_PAIR_SUPPORT = 2


@register(
    "association_rules_pairs",
    oracle=f"""
WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
nn AS (SELECT CAST(count(DISTINCT o) AS BIGINT) AS n FROM op),
sup AS (SELECT p, CAST(count(*) AS BIGINT) AS s FROM op GROUP BY p),
pr AS (
  SELECT a.p AS part_a, b.p AS part_b, CAST(count(*) AS BIGINT) AS pair_cnt
  FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
  GROUP BY a.p, b.p
  HAVING count(*) >= {MIN_PAIR_SUPPORT}
)
SELECT pr.part_a, pr.part_b, pr.pair_cnt,
       sa.s AS sup_a, sb.s AS sup_b,
       round(CAST(pr.pair_cnt AS DOUBLE) / CAST(sa.s AS DOUBLE), 9) AS conf_ab,
       round(CAST(pr.pair_cnt AS DOUBLE) / CAST(sb.s AS DOUBLE), 9) AS conf_ba,
       round(CAST(pr.pair_cnt * nn.n AS DOUBLE) / CAST(sa.s * sb.s AS DOUBLE), 9)
         AS lift
FROM pr JOIN sup sa ON sa.p = pr.part_a
        JOIN sup sb ON sb.p = pr.part_b
        CROSS JOIN nn
""",
)
def association_rules_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket pair rules over parts co-occurring in one order —
    the a-priori first level: support(a,b), confidence(a→b) and (b→a),
    and lift vs independence. The co-occurrence self-join co-partitions
    on the order key with basket size bounded by the schema (a TPC-H
    order holds ≤7 lines), so pair enumeration is linear in rows, never
    all-pairs over the catalog; per-part supports join back on the part
    key as ordinary hash joins and the order count is a broadcast
    scalar. Ratios are single exact IEEE divisions of BIGINT products
    rounded to 9dp — bit-equal across engines."""
    op = (
        t(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .distinct()
        # r12: no pin — all four consumers (order count, supports, both
        # self-join sides) are branches of ONE action over the same
        # deterministic hash-distinct exchange, so ReuseExchange runs the
        # shuffle once; the eager pin only added a blocking
        # materialization (paired A/B: −0.8-1.0 s, rows identical)
    )
    nn = op.agg(F.countDistinct("o").cast("long").alias("n"))
    sup = op.groupBy("p").agg(F.count(F.lit(1)).cast("long").alias("s"))
    a, b = op.alias("a"), op.alias("b")
    pr = (
        a.join(b, (F.col("a.o") == F.col("b.o")) & (F.col("a.p") < F.col("b.p")))
        .groupBy(F.col("a.p").alias("part_a"), F.col("b.p").alias("part_b"))
        .agg(F.count(F.lit(1)).cast("long").alias("pair_cnt"))
        .filter(F.col("pair_cnt") >= MIN_PAIR_SUPPORT)
    )
    return (
        pr.join(sup.select(F.col("p").alias("part_a"), F.col("s").alias("sup_a")), "part_a")
        .join(sup.select(F.col("p").alias("part_b"), F.col("s").alias("sup_b")), "part_b")
        .crossJoin(F.broadcast(nn))
        .select(
            "part_a",
            "part_b",
            "pair_cnt",
            "sup_a",
            "sup_b",
            F.round(F.col("pair_cnt").cast("double") / F.col("sup_a").cast("double"), 9).alias("conf_ab"),
            F.round(F.col("pair_cnt").cast("double") / F.col("sup_b").cast("double"), 9).alias("conf_ba"),
            F.round(
                (F.col("pair_cnt") * F.col("n")).cast("double")
                / (F.col("sup_a") * F.col("sup_b")).cast("double"),
                9,
            ).alias("lift"),
        )
    )


# ---------------------------------------------------------------------------
# rrf_rank_fusion
# ---------------------------------------------------------------------------

RRF_K = 60
RRF_TOP = 20


@register(
    "rrf_rank_fusion",
    oracle=f"""
WITH {QUALITY_CTES},
q AS (SELECT doc_id, {QUALITY_SELECT} AS quality FROM parts),
qr0 AS (
  SELECT doc_id,
         CAST(row_number() OVER (ORDER BY quality DESC, doc_id) AS BIGINT) AS r
  FROM q
),
qr AS (SELECT doc_id, r FROM qr0 WHERE r <= {RRF_TOP}),
bm AS ({{bm25}}),
br AS (
  SELECT doc_id,
         CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS r
  FROM bm
)
SELECT coalesce(br.doc_id, qr.doc_id) AS doc_id,
       coalesce(br.r, -1) AS bm25_rank,
       coalesce(qr.r, -1) AS quality_rank,
       round(coalesce(1.0 / ({RRF_K} + br.r), 0.0)
             + coalesce(1.0 / ({RRF_K} + qr.r), 0.0), 12) AS rrf_score
FROM br FULL OUTER JOIN qr ON br.doc_id = qr.doc_id
""",
)
def rrf_rank_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal Rank Fusion (Cormack/Clarke/Buettcher 2009) of two
    retrieval signals: the BM25 top-20 for the fixed term query and the
    corpus-wide quality-score top-20 — the hybrid-search / multi-signal
    curation aggregator (score scales never need calibrating; only
    ranks fuse: rrf = sum 1/(60 + rank_i)). The quality top-20 is cut
    with orderBy+limit — TakeOrderedAndProject, a map-side bounded heap
    per partition then one 20-row merge: ONE corpus pass and no window
    at any corpus size (the previous two-phase full-corpus rank paid a
    second pass for rows all about to be discarded); the 20 survivors
    are then ranked with the triangular join, same as the BM25 side's
    own top-20. Both engines run the same verbatim BM25 and quality
    chains (the oracle embeds `bm25_search_topk`'s oracle), so fusion
    cannot drift from the rankings it aggregates."""
    from ..operators.windows import bounded_row_number

    # r12 (guide §2.4): pin both 20-row top-k heads before the triangular
    # rank joins. bounded_row_number references its input TWICE (left +
    # broadcast right), so an unpinned bm here re-ran the ENTIRE BM25
    # plan per reference — the r12 before-plan shows 20 documents scans
    # (2x bm25's 8 + 2x the quality chain). Two eager 20-row checkpoints
    # cut that to one evaluation of each side.
    bm = (
        bm25_search_topk(spark, sf_dir)
        .select("doc_id", "score")
        .localCheckpoint(eager=True)
    )
    # the BM25 side is its own top-20 result: rank the 20-row frame with
    # the triangular join, not an unpartitioned WindowExec (r7 task 7)
    br = bounded_row_number(
        bm, [("score", False), ("doc_id", True)], out="r_bm"
    ).select("doc_id", F.col("r_bm").cast("long").alias("r_bm"))
    q = t(spark, sf_dir, "documents").select(
        "doc_id", quality_score_expr(F.col("text")).alias("quality")
    )
    top = (
        q.orderBy(F.col("quality").desc(), F.col("doc_id"))
        .limit(RRF_TOP)
        .localCheckpoint(eager=True)
    )
    qr = bounded_row_number(
        top, [("quality", False), ("doc_id", True)], out="r_q"
    ).select("doc_id", F.col("r_q").cast("long").alias("r_q"))
    return br.join(qr, "doc_id", "full_outer").select(
        "doc_id",
        F.coalesce(F.col("r_bm"), F.lit(-1)).alias("bm25_rank"),
        F.coalesce(F.col("r_q"), F.lit(-1)).alias("quality_rank"),
        F.round(
            F.coalesce(F.lit(1.0) / (RRF_K + F.col("r_bm")), F.lit(0.0))
            + F.coalesce(F.lit(1.0) / (RRF_K + F.col("r_q")), F.lit(0.0)),
            12,
        ).alias("rrf_score"),
    )


# patch the BM25 oracle chain in verbatim (registered above)
REGISTRY["rrf_rank_fusion"].oracle = REGISTRY["rrf_rank_fusion"].oracle.replace(
    "{bm25}", REGISTRY["bm25_search_topk"].oracle
)

# ---------------------------------------------------------------------------
# anova_f_event_values
# ---------------------------------------------------------------------------


@register(
    "anova_f_event_values",
    oracle=f"""
WITH ev AS (
  SELECT event_type AS g, CAST(round(value, 6) AS DECIMAL(28,6)) AS x
  FROM events
),
grp AS (
  SELECT g, CAST(count(*) AS BIGINT) AS n_g,
         CAST(sum(x) AS DECIMAL(38,6)) AS s_g,
         CAST(sum(CAST(x * x AS DECIMAL(38,12))) AS DECIMAL(38,12)) AS q_g
  FROM ev GROUP BY g
),
tot AS (
  SELECT CAST(sum(n_g) AS BIGINT) AS n, CAST(count(*) AS BIGINT) AS k,
         CAST(sum(s_g) AS DECIMAL(38,6)) AS s
  FROM grp
),
terms AS (
  SELECT CAST(round(n_g * power({_d2dws('s_g')} / n_g
                                - {_d2dws('s')} / n, 2), 12)
              AS DECIMAL(38,12)) AS ssb_t,
         CAST(round({_d2dws('q_g', 12)}
                    - n_g * power({_d2dws('s_g')} / n_g, 2), 12)
              AS DECIMAL(38,12)) AS ssw_t,
         n, k
  FROM grp CROSS JOIN tot
),
fin AS (
  SELECT CAST(min(k) AS BIGINT) AS k, CAST(min(n) AS BIGINT) AS n,
         {_d2dws('sum(ssb_t)', 12)} AS ssb_d,
         {_d2dws('sum(ssw_t)', 12)} AS ssw_d
  FROM terms
)
SELECT k, n,
       floor(ssb_d * 1e6 + 0.5e0) / 1e6 AS ssb,
       floor(ssw_d * 1e6 + 0.5e0) / 1e6 AS ssw,
       round((ssb_d / (k - 1)) / (ssw_d / (n - k)), 6) AS f_stat
FROM fin
""",
)
def anova_f_event_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA F statistic of event value across event types —
    the does-the-group-matter gate an experimentation or
    segment-drift report runs. Group sums and sums-of-squares are
    exact DECIMAL co-moments (the corr_qty_price_exact discipline), the
    totals re-aggregate five group rows, and the per-group SSB/SSW
    terms are computed in double from those exact sums, rounded to 12dp
    and DECIMAL-summed so the five-term additions are order-independent
    — both engines produce the identical F bit-for-bit. One scan, one
    shuffle on the 5-value group key, broadcast totals."""
    ev = t(spark, sf_dir, "events").select(
        F.col("event_type").alias("g"),
        F.round("value", 6).cast("decimal(28,6)").alias("x"),
    )
    grp = ev.groupBy("g").agg(
        F.count(F.lit(1)).cast("long").alias("n_g"),
        F.sum("x").cast("decimal(38,6)").alias("s_g"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(38,12)"))
        .cast("decimal(38,12)")
        .alias("q_g"),
        # 5 rows feeding the totals AND the SSB/SSW terms; pin so the
        # events scan + group shuffle run once
    ).localCheckpoint(eager=True)
    tot = grp.agg(
        F.sum("n_g").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("s_g").cast("decimal(38,6)").alias("s"),
    )
    terms = grp.crossJoin(F.broadcast(tot)).select(
        F.round(
            F.col("n_g")
            * F.pow(
                _d2dw(F.col("s_g")) / F.col("n_g")
                - _d2dw(F.col("s")) / F.col("n"),
                F.lit(2),
            ),
            12,
        )
        .cast("decimal(38,12)")
        .alias("ssb_t"),
        F.round(
            _d2dw(F.col("q_g"), 12)
            - F.col("n_g") * F.pow(_d2dw(F.col("s_g")) / F.col("n_g"), F.lit(2)),
            12,
        )
        .cast("decimal(38,12)")
        .alias("ssw_t"),
        "n",
        "k",
    )
    fin = terms.agg(
        F.min("k").cast("long").alias("k"),
        F.min("n").cast("long").alias("n"),
        _d2dw(F.sum("ssb_t"), 12).alias("ssb_d"),
        _d2dw(F.sum("ssw_t"), 12).alias("ssw_d"),
    )
    # floor(x*1e6 + 0.5)/1e6 instead of round(x, 6) on the n-scaled
    # sums of squares (r12 sf1.0-gate find, the burstiness-std class):
    # ssw*1e6 ~ 2.5e15 at sf1.0, where a double ulp is ~0.5e-6, so
    # engine round() implementations (BigDecimal HALF_UP vs
    # multiply-then-nearest) drew a 1-ulp divergence; the floor idiom is
    # every-op-IEEE-identical at any magnitude. f_stat is a ratio of
    # mean squares (O(1..1e3)) — its round() is far from any knife edge.
    return fin.selectExpr(
        "k",
        "n",
        "floor(ssb_d * 1e6 + 0.5e0) / 1e6 AS ssb",
        "floor(ssw_d * 1e6 + 0.5e0) / 1e6 AS ssw",
        "round((ssb_d / (k - 1)) / (ssw_d / (n - k)), 6) AS f_stat",
    )


# ---------------------------------------------------------------------------
# seasonal_decompose_weekly
# ---------------------------------------------------------------------------


@register(
    "seasonal_decompose_weekly",
    oracle=f"""
WITH daily AS (
  SELECT CAST(epoch_ms(o_orderdate) AS BIGINT) // {DAY_MS} AS dayn,
         CAST(sum(CAST(round(o_totalprice, 2) AS DECIMAL(18,2)))
              AS DECIMAL(28,2)) AS rev
  FROM orders GROUP BY dayn
),
tr AS (
  SELECT dayn, rev,
         CAST(sum(rev) OVER w7 AS DECIMAL(28,2)) AS s7,
         CAST(count(*) OVER w7 AS BIGINT) AS c7
  FROM daily
  WINDOW w7 AS (ORDER BY dayn ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
),
dt AS (
  SELECT dayn, rev, round({_d2dws('s7', 2)} / 7, 6) AS trend,
         round({_d2dws('rev', 2)} - round({_d2dws('s7', 2)} / 7, 6), 6) AS detr
  FROM tr WHERE c7 = 7
),
se AS (
  SELECT dayn % 7 AS phase,
         round({_d2dws('sum(CAST(detr AS DECIMAL(28,6)))')}
               / count(*), 6) AS seasonal
  FROM dt GROUP BY phase
)
SELECT dt.dayn, {_d2dws('dt.rev', 2)} AS revenue, dt.trend, se.seasonal,
       round(dt.detr - se.seasonal, 6) AS residual
FROM dt JOIN se ON se.phase = dt.dayn % 7
""",
)
def seasonal_decompose_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive seasonal decomposition of the daily revenue series:
    trend = centered 7-day moving average (full windows only), seasonal
    = day-of-week mean of the detrended series, residual = the rest —
    the classic decompose() a capacity/anomaly monitor runs on a crawl
    or revenue metric. The ordered window runs on the DAY-LEVEL
    aggregate, whose cardinality is calendar days (bounded by time, not
    data volume — ~2.4k rows for seven TPC-H years), after a one-shuffle
    exact-DECIMAL daily rollup of the fact table; seasonal means are
    decimal sums of 6dp-rounded detrended values divided by counts, so
    every division and subtraction is deterministic IEEE on identical
    inputs — both engines match bit-for-bit."""
    daily = (
        t(spark, sf_dir, "orders")
        .groupBy(
            F.expr(f"unix_millis(cast(o_orderdate as timestamp_ltz)) div {DAY_MS}").alias(
                "dayn"
            )
        )
        .agg(
            F.sum(F.round("o_totalprice", 2).cast("decimal(18,2)"))
            .cast("decimal(28,2)")
            .alias("rev")
        )
    )
    w7 = Window.orderBy("dayn").rowsBetween(-3, 3)
    tr = daily.select(
        "dayn",
        "rev",
        F.sum("rev").over(w7).cast("decimal(28,2)").alias("s7"),
        F.count(F.lit(1)).over(w7).cast("long").alias("c7"),
    )
    dt = tr.filter(F.col("c7") == 7).select(
        "dayn",
        "rev",
        F.round(_d2dw(F.col("s7"), 2) / 7, 6).alias("trend"),
        F.round(
            _d2dw(F.col("rev"), 2) - F.round(_d2dw(F.col("s7"), 2) / 7, 6), 6
        ).alias("detr"),
        # day-level table feeding the seasonal means AND the final join;
        # pin so the fact rollup + trend window run once
    ).localCheckpoint(eager=True)
    se = dt.groupBy((F.col("dayn") % 7).alias("phase")).agg(
        F.round(
            _d2dw(F.sum(F.col("detr").cast("decimal(28,6)")))
            / F.count(F.lit(1)),
            6,
        ).alias("seasonal")
    )
    return (
        dt.join(F.broadcast(se), dt["dayn"] % 7 == se["phase"])
        .select(
            "dayn",
            _d2dw(F.col("rev"), 2).alias("revenue"),
            "trend",
            "seasonal",
            F.round(F.col("detr") - F.col("seasonal"), 6).alias("residual"),
        )
    )
