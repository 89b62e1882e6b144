"""Wave 10: retrieval, redirect resolution, incremental view
maintenance, and a gate-vs-dedup calibration report.

  * bm25_search_topk — BM25 top-k retrieval over the corpus for a fixed
    term query (the search-engine read path a crawler's index feeds;
    Robertson/Sparck Jones weighting as used by Lucene).
  * redirect_chain_resolve — iterative redirect-map resolution with a
    hop cap, as ONE dialect-shared recursive CTE both engines run
    (the reference chases redirect chains in its fetchers with
    MAX_REDIRECTS; SimpleHttpFetcher.java / RedirectMode semantics are
    the batch analogue here).
  * incremental_mv_refresh — maintain a per-(customer, month) revenue
    rollup from a stored MV + a delta batch via partial-aggregate
    merge, verified against the full recompute (the don't-rescan-
    history shape every 100 TB rollup runs on).
  * quality_dedup_calibration — near-dup family membership rate per
    quality decile (does the quality gate and the dedup pass remove
    the SAME mass? — the redundancy read before stacking filters).

All exact-value DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import quality_score_expr, tokens_expr
from .base import register, t, ts_lit
from .base import dec_to_double_wide as _d2dw
from .base import dec_to_double_wide_sql as _d2dws
from .textops import DUCK_TOKS, QUALITY_CTES, QUALITY_SELECT

# ---------------------------------------------------------------------------
# bm25_search_topk
# ---------------------------------------------------------------------------

BM25_TERMS = ("spark", "window", "hash")
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOPK = 20

_TERMS_SQL = ", ".join(f"'{w}'" for w in BM25_TERMS)


@register(
    "bm25_search_topk",
    oracle=f"""
WITH d0 AS (SELECT doc_id, {DUCK_TOKS} AS tk FROM documents),
dl AS (SELECT doc_id, CAST(len(tk) AS BIGINT) AS dl FROM d0),
st AS (SELECT CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(dl) AS BIGINT) AS sum_dl
       FROM dl),
tf AS (
  SELECT doc_id, w, CAST(count(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, unnest(tk) AS w FROM d0)
  WHERE w IN ({_TERMS_SQL})
  GROUP BY doc_id, w
),
dfx AS (SELECT w, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY w),
per AS (
  SELECT tf.doc_id,
         ln(1 + (st.n_docs - dfx.df + 0.5) / (dfx.df + 0.5))
           * ((tf.tf * {BM25_K1 + 1}) /
              (tf.tf + {BM25_K1} * ({1 - BM25_B} + {BM25_B}
                 * (dl.dl / (CAST(st.sum_dl AS DOUBLE) / st.n_docs))))) AS s
  FROM tf
  JOIN dfx ON dfx.w = tf.w
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN st
),
sc AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hit_terms,
         round({_d2dws("sum(CAST(round(s, 12) AS DECIMAL(38,12)))", 12)}, 6)
           AS score
  FROM per GROUP BY doc_id
)
SELECT doc_id, n_hit_terms, score
FROM sc ORDER BY score DESC, doc_id LIMIT {BM25_TOPK}
""",
)
def bm25_search_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-{k} for the fixed query {{spark, window, hash}}: the
    Robertson BM25 weighting exactly as Lucene computes it
    (idf = ln(1 + (N - df + 0.5)/(df + 0.5)), k1 = 1.2, b = 0.75) —
    the retrieval read path of the search index a crawler exists to
    feed.

    Determinism discipline: the token scan filters to the 3 query
    terms BEFORE any shuffle (pushdown-sized tf table); per-term scores
    are summed through the 12 dp decimal route so term order can't move
    a doc's score; scores are ROUNDED (6 dp) BEFORE the top-k rank
    with doc_id as the total tie-break (the round-before-rank trap).
    The arithmetic is written with identical association on both
    engines — the formula nests exactly as the oracle text does.

    Shape: tf/df are map-side-combined aggs over the filtered token
    stream; df (3 rows) and the corpus stats (1 row) broadcast; the
    final top-k is TakeOrderedAndProject — no global sort, no window.
    """
    d0 = t(spark, sf_dir, "documents").select(
        "doc_id", tokens_expr(F.col("text")).alias("tk")
    )
    # r12 (guide §2.3/§2.4): ONE tokenize pass feeds dl, st, tf and dfx.
    # The previous shape re-scanned + re-tokenized documents per consumer
    # (dl twice — st and the per join — and tf separately: 8 scan leaves
    # in the r12 before-plan). Fold everything into one exploded
    # aggregation keyed (doc_id, term-or-null): the null group's count is
    # the non-term token count, so sum over the group = dl EXACTLY
    # (explode_outer keeps empty/null-token docs as a c=0 null group —
    # dl, n_docs and sum_dl are value-identical to the size(tk) form).
    # Map-side partial agg means the shuffle carries <=4 rows per doc per
    # partition — at 100 TB this halves the heaviest pass of the query.
    # Pinned: the tiny (docs x <=4) table has 3 consumers on different
    # keys (static ReuseExchange can't dedupe them).
    g = (
        d0.select("doc_id", F.explode_outer("tk").alias("w"))
        .groupBy(
            "doc_id",
            F.when(F.col("w").isin(*BM25_TERMS), F.col("w")).alias("w3"),
        )
        .agg(F.count("w").alias("c"))
        .localCheckpoint(eager=True)
    )
    dl = g.groupBy("doc_id").agg(F.sum("c").cast("long").alias("dl"))
    st = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("sum_dl")
    )
    tf = g.filter(F.col("w3").isNotNull()).select(
        "doc_id", F.col("w3").alias("w"), F.col("c").alias("tf")
    )
    dfx = tf.groupBy("w").agg(F.count(F.lit(1)).alias("df"))
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs")
    idf = F.log(
        F.lit(1) + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    s = idf * (
        (F.col("tf") * F.lit(BM25_K1 + 1))
        / (
            F.col("tf")
            + F.lit(BM25_K1)
            * (F.lit(1 - BM25_B) + F.lit(BM25_B) * (F.col("dl") / avgdl))
        )
    )
    per = (
        tf.join(F.broadcast(dfx), "w")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(st))
        .select("doc_id", s.alias("s"))
    )
    sc = per.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_hit_terms"),
        F.round(
            _d2dw(F.sum(F.round(F.col("s"), 12).cast("decimal(38,12)")), 12), 6
        ).alias("score"),
    )
    return sc.orderBy(F.desc("score"), "doc_id").limit(BM25_TOPK)


# ---------------------------------------------------------------------------
# redirect_chain_resolve — ONE dialect-shared recursive CTE
# ---------------------------------------------------------------------------

MAX_REDIRECT_HOPS = 5

# {part} = table/view name; everything else is shared text. Half the ids
# are redirect sources (a functional map id -> (5*id+3) % n), so chains
# form and ~0.5^5 of starts exhaust the hop cap — both terminal statuses
# occur. Casts are explicit at the recursion boundary (Spark does not
# widen across it).
REDIRECT_RCTE_TMPL = f"""
WITH RECURSIVE
n AS (SELECT count(*) AS n FROM {{part}}),
ids AS (SELECT p_partkey % (SELECT n FROM n) AS id FROM {{part}}),
redir AS (
  SELECT id AS src, (5*id+3) % (SELECT n FROM n) AS dst FROM ids
  WHERE substring(md5(CAST(id AS STRING)), 1, 1)
          IN ('0','1','2','3','4','5','6','7')
),
chain(start_id, cur, hops) AS (
  SELECT CAST(id AS BIGINT), CAST(id AS BIGINT), CAST(0 AS BIGINT) FROM ids
  UNION ALL
  SELECT c.start_id, CAST(r.dst AS BIGINT), c.hops + CAST(1 AS BIGINT)
  FROM chain c JOIN redir r ON r.src = c.cur
  WHERE c.hops < {MAX_REDIRECT_HOPS}
),
last AS (SELECT start_id, max(hops) AS hops FROM chain GROUP BY start_id),
fin AS (
  SELECT c.start_id, c.cur, c.hops
  FROM chain c JOIN last l ON l.start_id = c.start_id AND l.hops = c.hops
)
SELECT 'http://h' || CAST(f.start_id % 40 AS STRING) || '.com/r/'
         || CAST(f.start_id AS STRING) AS url,
       'http://h' || CAST(f.cur % 40 AS STRING) || '.com/r/'
         || CAST(f.cur AS STRING) AS final_url,
       CAST(f.hops AS BIGINT) AS hops,
       CASE WHEN r2.src IS NULL THEN 'RESOLVED'
            ELSE 'TOO_MANY_REDIRECTS' END AS status
FROM fin f LEFT JOIN redir r2 ON r2.src = f.cur
"""


@register("redirect_chain_resolve", oracle=REDIRECT_RCTE_TMPL.format(part="part"))
def redirect_chain_resolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch redirect-map resolution: follow every URL through a
    functional redirect map until it leaves the map or exhausts
    MAX_REDIRECT_HOPS — the set-oriented form of the per-fetch redirect
    chase the reference's fetchers run (SimpleHttpFetcher redirect
    loop; `operators/commoncrawl.py` implements the per-URL CDX
    variant, this is the URL-DB-wide sweep that re-resolves the whole
    frontier after a site migration).

    ONE dialect-shared recursive CTE: Spark 4 WITH RECURSIVE runs the
    text natively, DuckDB runs the identical text as the oracle — the
    same discipline as crawl_reachability_rcte, so engine and oracle
    cannot drift. Each recursion level is one distributed join of the
    live chain heads against the redirect map; rows leave the working
    set the moment they resolve (no re-joining finished chains), and
    the hop cap bounds the level count — cycles terminate by
    construction, exactly as the reference's MAX_REDIRECTS does."""
    import uuid

    view = "part_redir_" + uuid.uuid4().hex[:8]
    t(spark, sf_dir, "part").createOrReplaceTempView(view)
    return spark.sql(REDIRECT_RCTE_TMPL.format(part=view))


# ---------------------------------------------------------------------------
# incremental_mv_refresh
# ---------------------------------------------------------------------------

MV_CUTOFF = "1997-06-01 00:00:00"


@register(
    "incremental_mv_refresh",
    oracle=f"""
SELECT o_custkey,
       CAST(EXTRACT(year FROM o_orderdate) * 100
            + EXTRACT(month FROM o_orderdate) AS BIGINT) AS ym,
       CAST(count(*) AS BIGINT) AS n_orders,
       {_d2dws("sum(CAST(round(o_totalprice, 6) AS DECIMAL(28,6)))")}
         AS revenue
FROM orders
GROUP BY o_custkey, ym
""",
)
def incremental_mv_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view maintenance: the per-(customer,
    month) revenue rollup is maintained as stored-MV + delta-batch
    partial aggregates merged by key, and must equal the full
    recompute the oracle runs — the Delta/Iceberg-era rollup shape
    where 100 TB of history is NEVER rescanned; only the delta batch
    (here: orders on/after {MV_CUTOFF[:10]}) aggregates, and the merge
    is a key-local coalesce-and-add.

    The stored MV is simulated by aggregating the history partition and
    pinning it with an eager localCheckpoint (the moral equivalent of
    reading the MV table); the merge is a full-outer join on the
    grouping key with DECIMAL partial sums added exactly — decimal
    addition is associative, so (history-partial + delta-partial)
    equals the one-shot sum bit-for-bit, which is precisely what the
    oracle checks. Both sides shuffle once on the grouping key; the
    merge join co-locates on that same key (zero extra exchanges under
    AQE)."""
    orders = t(spark, sf_dir, "orders")
    ym = (F.year("o_orderdate") * 100 + F.month("o_orderdate")).cast("long").alias(
        "ym"
    )
    rev = F.sum(F.round(F.col("o_totalprice"), 6).cast("decimal(28,6)")).alias(
        "rev"
    )
    cnt = F.count(F.lit(1)).alias("n")
    cutoff = ts_lit(MV_CUTOFF)
    mv_old = (
        orders.filter(F.col("o_orderdate") < cutoff)
        .groupBy("o_custkey", ym)
        .agg(cnt, rev)
        .localCheckpoint(eager=True)  # "the stored MV"
    )
    mv_delta = (
        orders.filter(F.col("o_orderdate") >= cutoff)
        .groupBy("o_custkey", ym)
        .agg(cnt, rev)
    )
    o, d = mv_old.alias("o"), mv_delta.alias("d")
    zero = F.lit(0).cast("decimal(28,6)")
    return (
        o.join(d, ["o_custkey", "ym"], "full_outer")
        .select(
            "o_custkey",
            "ym",
            (
                F.coalesce(F.col("o.n"), F.lit(0)) + F.coalesce(F.col("d.n"), F.lit(0))
            ).alias("n_orders"),
            (
                _d2dw(
                    F.coalesce(F.col("o.rev"), zero)
                    + F.coalesce(F.col("d.rev"), zero)
                )
            ).alias("revenue"),
        )
    )


# ---------------------------------------------------------------------------
# quality_dedup_calibration
# ---------------------------------------------------------------------------

QD_BUCKETS = 10


def _qd_calibration_oracle() -> str:
    # wrap the verified near_dup_clusters oracle (the full
    # MinHash->LSH->verify->components chain) so the calibration cannot
    # drift from the dedup decision it reads — the same zero-duplicated-
    # SQL discipline as near_dup_cluster_histogram
    from .base import REGISTRY

    clusters = REGISTRY["near_dup_clusters"].oracle
    return f"""
WITH {QUALITY_CTES},
q AS (SELECT doc_id, {QUALITY_SELECT} AS quality FROM parts),
cl AS ({clusters}),
csz AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS c FROM cl
        GROUP BY cluster_id),
dd AS (SELECT cl.doc_id, (csz.c >= 2) AS is_dup
       FROM cl JOIN csz ON csz.cluster_id = cl.cluster_id),
r AS (
  SELECT q.doc_id, quality,
         row_number() OVER (ORDER BY quality, q.doc_id) AS rn,
         count(*) OVER () AS n
  FROM q
),
b AS (
  SELECT CAST(((rn - 1) * {QD_BUCKETS}) // n AS BIGINT) AS decile,
         quality, dd.is_dup
  FROM r JOIN dd ON dd.doc_id = r.doc_id
)
SELECT decile, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN is_dup THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_members,
       round(CAST(sum(CASE WHEN is_dup THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6)
         AS dup_rate,
       round({_d2dws("sum(CAST(quality AS DECIMAL(18,6)))")} / count(*), 9)
         AS mean_quality
FROM b GROUP BY decile
"""


@register("quality_dedup_calibration", oracle=_qd_calibration_oracle())
def quality_dedup_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAR-dup membership rate per quality decile: rank docs by the
    shared quality score (already rounded to 6 dp by its definition —
    round-before-rank holds by construction), cut into 10 equal-
    population deciles, and report what fraction of each decile sits
    in a near-duplicate family (cluster size >= 2 on the verified
    MinHash->LSH->verify->components chain) — the calibration read
    that decides whether the quality gate and the dedup pass remove
    the same mass (stack them) or different mass (both earn their
    cost). Gate-redundancy sibling of filter_agreement_matrix, on the
    rank axis instead of the boolean one.

    The decile rank is the shared `distributed_row_number` two-phase
    rank — no single-partition window; dup membership reuses the
    verified near_dup_clusters chain on BOTH sides (the oracle wraps
    that query's oracle SQL verbatim), so this report cannot drift
    from the gates it calibrates."""
    from .dedupq import near_dup_clusters

    docs = t(spark, sf_dir, "documents")
    q = docs.select(
        "doc_id", quality_score_expr(F.col("text")).alias("quality")
    ).localCheckpoint(eager=True)  # scanned by count() AND the rank
    cl = near_dup_clusters(spark, sf_dir)
    fam = cl.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("c"))
    dd = cl.join(fam, "cluster_id").select(
        "doc_id", (F.col("c") >= 2).alias("is_dup")
    )
    # r12 (guide §1.2, the rfm/lift boundary idiom): decile assignment
    # needs only the 9 boundary keys — decile(rank) >= i iff the
    # (quality, doc_id) pair is >= the key at rank ceil(i*n/10)+1 — so
    # a slim targeted probe plus one CASE-sum pass replaces the full
    # two-phase rank tower (and the separate count pass: n comes from
    # the probe's partition counts).
    from ..operators.partitioning import distributed_order_statistics

    probe, n = distributed_order_statistics(
        q,
        ["quality", "doc_id"],
        lambda n_: [
            (i * n_ + QD_BUCKETS - 1) // QD_BUCKETS + 1
            for i in range(1, QD_BUCKETS)
        ],
    )
    cases = " + ".join(
        f"(CASE WHEN quality > CAST('{r['quality']!r}' AS DOUBLE)"
        f" OR (quality = CAST('{r['quality']!r}' AS DOUBLE)"
        f" AND doc_id >= {r['doc_id']}L) THEN 1 ELSE 0 END)"
        for r in (
            probe[(i * n + QD_BUCKETS - 1) // QD_BUCKETS + 1]
            for i in range(1, QD_BUCKETS)
        )
    )
    ranked = q.withColumn("decile", F.expr(f"CAST({cases} AS BIGINT)"))
    b = ranked.join(dd, "doc_id")
    return b.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("is_dup").cast("long")).alias("n_dup_members"),
        F.round(
            F.sum(F.col("is_dup").cast("long")).cast("double") / F.count(F.lit(1)), 6
        ).alias("dup_rate"),
        F.round(
            _d2dw(F.sum(F.col("quality").cast("decimal(18,6)")))
            / F.count(F.lit(1)),
            9,
        ).alias("mean_quality"),
    )
