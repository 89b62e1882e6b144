"""Wave 11: late-interaction retrieval, purged temporal splits, and
politeness capacity planning.

  * maxsim_label_retrieval — ColBERT-style late-interaction scoring
    (Khattab & Zaharia 2020): sum-of-max cosine between a small query
    vector set and each label's vector bag.
  * temporal_split_embargo — time-ordered train/test split with a
    global embargo gap and a per-user purge horizon (the purged-split
    discipline from financial ML, applied to event data).
  * robots_crawl_delay_budget — per-domain drain-time forecast under
    robots crawl-delay politeness (the capacity-planning read over the
    reference's per-domain timer constraint).

All exact-value DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .base import register, t, ts_lit
from .base import dsum_wide as _dsum_wide
from .base import dsum_wide_expr_sql as _dwes
from .base import dec_to_double_wide as _d2dw
from .base import dec_to_double_wide_sql as _d2dws
from .base import dsum_wide_sql as _dws
from .simq import DIM, _dot_sql, _norm_sql

# ---------------------------------------------------------------------------
# maxsim_label_retrieval
# ---------------------------------------------------------------------------

MAXSIM_QUERY_IDS = (0, 1, 2, 3)

_Q_IDS_SQL = ", ".join(str(i) for i in MAXSIM_QUERY_IDS)


@register(
    "maxsim_label_retrieval",
    oracle=f"""
WITH q AS (
  SELECT vec_id AS qid, embedding AS qv,
         {_norm_sql('embedding', 1)} AS nq
  FROM embeddings WHERE vec_id IN ({_Q_IDS_SQL})
),
d AS (
  SELECT vec_id, label, embedding AS dv,
         {_norm_sql('embedding', 1)} AS nd
  FROM embeddings
),
cs AS (
  SELECT d.label, q.qid,
         round(({_dot_sql('q.qv', 'd.dv', 1)}) / (q.nq * d.nd), 9) AS cos
  FROM d CROSS JOIN q
),
mx AS (SELECT label, qid, max(cos) AS mc FROM cs GROUP BY label, qid),
sz AS (SELECT label, CAST(count(*) AS BIGINT) AS n_members
       FROM embeddings GROUP BY label)
SELECT CAST(mx.label AS BIGINT) AS label, sz.n_members,
       {_d2dws('sum(CAST(mc AS DECIMAL(18,9)))', 9)} AS maxsim_score
FROM mx JOIN sz ON sz.label = mx.label
GROUP BY mx.label, sz.n_members
""",
)
def maxsim_label_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ColBERT late-interaction retrieval over vector BAGS: each label's
    embedding set is a multi-vector document, the query is the 4-vector
    set {{vec_id 0..3}}, and score(label) = sum over query vectors of
    the max cosine against any member — the sum-of-max interaction that
    out-ranks single-vector retrieval when documents are heterogeneous
    (Khattab & Zaharia 2020, SIGIR).

    Exactness: the 64-term dot products and norms are the shared
    unrolled left-associated chains from simq (`_dot_sql`/`_norm_sql` —
    both engines evaluate the identical association); cosines round to
    9 dp BEFORE the max (round-before-rank for the argmax), and the
    4-term sum-of-max rides a DECIMAL(18,9) so query order can't move
    the score.

    Shape: the query side is 4 rows — broadcast; the corpus is scanned
    ONCE, each vector scoring 4 codegen'd expressions; per-(label, qid)
    maxes partial-aggregate map-side. At 100 TB the corpus never
    shuffles anything wider than (label, qid, cos)."""
    e = t(spark, sf_dir, "embeddings")
    q = (
        e.filter(F.col("vec_id").isin(*MAXSIM_QUERY_IDS))
        .select(
            F.col("vec_id").alias("qid"),
            F.col("embedding").alias("qv"),
            F.expr(_norm_sql("embedding", 0)).alias("nq"),
        )
    )
    d = e.select(
        "label",
        F.col("embedding").alias("dv"),
        F.expr(_norm_sql("embedding", 0)).alias("nd"),
    )
    cs = d.crossJoin(F.broadcast(q)).select(
        "label",
        "qid",
        F.round(
            F.expr(_dot_sql("qv", "dv", 0)) / (F.col("nq") * F.col("nd")), 9
        ).alias("cos"),
    )
    mx = cs.groupBy("label", "qid").agg(F.max("cos").alias("mc"))
    sz = e.groupBy("label").agg(F.count(F.lit(1)).alias("n_members"))
    return (
        mx.join(sz, "label")
        .groupBy(F.col("label").cast("long").alias("label"), "n_members")
        .agg(
            _d2dw(F.sum(F.col("mc").cast("decimal(18,9)")), 9).alias(
                "maxsim_score"
            )
        )
    )


# ---------------------------------------------------------------------------
# temporal_split_embargo
# ---------------------------------------------------------------------------

SPLIT_T0 = "2024-01-18 00:00:00"
SPLIT_T1 = "2024-01-22 00:00:00"  # embargo: [T0, T1)
PURGE_DAYS = 6  # per-user purge horizon (longer than the global embargo)


@register(
    "temporal_split_embargo",
    oracle=f"""
WITH train AS (SELECT * FROM events WHERE ts < TIMESTAMP '{SPLIT_T0}'),
emb AS (SELECT * FROM events
        WHERE ts >= TIMESTAMP '{SPLIT_T0}' AND ts < TIMESTAMP '{SPLIT_T1}'),
test AS (SELECT * FROM events WHERE ts >= TIMESTAMP '{SPLIT_T1}'),
lastt AS (SELECT user_id, max(ts) AS lt FROM train GROUP BY user_id),
purged AS (
  SELECT t.* FROM test t LEFT JOIN lastt l ON l.user_id = t.user_id
  WHERE l.lt IS NULL OR t.ts >= l.lt + INTERVAL {PURGE_DAYS} DAY
)
SELECT 'train' AS split, CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       {_dws('value', 'value_sum')}
FROM train
UNION ALL
SELECT 'embargo', CAST(count(*) AS BIGINT), CAST(count(DISTINCT user_id) AS BIGINT),
       {_dwes('value')} FROM emb
UNION ALL
SELECT 'test', CAST(count(*) AS BIGINT), CAST(count(DISTINCT user_id) AS BIGINT),
       {_dwes('value')} FROM test
UNION ALL
SELECT 'test_purged', CAST(count(*) AS BIGINT),
       CAST(count(DISTINCT user_id) AS BIGINT),
       {_dwes('value')} FROM purged
""",
)
def temporal_split_embargo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Purged temporal split: train strictly before the cutoff, a
    4-day global embargo window dropped entirely, test strictly after —
    plus the PURGED test slice: per user, any test row closer than
    PURGE_DAYS to that user's LAST train event is dropped (users with
    no train history survive automatically). The global embargo absorbs
    label-horizon overlap; the per-user purge is the sample-level rule
    (purged k-fold, de Prado 2018) that a pure time cut misses when a
    user's label window straddles the boundary.

    One scan per split predicate (Catalyst merges them over the same
    parquet source with pushed-down ts filters); the purge joins test
    against the per-user last-train-timestamp aggregate — dimension-
    sized, broadcast-able. Sums ride the 6 dp decimal route."""
    ev = t(spark, sf_dir, "events")
    t0, t1 = ts_lit(SPLIT_T0), ts_lit(SPLIT_T1)
    train = ev.filter(F.col("ts") < t0)
    emb = ev.filter((F.col("ts") >= t0) & (F.col("ts") < t1))
    test = ev.filter(F.col("ts") >= t1)
    lastt = train.groupBy("user_id").agg(F.max("ts").alias("lt"))
    purged = test.join(F.broadcast(lastt), "user_id", "left").filter(
        F.col("lt").isNull()
        | (F.col("ts") >= F.col("lt") + F.expr(f"INTERVAL {PURGE_DAYS} DAY"))
    )

    def _agg(df: DataFrame, name: str) -> DataFrame:
        return df.agg(
            F.lit(name).alias("split"),
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("user_id").alias("n_users"),
            _dsum_wide(F.col("value"), "value_sum"),
        )

    return (
        _agg(train, "train")
        .unionAll(_agg(emb, "embargo"))
        .unionAll(_agg(test, "test"))
        .unionAll(_agg(purged, "test_purged"))
    )


# ---------------------------------------------------------------------------
# robots_crawl_delay_budget
# ---------------------------------------------------------------------------

BUDGET_TICK_MS = 60_000


@register(
    "robots_crawl_delay_budget",
    oracle=f"""
WITH rules AS (
  SELECT 'http://d' || CAST(n_nationkey AS VARCHAR) || '.example.com' AS host_root,
         CAST((n_nationkey % 5 + 1) * 1000 AS BIGINT) AS crawl_delay_ms,
         n_nationkey
  FROM nation
),
demand AS (
  SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n_queued
  FROM customer GROUP BY c_nationkey
)
SELECT r.host_root, r.crawl_delay_ms,
       coalesce(d.n_queued, 0) AS n_queued,
       CAST({BUDGET_TICK_MS} // r.crawl_delay_ms AS BIGINT) AS pages_per_tick,
       CAST((coalesce(d.n_queued, 0) + ({BUDGET_TICK_MS} // r.crawl_delay_ms) - 1)
            // ({BUDGET_TICK_MS} // r.crawl_delay_ms) AS BIGINT) AS ticks_to_drain
FROM rules r LEFT JOIN demand d ON d.c_nationkey = r.n_nationkey
""",
)
def robots_crawl_delay_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Politeness capacity planning: for each domain, how many ticks
    does draining its queued frontier take under its robots
    crawl-delay? pages_per_tick = tick_ms div delay_ms, ticks_to_drain
    = ceil(queued / pages_per_tick) — the forecast a crawl operator
    reads before promising freshness, because the reference's
    per-domain timers (UrlDBFunction's score-scaled polling +
    FetchUrlsFunction politeness) make crawl-delay, not cluster size,
    the throughput ceiling for deep hosts.

    Crawl-delay comes from the SAME nation-derived robots rules the
    robots queries use (crawlq.RULES_FROM_NATION_SQL semantics:
    delay = (nationkey % 5 + 1) s); demand is the per-nation customer
    count standing in for the per-domain frontier backlog. Pure
    integer arithmetic; both tables are dimension-sized broadcasts at
    any corpus scale."""
    nation = t(spark, sf_dir, "nation")
    customer = t(spark, sf_dir, "customer")
    rules = nation.select(
        F.concat(
            F.lit("http://d"), F.col("n_nationkey").cast("string"),
            F.lit(".example.com"),
        ).alias("host_root"),
        ((F.col("n_nationkey") % 5 + 1) * 1000).cast("long").alias("crawl_delay_ms"),
        F.col("n_nationkey"),
    )
    demand = customer.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n_queued")
    )
    ppt = F.expr(f"{BUDGET_TICK_MS} div crawl_delay_ms")
    queued = F.coalesce(F.col("n_queued"), F.lit(0))
    joined = rules.join(
        F.broadcast(demand),
        rules["n_nationkey"] == demand["c_nationkey"],
        "left",
    )
    return joined.select(
        "host_root",
        "crawl_delay_ms",
        queued.alias("n_queued"),
        ppt.cast("long").alias("pages_per_tick"),
        F.expr(
            f"CAST((coalesce(n_queued, 0) + ({BUDGET_TICK_MS} div crawl_delay_ms) - 1)"
            f" div ({BUDGET_TICK_MS} div crawl_delay_ms) AS BIGINT)"
        ).alias("ticks_to_drain"),
    )
