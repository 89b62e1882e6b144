"""Sketch & sampling operators — the approximate-but-reproducible tier a
100 TB pipeline needs: KMV distinct-count sketches, bloom-style membership
pruning, and deterministic hash-stratified sampling.

The reference carries a (dead-code) ``BloomFilter``
(`fc/utils/BloomFilter.java:74-131`) intended for frontier membership
checks; here the same idea is revived as set-based, exactly-checkable
queries. Every query below is *deterministic* — the "approximation" is a
pure function of md5/xxhash values both engines compute identically — so
each gets a full DuckDB value oracle rather than a rows-only check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .base import register, t

# KMV hash: top-15 hex chars of md5 → 60-bit integer, identical in Spark
# (conv) and DuckDB ('0x…'::BIGINT). Hash space = 16^15 = 2^60.
_HASH_SPACE = float(1 << 60)
_K = 32


def _md5_60bit(col):
    """60-bit integer from md5 of a bigint's string form (engine-portable)."""
    return F.conv(
        F.substring(F.md5(col.cast("string").cast("binary")), 1, 15), 16, 10
    ).cast("bigint")


# ---------------------------------------------------------------------------
# KMV (k-minimum-values) distinct-count sketch. Unlike HyperLogLog, KMV
# over a *portable* hash is bit-reproducible across engines, so the
# estimate itself is value-oracled. Months with < k distinct customers
# report exact counts (the sketch is lossless below k).
#
# Scale path: KMV sketches are mergeable — per-partition bottom-k arrays
# union-and-truncate associatively, so at 100 TB this becomes a two-level
# partial aggregation with k·8 bytes of state per group instead of the
# window-over-distinct used here (which shuffles each distinct pair once).
@register(
    "kmv_distinct_custkey_monthly",
    oracle=f"""
WITH du AS (SELECT DISTINCT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
                            o_custkey FROM orders),
h AS (SELECT month, CAST(concat('0x', substr(md5(CAST(o_custkey AS VARCHAR)), 1, 15)) AS BIGINT) AS hv
      FROM du),
r AS (SELECT month, hv,
             row_number() OVER (PARTITION BY month ORDER BY hv) AS rn,
             count(*) OVER (PARTITION BY month) AS n
      FROM h)
SELECT month,
       CAST(max(n) AS BIGINT) AS n_exact,
       CAST(CASE WHEN max(n) <= {_K} THEN CAST(max(n) AS DOUBLE)
                 ELSE round({_K - 1}.0 * {_HASH_SPACE!r} / CAST(max(CASE WHEN rn = {_K} THEN hv END) AS DOUBLE), 6)
            END AS DOUBLE) AS kmv_estimate
FROM r GROUP BY month
""",
)
def kmv_distinct_custkey_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = t(spark, sf_dir, "orders")
    du = od.select(
        F.date_format(F.date_trunc("month", F.col("o_orderdate")), "yyyy-MM").alias("month"),
        "o_custkey",
    ).distinct()
    h = du.withColumn("hv", _md5_60bit(F.col("o_custkey")))
    r = h.withColumn(
        "rn", F.row_number().over(Window.partitionBy("month").orderBy("hv"))
    ).withColumn("n", F.count(F.lit(1)).over(Window.partitionBy("month")))
    agg = r.groupBy("month").agg(
        F.max("n").cast("bigint").alias("n_exact"),
        F.max(F.when(F.col("rn") == _K, F.col("hv"))).alias("hk"),
    )
    est = F.when(
        F.col("n_exact") <= _K, F.col("n_exact").cast("double")
    ).otherwise(
        F.round(F.lit(float(_K - 1)) * F.lit(_HASH_SPACE) / F.col("hk").cast("double"), 6)
    )
    return agg.select("month", "n_exact", est.cast("double").alias("kmv_estimate"))


# ---------------------------------------------------------------------------
# Bloom-style membership pruning: a bucket bitmap of the (small) "seen"
# key set is broadcast and applied as a prefilter on the probe side
# *before* the shuffle join; the exact semi/inner join then removes the
# false positives, so the result is exact and the oracle is the plain
# join. Mirrors the reference's intended BloomFilter frontier check
# (`fc/utils/BloomFilter.java:74-131`, unwired).
#
# Scale path: at 100 TB the probe side is the ~100B-tracked-links frontier
# scan; a 4096-bucket bitmap (or Spark's runtime bloom filter,
# spark.sql.optimizer.runtime.bloomFilter.enabled) drops non-members
# before the exchange, which is where the win is. The prefilter can only
# shrink the probe side — never change the answer.
@register(
    "bloom_bucket_prefilter",
    oracle="""
SELECT c.c_custkey, CAST(count(*) AS BIGINT) AS n_hot_orders
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey AND o.o_totalprice > 250000
GROUP BY c.c_custkey
""",
)
def bloom_bucket_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    cu = t(spark, sf_dir, "customer")
    hot = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 250000)
        .select("o_custkey")
    )
    bucket = lambda c: F.pmod(F.xxhash64(c), F.lit(4096))  # noqa: E731
    bitmap = hot.select(bucket(F.col("o_custkey")).alias("b")).distinct().agg(
        F.collect_set("b").alias("bm")
    )
    pruned = (
        cu.join(F.broadcast(bitmap))
        .filter(F.array_contains(F.col("bm"), bucket(F.col("c_custkey"))))
        .drop("bm")
    )
    return (
        pruned.join(hot, pruned.c_custkey == hot.o_custkey)
        .groupBy("c_custkey")
        .agg(F.count(F.lit(1)).alias("n_hot_orders"))
    )


# ---------------------------------------------------------------------------
# Deterministic hash-stratified sampling: a 1/16 per-language sample keyed
# on md5(doc_id) — the reproducible alternative to rand()-based
# df.sample() that a training-data pipeline needs (same sample every run,
# every engine, any partitioning; sampling decision is per-row, so it
# pushes down and never shuffles).
@register(
    "hash_stratified_sample",
    oracle="""
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_sampled,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars
FROM documents
WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) = '0'
GROUP BY lang
""",
)
def hash_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    keep = F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 1) == "0"
    return (
        docs.filter(keep)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.sum("n_chars").cast("bigint").alias("sum_chars"),
        )
    )


def _hll_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw HLL frame (estimate next to exact) — tests assert the error
    bound on this; the registry query projects the oracle-able verdict."""
    ev = t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.01).alias("hll_estimate"),
        F.countDistinct("user_id").alias("n_exact"),
    )


@register(
    "hll_distinct_users",
    oracle="""
SELECT event_type,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact,
       CAST(1 AS INT) AS est_within_5pct
FROM events GROUP BY event_type
""",
)
def hll_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct estimate per event type
    (approx_count_distinct, 1% target rsd) next to the exact count — the
    mergeable industry sketch for 100 TB distinct counting where even
    salted exact COUNT DISTINCT shuffles every value once.

    Value-oracled since r10 (round-9 verdict task 2, the
    ann_recall_report precedent): Spark's HLL registers are
    engine-internal, so the ESTIMATE can't cross engines — instead the
    frame carries the exact count plus a bounded-error verdict column
    (|est - exact| / exact < 5%, the bound
    tests/test_sketch_analytics.py asserts on the raw frame), and the
    oracle pins the exact counts AND that every verdict is 1. A
    regression in the estimator (or a broken merge) flips the verdict
    to 0 and hash-mismatches."""
    f = _hll_frame(spark, sf_dir)
    ok = (
        F.abs(F.col("hll_estimate") - F.col("n_exact"))
        / F.col("n_exact")
        < 0.05
    )
    return f.select(
        "event_type",
        "n_exact",
        F.when(ok, 1).otherwise(0).cast("int").alias("est_within_5pct"),
    )


def _approx_percentile_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw quantile-sketch frame (approx next to exact + rank bounds) —
    tests assert the rank-error bound on this; the registry query
    projects the oracle-able verdict."""
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_percentile("l_extendedprice", F.lit(0.5), F.lit(10000)).alias("approx_median"),
        F.percentile("l_extendedprice", F.lit(0.5)).alias("exact_median"),
        F.percentile("l_extendedprice", F.lit(0.495)).alias("lo_bound"),
        F.percentile("l_extendedprice", F.lit(0.505)).alias("hi_bound"),
    )


@register(
    "approx_percentile_prices",
    oracle="""
SELECT l_returnflag,
       round(quantile_cont(l_extendedprice, 0.5), 6) AS exact_median,
       CAST(1 AS INT) AS approx_within_rank_bound
FROM lineitem GROUP BY l_returnflag
""",
)
def approx_percentile_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile (quantile sketch, accuracy 10000) next to the
    exact percentile per return flag — the constant-memory quantile path
    for 100 TB where exact percentile must shuffle every value per
    group.

    Value-oracled since r10: the sketch internals stay engine-private,
    but the frame carries the exact interpolated median (Spark
    `percentile` == DuckDB `quantile_cont`; p=0.5 midpoints of 2-decimal
    prices are >= 5e-7 from every 6dp rounding boundary, so round(...,6)
    is safe) plus a rank-bound verdict column: the sketch's guaranteed
    rank error at accuracy 10000 (1e-4) is far inside the checked
    [p-0.005, p+0.005] value window, so the verdict is deterministically
    1 whatever the partition merge order. The oracle pins the medians
    AND the verdicts."""
    f = _approx_percentile_frame(spark, sf_dir)
    ok = (F.col("approx_median") >= F.col("lo_bound")) & (
        F.col("approx_median") <= F.col("hi_bound")
    )
    return f.select(
        "l_returnflag",
        F.round("exact_median", 6).alias("exact_median"),
        F.when(ok, 1).otherwise(0).cast("int").alias("approx_within_rank_bound"),
    )


_CMS_D = 4     # hash rows
_CMS_W = 256   # buckets per row


@register(
    "cms_heavy_hitters",
    oracle=f"""
WITH keys AS (SELECT l_partkey AS k FROM lineitem),
rows_ AS (SELECT unnest([0, 1, 2, 3]) AS r),
cms AS (
  SELECT r.r, CAST('0x' || substring(md5(r.r || '|' || k), 1, 4) AS INTEGER) % {_CMS_W} AS b,
         CAST(count(*) AS BIGINT) AS c
  FROM keys CROSS JOIN rows_ r GROUP BY 1, 2
),
truth AS (SELECT k, CAST(count(*) AS BIGINT) AS n FROM keys GROUP BY k HAVING count(*) >= 8),
est AS (
  SELECT t.k, t.n, min(cms.c) AS cms_est
  FROM truth t CROSS JOIN rows_ r
  JOIN cms ON cms.r = r.r
          AND cms.b = CAST('0x' || substring(md5(r.r || '|' || t.k), 1, 4) AS INTEGER) % {_CMS_W}
  GROUP BY t.k, t.n
)
SELECT k AS partkey, n AS true_count, cms_est FROM est
""",
)
def cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch heavy hitters, end-to-end value-checked: the
    {_CMS_D}x{_CMS_W} counter matrix is built from md5-derived bucket
    hashes (portable — the oracle computes the identical sketch), then
    frequent keys are estimated as the min across rows. est >= truth
    always (one-sided error), collisions only inflate. The mergeable
    frequency sketch completing the family (KMV distinct, HLL, Bloom,
    KLL quantiles): at 100 TB the d x w matrix partial-aggregates
    map-side to a constant-size state per partition and merges by
    cell-wise +, while exact per-key counts would shuffle every key.

    The sketch is built from the per-key count table, not the raw key
    stream: cell(r, b) = sum of counts of keys hashing there, identical
    to counting occurrences but the d-way replication and the md5 run
    over DISTINCT keys only (~30x fewer hashes at TPC-H part/lineitem
    fan-in, more at any Zipfian corpus)."""
    li = t(spark, sf_dir, "lineitem").select(F.col("l_partkey").alias("k"))
    rows = spark.range(_CMS_D).select(F.col("id").cast("int").alias("r"))

    def bucket(r_col, k_col):
        return (
            F.conv(F.substring(F.md5(F.concat(r_col.cast("string"), F.lit("|"), k_col.cast("string"))), 1, 4), 16, 10)
            .cast("int")
            % _CMS_W
        )

    kc = (
        li.groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=True)  # feeds both the sketch and the truth set
    )
    cms = (
        kc.crossJoin(F.broadcast(rows))
        .groupBy("r", bucket(F.col("r"), F.col("k")).alias("b"))
        .agg(F.sum("n").alias("c"))
    )
    truth = kc.filter(F.col("n") >= 8)
    probes = truth.crossJoin(F.broadcast(rows)).select(
        "k", "n", "r", bucket(F.col("r"), F.col("k")).alias("b")
    )
    return (
        probes.join(cms, ["r", "b"])
        .groupBy(F.col("k").alias("partkey"), F.col("n").alias("true_count"))
        .agg(F.min("c").alias("cms_est"))
    )


# ---------------------------------------------------------------------------
# KMV set algebra: union/intersection estimates from MERGED sketches.
# The reason sketches exist at 100 TB is that they compose WITHOUT
# rescanning data: |A∪B| comes from union-and-truncate of the two
# bottom-k arrays, |A∩B| from the Jaccard fraction of the merged
# sketch (ρ = |sk(U) ∩ sk(A) ∩ sk(B)| / |sk(U)|, |A∩B| ≈ ρ·|A∪B|).
# Both are pure functions of md5 values, so the estimates themselves
# are value-oracled next to the exact answers.
# ---------------------------------------------------------------------------


@register(
    "kmv_set_algebra",
    oracle=f"""
WITH a AS (SELECT DISTINCT o_custkey FROM orders WHERE date_part('year', o_orderdate) = 1994),
b AS (SELECT DISTINCT o_custkey FROM orders WHERE date_part('year', o_orderdate) = 1995),
ha AS (SELECT CAST(concat('0x', substr(md5(CAST(o_custkey AS VARCHAR)), 1, 15)) AS BIGINT) AS hv FROM a),
hb AS (SELECT CAST(concat('0x', substr(md5(CAST(o_custkey AS VARCHAR)), 1, 15)) AS BIGINT) AS hv FROM b),
ska AS (SELECT hv FROM (SELECT hv, row_number() OVER (ORDER BY hv) AS rn FROM ha) x WHERE rn <= {_K}),
skb AS (SELECT hv FROM (SELECT hv, row_number() OVER (ORDER BY hv) AS rn FROM hb) x WHERE rn <= {_K}),
hu AS (SELECT DISTINCT hv FROM (SELECT hv FROM ska UNION ALL SELECT hv FROM skb) y),
sku AS (SELECT hv FROM (SELECT hv, row_number() OVER (ORDER BY hv) AS rn FROM hu) z WHERE rn <= {_K}),
n AS (SELECT (SELECT count(*) FROM a) AS na,
             (SELECT count(*) FROM b) AS nb,
             (SELECT count(*) FROM (SELECT o_custkey FROM a UNION SELECT o_custkey FROM b) u) AS nu,
             (SELECT count(*) FROM (SELECT o_custkey FROM a INTERSECT SELECT o_custkey FROM b) i) AS ni,
             (SELECT max(hv) FROM ska) AS ka,
             (SELECT max(hv) FROM skb) AS kb,
             (SELECT max(hv) FROM sku) AS ku,
             (SELECT count(*) FROM sku
              WHERE hv IN (SELECT hv FROM ska) AND hv IN (SELECT hv FROM skb)) AS rho_num,
             (SELECT count(*) FROM sku) AS ksz)
SELECT CAST(na AS BIGINT) AS n_a_exact,
       CAST(nb AS BIGINT) AS n_b_exact,
       CAST(nu AS BIGINT) AS union_exact,
       CAST(ni AS BIGINT) AS inter_exact,
       CAST(CASE WHEN na <= {_K} THEN CAST(na AS DOUBLE)
                 ELSE round({_K - 1}.0 * {_HASH_SPACE!r} / CAST(ka AS DOUBLE), 6) END AS DOUBLE) AS est_a,
       CAST(CASE WHEN nb <= {_K} THEN CAST(nb AS DOUBLE)
                 ELSE round({_K - 1}.0 * {_HASH_SPACE!r} / CAST(kb AS DOUBLE), 6) END AS DOUBLE) AS est_b,
       CAST(CASE WHEN nu <= {_K} THEN CAST(nu AS DOUBLE)
                 ELSE round({_K - 1}.0 * {_HASH_SPACE!r} / CAST(ku AS DOUBLE), 6) END AS DOUBLE) AS union_est,
       round((CAST(rho_num AS DOUBLE) / ksz)
             * CAST(CASE WHEN nu <= {_K} THEN CAST(nu AS DOUBLE)
                         ELSE round({_K - 1}.0 * {_HASH_SPACE!r} / CAST(ku AS DOUBLE), 6) END AS DOUBLE),
             6) AS inter_est
FROM n
""",
)
def kmv_set_algebra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch composition: distinct 1994-customers (A) vs 1995 (B),
    |A∪B| and |A∩B| estimated FROM THE SKETCHES ALONE (merge =
    union-and-truncate of bottom-k arrays; intersection via the Jaccard
    fraction of the merged sketch), reported beside the exact values.
    This is the operation that makes sketches pay at 100 TB: per-
    segment sketches roll up to any ad-hoc union/overlap question —
    "how many users did segments X and Y share last quarter?" — with
    k·8 bytes per segment and ZERO rescans of the fact data.

    Determinism: every step is a pure function of the 60-bit md5 hash,
    so both engines compute identical sketches, the same ρ, and the
    same rounded estimates (int→double casts of >2^53 hashes round to
    nearest identically). Sketch extraction uses orderBy().limit(k) —
    TakeOrderedAndProject, a distributed bottom-k, never a
    single-partition window; the bounded collects below pull ≤ 3k hash
    values + 4 counters to the driver (sketch-sized by definition)."""
    od = t(spark, sf_dir, "orders")

    # r12 (guide §2.4/§1.2): the previous form ran SIX sequential driver
    # actions (two bottom-k collects + four counts), each rescanning
    # orders — ~2.3 s of job latency for sketch-sized results. One
    # grouped year-presence table yields every value: na/nb/nu/ni are
    # flag sums over it (identical sets: group-by-custkey IS the
    # distinct), and both bottom-k sketches read the same hv projection.
    # All three branches union into ONE collected frame, so the grouped
    # exchange is built once and reused (ReuseExchange) — 6 actions ->
    # 1, same values bit-for-bit (exact integers and the same md5 hvs).
    flags = (
        od.filter(F.year("o_orderdate").isin(1994, 1995))
        .groupBy("o_custkey")
        .agg(
            F.max(F.when(F.year("o_orderdate") == 1994, 1).otherwise(0)).alias("in_a"),
            F.max(F.when(F.year("o_orderdate") == 1995, 1).otherwise(0)).alias("in_b"),
        )
    )
    hvf = flags.select(
        _md5_60bit(F.col("o_custkey")).alias("hv"), "in_a", "in_b"
    )
    nulls = [F.lit(None).cast("long").alias(c) for c in ("na", "nb", "nu", "ni")]

    def sk(tag: str, flag: str) -> DataFrame:
        return (
            hvf.filter(F.col(flag) == 1)
            .select("hv")
            .orderBy("hv")
            .limit(_K)
            .select(F.lit(tag).alias("tag"), F.col("hv"), *nulls)
        )

    cnt_df = flags.agg(
        F.sum("in_a").cast("long").alias("na"),
        F.sum("in_b").cast("long").alias("nb"),
        F.count(F.lit(1)).cast("long").alias("nu"),
        F.sum(F.col("in_a") * F.col("in_b")).cast("long").alias("ni"),
    ).select(F.lit("n").alias("tag"), F.lit(None).cast("long").alias("hv"), "na", "nb", "nu", "ni")
    rows = sk("a", "in_a").unionByName(sk("b", "in_b")).unionByName(cnt_df).collect()
    ska = sorted(r["hv"] for r in rows if r["tag"] == "a")
    skb = sorted(r["hv"] for r in rows if r["tag"] == "b")
    (nrow,) = [r for r in rows if r["tag"] == "n"]
    na, nb, nu, ni = nrow["na"], nrow["nb"], nrow["nu"], nrow["ni"]
    sku = sorted(set(ska) | set(skb))[:_K]
    rho_num = sum(1 for hv in sku if hv in set(ska) and hv in set(skb))
    ksz = len(sku)

    def est_expr(n: int, sketch: list[int]):
        if n <= _K:
            return F.lit(float(n))
        return F.round(
            F.lit(float(_K - 1)) * F.lit(_HASH_SPACE) / F.lit(float(max(sketch))), 6
        )

    est_u = est_expr(nu, sku)
    return spark.range(1).select(
        F.lit(na).cast("bigint").alias("n_a_exact"),
        F.lit(nb).cast("bigint").alias("n_b_exact"),
        F.lit(nu).cast("bigint").alias("union_exact"),
        F.lit(ni).cast("bigint").alias("inter_exact"),
        est_expr(na, ska).cast("double").alias("est_a"),
        est_expr(nb, skb).cast("double").alias("est_b"),
        est_u.cast("double").alias("union_est"),
        F.round((F.lit(float(rho_num)) / F.lit(float(ksz))) * est_u, 6).alias(
            "inter_est"
        ),
    )
