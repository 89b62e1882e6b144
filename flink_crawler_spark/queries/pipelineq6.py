"""Dataset-assembly wave 6: the curation decisions downstream of the
wave-4/5 signals.

  * ccnet_perplexity_buckets — CCNet's actual head/middle/tail split:
    per-LANGUAGE terciles of the bigram-LM score (wave 5 computed the
    score; this is the bucketing step training runs consume), ranked
    with a keyed two-phase distributed rank so the dominant language
    never serializes through one task.
  * hits_hub_authority — HITS (hubs & authorities) over the derived
    link graph: the second classic link-analysis algorithm next to
    pagerank_5iter, with the same DECIMAL contribution discipline so a
    1000-partition cluster and the single-threaded oracle agree
    bit-for-bit.
  * embedding_outlier_prune — per-label centroid distance z-score
    prune: the mislabeled/out-of-distribution filter run before
    embedding-based curation trusts its labels.
  * cross_source_contamination — near-dup pair counts BETWEEN corpus
    sources (the MinHash->LSH->verify chain of dedupq, aggregated by
    source pair): tells the dataset assembler which subcorpora overlap
    before mixture weights are chosen.

All exact-value DuckDB oracles. These extend the LLM-pipeline surface
(SURVEY.md §6); the crawler core they feed is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


from ..operators.partitioning import distributed_keyed_row_number
from .base import register, t
from .base import dec_to_double_wide as _d2dw
from .base import dec_to_double_wide_sql as _d2dws
from .base import dsum_wide_expr_sql as _dwes
from .crawlq import EDGES_SQL, _edges
from .dedupq import (
    BANDS,
    DUCK_SHINGLES,
    JACCARD_THRESHOLD,
    NUM_HASHES,
    _buckets_sql,
    _sigs_sql,
)
from .dedupq import DUCK_TOKS as DEDUP_TOKS  # dedup-chain token class
from .pipelineq5 import BIGRAM_NLL_CTES, bigram_nll_table
from .simq import DIM

# ---------------------------------------------------------------------------
# ccnet_perplexity_buckets — per-language head/middle/tail
# ---------------------------------------------------------------------------


@register(
    "ccnet_perplexity_buckets",
    oracle=f"""
WITH {BIGRAM_NLL_CTES},
j AS (SELECT n.doc_id, d.lang, n.avg_nll
      FROM nll n JOIN documents d USING (doc_id)),
rk AS (SELECT doc_id, lang, avg_nll,
              row_number() OVER (PARTITION BY lang ORDER BY avg_nll, doc_id) AS rn,
              count(*) OVER (PARTITION BY lang) AS cnt
       FROM j)
SELECT doc_id, lang, avg_nll,
       CASE CAST(floor(((rn - 1) * 3.0) / cnt) AS BIGINT)
         WHEN 0 THEN 'head' WHEN 1 THEN 'middle' ELSE 'tail' END AS bucket
FROM rk
""",
)
def ccnet_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet's head/middle/tail assignment: within each language, rank
    docs by LM score (ascending — lowest NLL is most fluent) and split
    into terciles. CCNet keeps head+middle and drops or down-weights
    tail; the bucket column is that decision. Ranks are on the ROUNDED
    score (round-before-rank convention) with doc_id tie-break, and the
    tercile boundary is pure integer-ish arithmetic (floor(3(rn-1)/cnt))
    so both engines cut identically.

    100 TB shape: the rank is distributed_keyed_row_number — range
    partition on (lang, score), per-(partition,lang) counts, and a
    broadcast offset table that holds only partition-BOUNDARY-spanning
    entries (≤ nparts-1 rows by construction, regardless of language
    cardinality or skew). A plain Window.partitionBy(lang) would drag
    the dominant language (half the web) through one task. Per-language
    totals are a tiny broadcast (~hundreds of languages)."""
    d = t(spark, sf_dir, "documents")
    j = bigram_nll_table(spark, sf_dir).join(d.select("doc_id", "lang"), "doc_id")
    rk = distributed_keyed_row_number(
        j, ["lang"], [F.asc("avg_nll"), F.asc("doc_id")], out="rn"
    )
    # per-language totals from rk, NOT from j: the rank primitive has
    # already pinned the ranged frame with a localCheckpoint, so this
    # aggregate reads the checkpoint — counting from j would re-evaluate
    # the whole bigram-LM chain a second time (measured 2x at sf0.1)
    cnt = rk.groupBy("lang").agg(F.count(F.lit(1)).alias("cnt"))
    b = F.floor(((F.col("rn") - 1) * 3.0) / F.col("cnt"))
    return (
        rk.join(F.broadcast(cnt), "lang")
        .select(
            "doc_id",
            "lang",
            "avg_nll",
            F.when(b == 0, "head")
            .when(b == 1, "middle")
            .otherwise("tail")
            .alias("bucket"),
        )
    )


# ---------------------------------------------------------------------------
# hits_hub_authority — hubs & authorities on the link graph
# ---------------------------------------------------------------------------

HITS_ITERS = 5

# driver-fold gate: module-level so the path-equivalence test can force
# the distributed branch (tests/test_hits_paths.py, the sssp idiom)
HITS_DRIVER_MAX_EDGES = 5_000_000


def _hits_driver_fold(spark: SparkSession, dedup: DataFrame) -> DataFrame:
    """The 5 HITS iterations on the collected edge list — exact replica
    of the distributed half-step arithmetic (r12, guide §1.2/§8; the
    sssp/facility_location precedent):

      * contribution  = CAST(round(score, 12) AS DECIMAL(38,18)):
        Spark's Round(double) is BigDecimal.valueOf(x).setScale(12,
        HALF_UP).toDouble and the double->decimal cast is
        BigDecimal.valueOf(r); Python's shortest round-trip repr() emits
        the same digit string as Double.toString, so
        Decimal(repr(x)).quantize(1e-12, HALF_UP) -> float -> repr ->
        Decimal reproduces both steps bit-for-bit;
      * the per-target DECIMAL sum is exact in both engines (<= 17
        digits, far below context precision);
      * max + the one double division per node are single
        correctly-rounded ops in both (BigDecimal.doubleValue ==
        float(Decimal)).

    The measured cost of the distributed loop was pure driver latency:
    92 scheduler jobs of <= 0.21 s each (10 half-steps of AQE stage
    materializations, broadcast builds and checkpoints) for a
    modulo-bounded graph of <= 2*|part| edges."""
    from decimal import ROUND_HALF_UP, Decimal

    q12, q6 = Decimal("1e-12"), Decimal("0.000001")
    pairs = [(r[0], r[1]) for r in dedup.collect()]
    nodes = sorted({s for s, _ in pairs} | {d for _, d in pairs})

    def half(scores: dict, flip: bool) -> dict:
        contrib = {}
        for i, x in scores.items():
            r = float(Decimal(repr(x)).quantize(q12, rounding=ROUND_HALF_UP))
            contrib[i] = Decimal(repr(r))
        raw: dict = {}
        for s, d in pairs:
            if flip:
                s, d = d, s
            prev = raw.get(d)
            raw[d] = contrib[s] if prev is None else prev + contrib[s]
        m = float(max(raw.values()))
        return {i: float(raw[i]) / m if i in raw else 0.0 for i in nodes}

    h = {i: 1.0 for i in nodes}
    a: dict = {}
    for _ in range(HITS_ITERS):
        a = half(h, flip=False)
        h = half(a, flip=True)

    def r6(v: float) -> float:
        return float(Decimal(repr(v)).quantize(q6, rounding=ROUND_HALF_UP))

    return spark.createDataFrame(
        [(int(i), r6(h[i]), r6(a[i])) for i in nodes],
        "id bigint, hub double, auth double",
    )


def _hits_sql(iters: int) -> str:
    """Unrolled HITS iterations, max-normalized, with DECIMAL(38,18)
    contribution sums (the pagerank_5iter exactness discipline).

    Every layer is AS MATERIALIZED: each a/h level is referenced twice
    (the join AND its max-normalizer scalar subquery), and DuckDB
    INLINES plain CTEs — without materialization the chain re-expands
    ~2x per half-iteration (2^10 recomputations of the base scan; the
    unmaterialized form exhausted file handles opening the parquet)."""
    layers = ["h0 AS MATERIALIZED (SELECT id, 1.0 AS hub FROM nodes)"]
    for i in range(1, iters + 1):
        layers.append(f"""
a{i}raw AS MATERIALIZED (
  SELECT e.dst AS id, sum(CAST(round(h.hub, 12) AS DECIMAL(38,18))) AS s
  FROM dedup e JOIN h{i - 1} h ON h.id = e.src GROUP BY e.dst
),
a{i} AS MATERIALIZED (
  SELECT nd.id,
         COALESCE(CAST(r.s AS DOUBLE), 0.0)
           / (SELECT CAST(max(s) AS DOUBLE) FROM a{i}raw) AS auth
  FROM nodes nd LEFT JOIN a{i}raw r ON r.id = nd.id
),
h{i}raw AS MATERIALIZED (
  SELECT e.src AS id, sum(CAST(round(a.auth, 12) AS DECIMAL(38,18))) AS s
  FROM dedup e JOIN a{i} a ON a.id = e.dst GROUP BY e.src
),
h{i} AS MATERIALIZED (
  SELECT nd.id,
         COALESCE(CAST(r.s AS DOUBLE), 0.0)
           / (SELECT CAST(max(s) AS DOUBLE) FROM h{i}raw) AS hub
  FROM nodes nd LEFT JOIN h{i}raw r ON r.id = nd.id
)""")
    return ",".join(layers)


@register(
    "hits_hub_authority",
    oracle=f"""
WITH {EDGES_SQL.strip()},
dedup AS MATERIALIZED (SELECT DISTINCT src, dst FROM edges),
nodes AS MATERIALIZED (SELECT DISTINCT id FROM (SELECT src AS id FROM dedup UNION SELECT dst FROM dedup) x),
{_hits_sql(HITS_ITERS).strip()}
SELECT nd.id, round(h.hub, 6) AS hub, round(a.auth, 6) AS auth
FROM nodes nd
JOIN h{HITS_ITERS} h ON h.id = nd.id
JOIN a{HITS_ITERS} a ON a.id = nd.id
""",
)
def hits_hub_authority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS (Kleinberg hubs & authorities, 5 iterations, max-normalized)
    over the derived link graph — the link-analysis companion to
    pagerank_5iter: authority ≈ pages good crawl seeds point AT, hub ≈
    pages that point at good authorities (the frontier-seeding signal a
    crawl operator reads next to domain scores).

    Exactness: every contribution is round(x,12) summed in
    DECIMAL(38,18); the per-iteration normalizer is max() (exact on the
    decimal sums) followed by one double division — so a 1000-partition
    cluster and the single-threaded oracle agree bit-for-bit, like
    pagerank. At 100 TB: one join+agg per half-iteration on edges
    pre-partitioned once; the 1-row max broadcasts."""
    edges, _n = _edges(spark, sf_dir)
    dedup = (
        edges.select(F.col("id").alias("src"), "dst")
        .distinct()
        .localCheckpoint(eager=True)
    )
    # r12: modulo-bounded graphs fold in the driver (exact-equivalence
    # proof + latency profile on _hits_driver_fold); larger graphs keep
    # the distributed per-half-iteration loop below unchanged.
    if dedup.count() <= HITS_DRIVER_MAX_EDGES:
        return _hits_driver_fold(spark, dedup)
    nodes = (
        dedup.select(F.col("src").alias("id"))
        .unionByName(dedup.select(F.col("dst").alias("id")))
        .distinct()
        .localCheckpoint(eager=True)
    )

    def half_step(scores: DataFrame, in_col: str, src: str, dst: str, out: str,
                  pin: bool):
        # Each raw-sum level feeds BOTH its consumer join AND its max
        # normalizer — left as lazy lineage those two references
        # duplicate the whole upstream subtree, doubling the physical
        # plan per half-iteration (2^10 by iteration 5; same blowup the
        # oracle hits via CTE inlining, fixed there with MATERIALIZED).
        # An eager localCheckpoint is the Spark-side materialization —
        # but one scheduled job per HALF-iteration is pure driver
        # latency on this tiny table, so only the full-iteration output
        # (the hub side) is pinned: the unpinned auth half duplicates a
        # subtree whose leaves are the previous pinned hub + the pinned
        # edge list, so plan depth stays bounded per iteration (x2, not
        # 2^10) while the checkpoint jobs halve (measured 5.4 s ->
        # 4.6 s steady-state at sf0.1).
        raw = (
            dedup.join(scores, F.col(src) == scores.id)
            .groupBy(F.col(dst).alias("gid"))
            .agg(F.sum(F.round(in_col, 12).cast("decimal(38,18)")).alias("s"))
        )
        if pin:
            raw = raw.localCheckpoint(eager=True)
        mx = raw.agg(F.max("s").cast("double").alias("m"))
        return (
            nodes.join(raw, nodes.id == F.col("gid"), "left")
            .crossJoin(F.broadcast(mx))
            .select(
                "id",
                (F.coalesce(F.col("s").cast("double"), F.lit(0.0)) / F.col("m")).alias(
                    out
                ),
            )
        )

    h = nodes.withColumn("hub", F.lit(1.0))
    a = None
    for _ in range(HITS_ITERS):
        a = half_step(h, "hub", "src", "dst", "auth", pin=False)
        h = half_step(a, "auth", "dst", "src", "hub", pin=True)
    return h.join(a, "id").select(
        "id", F.round("hub", 6).alias("hub"), F.round("auth", 6).alias("auth")
    )


# ---------------------------------------------------------------------------
# embedding_outlier_prune — per-label centroid-distance z-score
# ---------------------------------------------------------------------------

OUT_Z = 2.0


def _eo_xcols() -> str:
    return ", ".join(f"CAST(embedding[{d}] AS DOUBLE) AS x{d}" for d in range(1, DIM + 1))


def _eo_mean_cols() -> str:
    return ", ".join(
        f"{_dwes(f'x{d}')} / count(*) AS c{d}"
        for d in range(1, DIM + 1)
    )


def _eo_dist_sql() -> str:
    return " + ".join(
        f"((x.x{d} - c.c{d}) * (x.x{d} - c.c{d}))" for d in range(1, DIM + 1)
    )


@register(
    "embedding_outlier_prune",
    oracle=f"""
WITH x AS (SELECT vec_id, label, {_eo_xcols()} FROM embeddings),
c AS (SELECT label, {_eo_mean_cols()} FROM x GROUP BY label),
dd AS (SELECT x.vec_id, x.label, round({_eo_dist_sql()}, 6) AS rd
       FROM x JOIN c USING (label)),
st AS (SELECT label,
              {_d2dws("sum(CAST(rd AS DECIMAL(28,6)))")} / count(*) AS m,
              {_d2dws("sum(CAST(round(rd * rd, 6) AS DECIMAL(38,6)))")} / count(*) AS m2
       FROM dd GROUP BY label)
SELECT dd.vec_id, dd.label, dd.rd AS dist,
       dd.rd > st.m + {OUT_Z} * sqrt(greatest(st.m2 - st.m * st.m, 0.0)) AS is_outlier
FROM dd JOIN st USING (label)
""",
)
def embedding_outlier_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-conditioned outlier prune: squared L2 distance of each
    vector to its OWN label's centroid, flagged when beyond mean + 2σ of
    that label's distance distribution — the mislabeled / out-of-
    distribution filter run before trusting labels for stratified
    sampling or classifier training (SemDeDup's in-cluster sibling).

    Exactness: centroids use the kmeans DECIMAL-mean discipline;
    distances are the identical left-associated 64-term double sum on
    both engines (computed as an array fold Spark-side), rounded to 6dp
    BEFORE the moment sums, so mean/variance/threshold — and therefore
    the knife-edge comparison — are bit-identical.

    100 TB shape: centroids are a (labels × dim) aggregate that
    posexplodes and combines map-side, then BROADCASTS (shuffle carries
    ≤ labels × dim × partitions rows); the distance pass is one scan;
    the per-label moment table broadcasts the same way. Nothing
    shuffles the corpus."""
    emb = t(spark, sf_dir, "embeddings")
    x = emb.select(
        "vec_id",
        "label",
        F.transform("embedding", lambda v: v.cast("double")).alias("xv"),
    )
    cent = (
        x.select("label", F.posexplode("xv").alias("d", "xd"))
        .groupBy("label", "d")
        .agg(
            F.sum(F.round(F.col("xd"), 6).cast("decimal(28,6)")).alias("s"),
            F.count(F.lit(1)).alias("n"),
        )
        .select("label", "d", (_d2dw(F.col("s")) / F.col("n")).alias("cd"))
        .groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("d", "cd"))).alias("p"))
        .select("label", F.transform("p", lambda q: q["cd"]).alias("cv"))
    )
    dist = F.aggregate(
        F.zip_with(F.col("xv"), F.col("cv"), lambda a, b: (a - b) * (a - b)),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )
    dd = (
        x.join(F.broadcast(cent), "label")
        .withColumn("rd", F.round(dist, 6))
        .select("vec_id", "label", "rd")
    )
    st = dd.groupBy("label").agg(
        (_d2dw(F.sum(F.col("rd").cast("decimal(28,6)"))) / F.count(F.lit(1))).alias(
            "m"
        ),
        (
            _d2dw(F.sum(F.round(F.col("rd") * F.col("rd"), 6).cast("decimal(38,6)")))
            / F.count(F.lit(1))
        ).alias("m2"),
    )
    thr = F.col("m") + OUT_Z * F.sqrt(
        F.greatest(F.col("m2") - F.col("m") * F.col("m"), F.lit(0.0))
    )
    return dd.join(F.broadcast(st), "label").select(
        "vec_id",
        "label",
        F.col("rd").alias("dist"),
        (F.col("rd") > thr).alias("is_outlier"),
    )


# ---------------------------------------------------------------------------
# cross_source_contamination — which subcorpora overlap?
# ---------------------------------------------------------------------------


@register(
    "cross_source_contamination",
    oracle=f"""
WITH {_sigs_sql().strip()},
buckets AS (
{_buckets_sql()}
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM buckets a JOIN buckets b ON a.band = b.band AND a.bh = b.bh
  WHERE a.doc_id < b.doc_id
),
shs AS (SELECT doc_id, {DUCK_SHINGLES} AS sh
        FROM (SELECT doc_id, {DEDUP_TOKS} AS toks FROM documents) x),
verified AS (
  SELECT p.id_a, p.id_b
  FROM cand p
  JOIN shs a ON p.id_a = a.doc_id
  JOIN shs b ON p.id_b = b.doc_id
  WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        / CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE) >= {JACCARD_THRESHOLD}
)
SELECT least(da.source, db.source) AS source_a,
       greatest(da.source, db.source) AS source_b,
       CAST(count(*) AS BIGINT) AS n_pairs
FROM verified v
JOIN documents da ON v.id_a = da.doc_id
JOIN documents db ON v.id_b = db.doc_id
GROUP BY least(da.source, db.source), greatest(da.source, db.source)
""",
)
def cross_source_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate pair counts by (source, source) — the overlap
    matrix between subcorpora. Off-diagonal rows are cross-source
    contamination (the same page crawled into two collections): they
    inflate any mixture weight computed per-source and leak between
    sources that land in different splits. Diagonal rows are
    within-source redundancy. Run this BEFORE corpus_mix_budget /
    mixture_temperature_sample trusts per-source counts.

    100 TB shape: inherits the dedupq chain exactly — MinHash
    signatures in one scan, LSH band equi-join (never all-pairs), exact
    Jaccard verify on candidates only; the final rollup joins the
    (small) verified pair set to documents on doc_id and aggregates to
    a sources² table."""
    # r12 (guide §2.4): the verified pair set at the family threshold is
    # the SAME frame near_dup_clusters materializes — ride the memoized
    # session-shared derivation instead of re-running signature -> band
    # -> verify from raw text (bit-identical; see near_dup_verified_pairs)
    from .dedupq import near_dup_verified_pairs

    docs = t(spark, sf_dir, "documents")
    pairs = near_dup_verified_pairs(spark, sf_dir)
    sa = docs.select(F.col("doc_id").alias("doc_a"), F.col("source").alias("sa"))
    sb = docs.select(F.col("doc_id").alias("doc_b"), F.col("source").alias("sb"))
    j = pairs.join(sa, F.col("id_a") == F.col("doc_a")).join(
        sb, F.col("id_b") == F.col("doc_b")
    )
    return (
        j.select(
            F.least("sa", "sb").alias("source_a"),
            F.greatest("sa", "sb").alias("source_b"),
        )
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )
