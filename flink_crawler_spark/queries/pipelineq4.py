"""Pipeline wave 4: dataset-assembly decisions a training run lives or
dies by — leakage-safe splitting, temperature-based mixture sampling,
and semantic (embedding-cosine) eval decontamination.

Both are exact-value oracled. Reference anchor: these extend the
crawl engine's corpus outputs (operators/parse.py content sinks,
fc/pojos/ParsedUrl.java) into the standard LLM data-prep stages; the
dedup chain they build on mirrors the repo's MinHash->LSH->verify->
components pipeline (queries/dedupq.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .base import register, t
from .dedupq import (
    BANDS,
    DUCK_SHINGLES,
    DUCK_TOKS,
    JACCARD_THRESHOLD,
    NUM_HASHES,
    _buckets_sql,
    _sigs_sql,
)

_HEX = "0123456789abcdef"

# split boundaries over md5-derived buckets 0..99
TRAIN_LT, VAL_LT = 80, 90

_CLUSTERS_SQL = f"""
{_sigs_sql().strip()},
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
        / CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE) >= {JACCARD_THRESHOLD}
),
edges AS (SELECT id_a AS src, id_b AS dst FROM verified
          UNION SELECT id_b, id_a FROM verified),
reach(id, lbl) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.id
),
clusters AS (SELECT id AS doc_id, min(lbl) AS cluster_id FROM reach GROUP BY id)
"""


@register(
    "leakage_safe_split",
    oracle=f"""
WITH RECURSIVE {_CLUSTERS_SQL.strip()}
SELECT doc_id, cluster_id,
       CASE WHEN bucket < {TRAIN_LT} THEN 'train'
            WHEN bucket < {VAL_LT} THEN 'val'
            ELSE 'test' END AS split
FROM (
  SELECT doc_id, cluster_id,
         ((strpos('{_HEX}', substr(md5(CAST(cluster_id AS VARCHAR)), 1, 1)) - 1) * 16
          + (strpos('{_HEX}', substr(md5(CAST(cluster_id AS VARCHAR)), 2, 1)) - 1)) % 100
           AS bucket
  FROM clusters
) z
""",
)
def leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/val/test split that CANNOT leak near-duplicates across
    splits: the split key is the near-dup CLUSTER id (the full
    MinHash -> LSH -> exact-Jaccard verify -> connected-components
    chain of ``near_dup_clusters``), not the document id, so a
    document and its paraphrase land in the same split by
    construction — the leakage mode hash-by-doc splits suffer (a test
    doc whose near-copy sits in train silently inflates eval).

    Determinism is engine-independent (md5 of the cluster id -> bucket
    0..99; 80/10/10). Scale shape: the chain is the already-bucketed
    LSH pipeline plus one broadcast-sized md5 projection — assigning
    splits adds ZERO shuffles on top of clustering, and the split
    column then prunes parquet partitions when the corpus is written
    ``partitionBy("split")``."""
    # r12 (guide §2.4): this chain (pairs at JACCARD_THRESHOLD over the
    # full corpus + HashMin components) IS near_dup_clusters — consume
    # the memoized session-shared assignment instead of re-deriving it
    # from raw text (value-identical by construction: same edge set,
    # same deterministic min-label iteration)
    from .dedupq import near_dup_clusters

    clusters = near_dup_clusters(spark, sf_dir)
    keyed = clusters.withColumn(
        "__key", F.md5(F.encode(F.col("cluster_id").cast("string"), "UTF-8"))
    )

    def hexv(i: int):
        return F.expr(f"locate(substr(__key, {i}, 1), '{_HEX}') - 1")

    bucket = (hexv(1) * 16 + hexv(2)) % 100
    return keyed.select(
        "doc_id",
        "cluster_id",
        F.when(bucket < TRAIN_LT, "train")
        .when(bucket < VAL_LT, "val")
        .otherwise("test")
        .alias("split"),
    )


# ---------------------------------------------------------------------------
# mixture_temperature_sample — temperature-reweighted source sampling
# ---------------------------------------------------------------------------

TEMP = 0.5        # mixture temperature (0=uniform over sources, 1=natural)
TARGET_FRAC = 0.4  # sampled corpus size as a fraction of the input
_SCALE = 16 ** 6   # md5 prefix resolution for the acceptance threshold


@register(
    "mixture_temperature_sample",
    oracle=f"""
WITH counts AS (
  SELECT source, CAST(count(*) AS DOUBLE) AS n FROM documents GROUP BY source
),
tot AS (SELECT sum(CAST(round(power(n, {TEMP}), 6) AS DECIMAL(28,6))) AS wsum,
               sum(n) AS ntot FROM counts),
rates AS (
  SELECT c.source,
         round(least(1.0, {TARGET_FRAC} * t.ntot
               * CAST(CAST(round(power(c.n, {TEMP}), 6) AS DECIMAL(28,6)) AS DOUBLE)
               / CAST(t.wsum AS DOUBLE) / c.n), 6)
           AS rate
  FROM counts c CROSS JOIN tot t
),
u AS (
  SELECT doc_id, source,
         CAST(((strpos('{_HEX}', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * {16 ** 5}
             + (strpos('{_HEX}', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) * {16 ** 4}
             + (strpos('{_HEX}', substr(md5(CAST(doc_id AS VARCHAR)), 3, 1)) - 1) * {16 ** 3}
             + (strpos('{_HEX}', substr(md5(CAST(doc_id AS VARCHAR)), 4, 1)) - 1) * {16 ** 2}
             + (strpos('{_HEX}', substr(md5(CAST(doc_id AS VARCHAR)), 5, 1)) - 1) * 16
             + (strpos('{_HEX}', substr(md5(CAST(doc_id AS VARCHAR)), 6, 1)) - 1))
              AS BIGINT) AS uval
  FROM documents
)
SELECT u.doc_id, u.source, r.rate,
       u.uval < CAST(floor(r.rate * {_SCALE}) AS BIGINT) AS accepted
FROM u JOIN rates r USING (source)
""",
)
def mixture_temperature_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based mixture sampling (the multilingual/multi-source
    rebalancing rule popularized by mBERT/XLM-R and used for pretraining
    mixes): source i with n_i docs gets sampling weight n_i^T (T=0.5),
    i.e. heavy sources are down-weighted toward the temperature-flattened
    distribution, and the per-source acceptance rate is
    min(1, target_size * p_i / n_i).

    Acceptance is a deterministic per-doc coin: the first 6 md5 hex
    digits of doc_id form an integer u in [0, 16^6), accepted iff
    u < floor(rate * 16^6) — INTEGER comparison on both engines, so the
    sample is reproducible and engine-exact (rate is rounded to 6
    decimals on both sides before scaling). Scale shape: per-source
    counts are a tiny agg broadcast back to the scan; the accept test is
    a pure projection — ONE map-side-combined shuffle for the counts,
    zero for the decision, regardless of corpus size."""
    docs = t(spark, sf_dir, "documents")
    counts = docs.groupBy("source").agg(F.count("*").cast("double").alias("n"))
    # per-source weights round to 6dp and sum as DECIMAL (the dsir/PQ
    # idiom): wsum is order-independent, so Spark's partial-aggregation
    # order can never flip a rate's 6th decimal vs DuckDB's scan order
    w6 = F.round(F.pow("n", F.lit(TEMP)), 6).cast("decimal(28,6)")
    tot = counts.agg(F.sum(w6).alias("wsum"), F.sum("n").alias("ntot"))
    rates = counts.crossJoin(F.broadcast(tot)).select(
        "source",
        F.round(
            F.least(
                F.lit(1.0),
                F.lit(TARGET_FRAC)
                * F.col("ntot")
                * w6.cast("double")
                / F.col("wsum").cast("double")
                / F.col("n"),
            ),
            6,
        ).alias("rate"),
    )
    keyed = docs.withColumn(
        "__key", F.md5(F.encode(F.col("doc_id").cast("string"), "UTF-8"))
    )

    def hexv(i: int):
        return F.expr(f"CAST(locate(substr(__key, {i}, 1), '{_HEX}') - 1 AS BIGINT)")

    uval = sum(hexv(i + 1) * F.lit(16 ** (5 - i)) for i in range(6))
    u = keyed.select("doc_id", "source", uval.alias("uval"))
    return u.join(F.broadcast(rates), "source").select(
        "doc_id",
        "source",
        "rate",
        (F.col("uval") < F.floor(F.col("rate") * _SCALE).cast("long")).alias("accepted"),
    )


# ---------------------------------------------------------------------------
# semantic_contamination — embedding-cosine eval decontamination
# ---------------------------------------------------------------------------

SEM_CONTAM_TAU = 0.35  # discriminative on the synthetic clusters (~p90 of
# max cross-label cosine); real eval decontamination on meaningful
# embeddings runs ~0.95+ — the threshold is a config constant, the shape
# is what matters
BENCH_LABEL = 9
_DOT64 = " + ".join(f"c.emb[{i}] * b.emb[{i}]" for i in range(1, 65))


@register(
    "semantic_contamination",
    oracle=f"""
WITH e AS (
  SELECT vec_id, label,
         list_transform(embedding, v -> CAST(v AS DOUBLE)) AS emb,
         sqrt(list_sum(list_transform(embedding,
              v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))) AS nrm
  FROM embeddings
),
b AS (SELECT * FROM e WHERE label = {BENCH_LABEL}),
c AS (SELECT * FROM e WHERE label <> {BENCH_LABEL}),
p AS (
  SELECT c.vec_id,
         max(CASE WHEN c.nrm * b.nrm > 0
                  THEN round(({_DOT64}) / (c.nrm * b.nrm), 6)
                  ELSE 0.0 END) AS max_benchmark_cos
  FROM c JOIN b ON TRUE
  GROUP BY c.vec_id
)
SELECT vec_id, max_benchmark_cos,
       max_benchmark_cos >= {SEM_CONTAM_TAU} AS contaminated
FROM p
""",
)
def semantic_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SEMANTIC eval decontamination: flag corpus embeddings whose
    cosine to ANY benchmark embedding reaches the threshold — the
    paraphrase-robust complement to ``benchmark_contamination``'s exact
    8-gram screen (an eval item reworded enough to share no 8-gram
    still sits next to its source in embedding space).

    Scale shape: eval sets are small by nature, so the benchmark side
    BROADCASTS (thousands of rows whatever the corpus size) and the
    corpus side is ONE scan through a broadcast nested-loop join; the
    only shuffle is the per-vector max aggregation, map-side-combined
    on vec_id. No corpus-vs-corpus pair ever forms — contamination is
    corpus x benchmark, never O(n^2). Dot/norm folds are sequential
    doubles in both engines, rounded to 6dp before max, so the flags
    are engine-exact."""
    e = t(spark, sf_dir, "embeddings")
    emb = F.transform(F.col("embedding"), lambda v: v.cast("double"))
    nrm = F.sqrt(
        F.aggregate(emb, F.lit(0.0), lambda a, v: a + v * v)
    )
    keyed = e.select("vec_id", "label", emb.alias("emb"), nrm.alias("nrm"))
    bench = keyed.filter(F.col("label") == BENCH_LABEL).select(
        F.col("emb").alias("bemb"), F.col("nrm").alias("bnrm")
    )
    corpus = keyed.filter(F.col("label") != BENCH_LABEL)
    dot = F.aggregate(
        F.zip_with(F.col("emb"), F.col("bemb"), lambda x, y: x * y),
        F.lit(0.0),
        lambda a, v: a + v,
    )
    # zero-norm guard pinned on BOTH engines: Spark's Divide yields NULL
    # on a 0 divisor while DuckDB's 0/0 is NaN (which its max() ranks
    # above every double) — sentinel 0.0 keeps the pair exact
    denom = F.col("nrm") * F.col("bnrm")
    cos = F.when(denom > 0, F.round(dot / denom, 6)).otherwise(F.lit(0.0))
    return (
        corpus.join(F.broadcast(bench))
        .groupBy("vec_id")
        .agg(F.max(cos).alias("max_benchmark_cos"))
        .select(
            "vec_id",
            "max_benchmark_cos",
            (F.col("max_benchmark_cos") >= SEM_CONTAM_TAU).alias("contaminated"),
        )
    )


# ---------------------------------------------------------------------------
# curation_funnel — the whole corpus-curation pipeline as ONE plan
# ---------------------------------------------------------------------------

CF_MIN_WORDS, CF_MAX_WORDS = 20, 100_000
CF_MIN_MWL, CF_MAX_MWL = 3.0, 10.0
CF_JACCARD = 0.6
CF_TARGET_FRAC = 0.5
CF_SHARDS = 16
_CF_WS = r"[ \t\n\f\r]+"  # explicit class: Java vs RE2 \s differ on \x0B


def _cf_oracle() -> str:
    mh_cols = ",\n         ".join(
        f"list_min(list_transform(sh, s -> md5('{k}|' || s))) AS mh{k}"
        for k in range(NUM_HASHES)
    )
    rows_per_band = NUM_HASHES // BANDS
    band_unions = "\nUNION ALL\n".join(
        f"SELECT doc_id, {b} AS band, md5("
        + " || '|' || ".join(f"mh{i}" for i in range(b * rows_per_band, (b + 1) * rows_per_band))
        + ") AS bh FROM sigs"
        for b in range(BANDS)
    )
    u6 = " + ".join(
        f"(strpos('{_HEX}', substr(md5(CAST(doc_id AS VARCHAR)), {i + 1}, 1)) - 1) * {16 ** (5 - i)}"
        for i in range(6)
    )
    return f"""
WITH RECURSIVE
w AS (
  SELECT doc_id, source, text,
         list_filter(string_split_regex(text, '{_CF_WS}'), x -> x != '') AS words
  FROM documents
),
q AS (
  SELECT doc_id, source, text,
         (len(words) >= {CF_MIN_WORDS} AND len(words) <= {CF_MAX_WORDS}
          AND (CASE WHEN len(words) > 0
               THEN CAST(list_sum(list_transform(words, x -> length(x))) AS DOUBLE) / len(words)
               ELSE 0.0 END) >= {CF_MIN_MWL}
          AND (CASE WHEN len(words) > 0
               THEN CAST(list_sum(list_transform(words, x -> length(x))) AS DOUBLE) / len(words)
               ELSE 0.0 END) <= {CF_MAX_MWL}) AS q_keep
  FROM w
),
qs AS (SELECT doc_id, source, text FROM q WHERE q_keep),
e AS (SELECT doc_id, source, text, md5(text) AS dig FROM qs),
emin AS (SELECT dig, min(doc_id) AS keep_id FROM e GROUP BY dig),
es AS (SELECT e.doc_id, e.source, e.text FROM e JOIN emin
       ON e.dig = emin.dig AND e.doc_id = emin.keep_id),
toks AS (SELECT doc_id, {DUCK_TOKS} AS toks FROM es),
shl AS (SELECT doc_id, {DUCK_SHINGLES} AS sh FROM toks),
sigs AS (SELECT doc_id, {mh_cols} FROM shl),
buckets AS (
{band_unions}
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM buckets a JOIN buckets b ON a.band = b.band AND a.bh = b.bh
  WHERE a.doc_id < b.doc_id
),
verified AS (
  SELECT p.id_a, p.id_b
  FROM cand p
  JOIN shl a ON p.id_a = a.doc_id
  JOIN shl b ON p.id_b = b.doc_id
  WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        / CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE) >= {CF_JACCARD}
),
edges AS (SELECT id_a AS src, id_b AS dst FROM verified
          UNION SELECT id_b, id_a FROM verified),
reach(id, lbl) AS (
  SELECT doc_id, doc_id FROM es
  UNION
  SELECT e2.dst, r.lbl FROM reach r JOIN edges e2 ON e2.src = r.id
),
clusters AS (SELECT id AS doc_id, min(lbl) AS cluster_id FROM reach GROUP BY id),
nd AS (SELECT es.doc_id, es.source,
              (c.cluster_id = es.doc_id) AS nd_keep
       FROM es JOIN clusters c ON es.doc_id = c.doc_id),
ns AS (SELECT doc_id, source FROM nd WHERE nd_keep),
counts AS (SELECT source, count(*) AS n FROM ns GROUP BY source),
tot AS (SELECT sum(CAST(round(sqrt(CAST(n AS DOUBLE)), 6) AS DECIMAL(28,6))) AS wsum,
               sum(n) AS ntot FROM counts),
rates AS (
  SELECT c.source,
         round(least(1.0,
               {CF_TARGET_FRAC} * t.ntot
               * CAST(CAST(round(sqrt(CAST(c.n AS DOUBLE)), 6) AS DECIMAL(28,6)) AS DOUBLE)
               / CAST(t.wsum AS DOUBLE) / c.n), 6) AS rate
  FROM counts c CROSS JOIN tot t
),
coin AS (
  SELECT ns.doc_id, ns.source,
         CAST({u6} AS BIGINT) AS uval,
         ((strpos('{_HEX}', substr(md5(CAST(doc_id AS VARCHAR)), 7, 1)) - 1) * 16
          + (strpos('{_HEX}', substr(md5(CAST(doc_id AS VARCHAR)), 8, 1)) - 1)) % {CF_SHARDS}
           AS bucket
  FROM ns
),
sampled AS (
  SELECT c.doc_id,
         c.uval < CAST(floor(r.rate * {_SCALE}) AS BIGINT) AS accepted,
         c.bucket
  FROM coin c JOIN rates r ON c.source = r.source
)
SELECT q.doc_id, q.source, q.q_keep,
       es.doc_id IS NOT NULL AS exact_keep,
       coalesce(nd.nd_keep, FALSE) AS nd_keep,
       coalesce(s.accepted, FALSE) AS accepted,
       CASE WHEN coalesce(s.accepted, FALSE) THEN CAST(s.bucket AS INT) END AS shard
FROM q
LEFT JOIN es ON q.doc_id = es.doc_id
LEFT JOIN nd ON q.doc_id = nd.doc_id
LEFT JOIN sampled s ON q.doc_id = s.doc_id
"""


@register("curation_funnel", oracle=_cf_oracle())
def curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The WHOLE curation pipeline as one declarative plan — the
    composition a real training-data run executes, with one row per
    input document recording how far it survived the funnel:

      quality gate (word count + mean word length)
        -> exact dedup (md5 digest, keep lowest doc_id)
        -> near-dup dedup (MinHash -> LSH bands -> exact-Jaccard verify
           -> connected components, keep the cluster representative)
        -> temperature sampling (sqrt-reweighted per-source acceptance)
        -> shard assignment (md5 bucket, accepted docs only)

    Every stage reuses the individually-oracled operators; the single
    end-to-end oracle catches composition drift the per-stage gates
    cannot (a survivor-set off by one doc shifts every downstream
    count, rate, and coin). Scale shape: the funnel inherits each
    stage's shape — pushed-down scans, digest/LSH-bucket equi-joins
    (never all-pairs), broadcast-sized rate/count tables, and a final
    broadcast join of tiny flag frames back to the corpus scan. The
    source-weight sum rides DECIMAL(28,6) (the dsir/PQ idiom) so the
    temperature rates are order-independent and engine-exact."""
    from pyspark.sql import Window

    from ..operators.dedup import connected_components, near_dup_pairs

    docs = t(spark, sf_dir, "documents").select("doc_id", "source", "text")
    words = F.filter(F.split(F.col("text"), _CF_WS), lambda x: x != "")
    n_words = F.size(words)
    tot_chars = F.aggregate(
        F.transform(words, lambda x: F.length(x)), F.lit(0), lambda a, v: a + v
    )
    mwl = F.when(n_words > 0, tot_chars.cast("double") / n_words).otherwise(F.lit(0.0))
    q = docs.select(
        "doc_id",
        "source",
        "text",
        (
            (n_words >= CF_MIN_WORDS)
            & (n_words <= CF_MAX_WORDS)
            & (mwl >= CF_MIN_MWL)
            & (mwl <= CF_MAX_MWL)
        ).alias("q_keep"),
    )
    # r12 (guide §2.4/§3.3): the funnel's two reused stage outputs were
    # recomputed per consumer — the r12 before-plan scans documents 12
    # times (the quality gate's word-split aggregate re-evaluated each
    # time, and the exact-dedup window re-run for each of es' FOUR
    # consumers: shingling, components, nd flags, final join). Pin the
    # slim flag frame (the final join needs no text) and the exact-dedup
    # survivor set once each; documents is now scanned exactly twice. At
    # 100 TB these are the once-per-snapshot materializations a real
    # funnel persists between stages.
    qflags = q.select("doc_id", "source", "q_keep").localCheckpoint(eager=True)
    qs = q.filter("q_keep")
    e = qs.withColumn("dig", F.md5(F.encode(F.col("text"), "UTF-8")))
    es = (
        e.withColumn("__min", F.min("doc_id").over(Window.partitionBy("dig")))
        .filter(F.col("doc_id") == F.col("__min"))
        .select("doc_id", "source", "text")
        .localCheckpoint(eager=True)
    )
    edges = near_dup_pairs(
        es, threshold=CF_JACCARD, num_hashes=NUM_HASHES, bands=BANDS, shingle_n=3
    ).select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    cc = connected_components(es.select("doc_id"), edges, id_col="doc_id")
    nd = es.join(cc, "doc_id").select(
        "doc_id", "source", (F.col("doc_id") == F.col("cluster_id")).alias("nd_keep")
    )
    ns = nd.filter("nd_keep").select("doc_id", "source")

    counts = ns.groupBy("source").agg(F.count("*").alias("n"))
    w6 = F.round(F.sqrt(F.col("n").cast("double")), 6).cast("decimal(28,6)")
    tot = counts.agg(F.sum(w6).alias("wsum"), F.sum("n").alias("ntot"))
    rates = counts.crossJoin(F.broadcast(tot)).select(
        "source",
        F.round(
            F.least(
                F.lit(1.0),
                F.lit(CF_TARGET_FRAC)
                * F.col("ntot")
                * w6.cast("double")
                / F.col("wsum").cast("double")
                / F.col("n"),
            ),
            6,
        ).alias("rate"),
    )
    coin = ns.withColumn(
        "__key", F.md5(F.encode(F.col("doc_id").cast("string"), "UTF-8"))
    )

    def hexv(i: int):
        return F.expr(f"CAST(locate(substr(__key, {i}, 1), '{_HEX}') - 1 AS BIGINT)")

    uval = sum(hexv(i + 1) * F.lit(16 ** (5 - i)) for i in range(6))
    bucket = ((hexv(7) * 16 + hexv(8)) % CF_SHARDS).cast("int")
    sampled = (
        coin.join(F.broadcast(rates), "source")
        .select(
            "doc_id",
            (uval < F.floor(F.col("rate") * _SCALE).cast("long")).alias("accepted"),
            bucket.alias("bucket"),
        )
    )
    return (
        qflags
        .join(es.select("doc_id", F.lit(True).alias("__e")), "doc_id", "left")
        .join(nd.select("doc_id", "nd_keep"), "doc_id", "left")
        .join(sampled, "doc_id", "left")
        .select(
            "doc_id",
            "source",
            "q_keep",
            F.col("__e").isNotNull().alias("exact_keep"),
            F.coalesce("nd_keep", F.lit(False)).alias("nd_keep"),
            F.coalesce("accepted", F.lit(False)).alias("accepted"),
            F.when(F.coalesce("accepted", F.lit(False)), F.col("bucket")).alias("shard"),
        )
    )
