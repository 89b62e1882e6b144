"""Training-data pipeline operators, wave 2: the curation stages a
100 TB corpus pipeline runs between crawl and tokenizer.

Beyond-reference extensions (the reference stops at parse + TSV export,
``CrawlTopologyBuilder.java:455-463``); all four are pure JVM-side
column/aggregate plans with exact DuckDB oracles:

  * doc_repetition_filter — Gopher-style repetition quality gates
    (type-token ratio, top-bigram / top-trigram mass) computed with two
    map-side-combinable aggregations; no per-row Python.
  * doc_pii_redact — regex PII scrubbing (emails, IPv4s) with match
    counts; redaction is regexp_replace, the 100 TB-safe path.
  * doc_chunk_sliding — sliding token-window chunking (W=64, S=48), the
    tokenize-ready shape; array slice + posexplode, one shuffle-free
    projection per chunk.
  * benchmark_contamination — exact n-gram overlap screen against a
    held-out benchmark set (the GPT-3/FLAN decontamination shape):
    distinct doc 8-grams equi-joined to a broadcast benchmark-gram set.

Scale notes: repetition + contamination shuffle only (doc_id, gram)
pairs; chunking emits O(n/S) rows per doc with no shuffle at all; the
benchmark gram set is smallest-side broadcast. Skewed grams (stop-word
runs) cap out at the distinct() before the join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import tokens_expr
from .base import register, t
from .textops import DUCK_TOKS

# --------------------------------------------------------------------------
# doc_repetition_filter
# --------------------------------------------------------------------------

# Gopher (Rae et al. 2021, public) repetition thresholds, loosened for the
# synthetic corpus: reject if top bigram mass > 0.18 or top trigram > 0.16.
TOP_BIGRAM_MAX = 0.18
TOP_TRIGRAM_MAX = 0.16


def _ngram_expr(toks, n: int):
    idx = F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(0)))
    return F.transform(
        idx, lambda i: F.concat_ws(" ", *[F.element_at(toks, i + k) for k in range(n)])
    )


def _duck_ngrams(toks: str, n: int) -> str:
    parts = " || ' ' || ".join(f"{toks}[i + {k}]" for k in range(n))
    return (
        f"list_transform(generate_series(1, greatest(len({toks}) - {n - 1}, 0)),"
        f" i -> {parts})"
    )


@register(
    "doc_repetition_filter",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, {DUCK_TOKS} AS tk FROM documents
),
grams AS (
  SELECT doc_id, len(tk) AS n_tokens, len(list_distinct(tk)) AS n_distinct,
         {_duck_ngrams('tk', 2)} AS bg, {_duck_ngrams('tk', 3)} AS tg
  FROM toks
),
bgc AS (
  SELECT doc_id, g AS gram, count(*) AS c
  FROM (SELECT doc_id, unnest(bg) AS g FROM grams) GROUP BY 1, 2
),
tgc AS (
  SELECT doc_id, g AS gram, count(*) AS c
  FROM (SELECT doc_id, unnest(tg) AS g FROM grams) GROUP BY 1, 2
),
btop AS (SELECT doc_id, max(c) AS top_c, sum(c) AS tot FROM bgc GROUP BY 1),
ttop AS (SELECT doc_id, max(c) AS top_c, sum(c) AS tot FROM tgc GROUP BY 1)
SELECT g.doc_id,
       g.n_tokens,
       round(CAST(g.n_distinct AS DOUBLE) / greatest(g.n_tokens, 1), 6) AS distinct_frac,
       round(coalesce(CAST(b.top_c AS DOUBLE) / b.tot, 0.0), 6) AS top_bigram_frac,
       round(coalesce(CAST(tt.top_c AS DOUBLE) / tt.tot, 0.0), 6) AS top_trigram_frac,
       (coalesce(CAST(b.top_c AS DOUBLE) / b.tot, 0.0) <= {TOP_BIGRAM_MAX}
        AND coalesce(CAST(tt.top_c AS DOUBLE) / tt.tot, 0.0) <= {TOP_TRIGRAM_MAX})
         AS keep
FROM grams g
LEFT JOIN btop b USING (doc_id)
LEFT JOIN ttop tt USING (doc_id)
""",
)
def doc_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition quality gates: a doc dominated by one repeated bigram/
    trigram is boilerplate or spam. Two (doc, gram) aggregations with
    map-side partial max/sum — the scan never re-reads text."""
    docs = t(spark, sf_dir, "documents").select(
        "doc_id", tokens_expr(F.col("text")).alias("tk")
    )
    grams = docs.select(
        "doc_id",
        F.size("tk").alias("n_tokens"),
        F.size(F.array_distinct("tk")).alias("n_distinct"),
        _ngram_expr(F.col("tk"), 2).alias("bg"),
        _ngram_expr(F.col("tk"), 3).alias("tg"),
    ).localCheckpoint(eager=True)  # feeds 3 consumers; freed on GC

    def top_mass(col: str, alias: str) -> DataFrame:
        per = (
            grams.select("doc_id", F.explode(col).alias("g"))
            .groupBy("doc_id", "g")
            .agg(F.count("*").alias("c"))
        )
        return per.groupBy("doc_id").agg(
            (F.max("c").cast("double") / F.sum("c")).alias(alias)
        )

    b = top_mass("bg", "bf")
    tt = top_mass("tg", "tf")
    out = (
        grams.select("doc_id", "n_tokens", "n_distinct")
        .join(b, "doc_id", "left")
        .join(tt, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.round(
                F.col("n_distinct").cast("double") / F.greatest("n_tokens", F.lit(1)), 6
            ).alias("distinct_frac"),
            F.round(F.coalesce("bf", F.lit(0.0)), 6).alias("top_bigram_frac"),
            F.round(F.coalesce("tf", F.lit(0.0)), 6).alias("top_trigram_frac"),
            (
                (F.coalesce("bf", F.lit(0.0)) <= TOP_BIGRAM_MAX)
                & (F.coalesce("tf", F.lit(0.0)) <= TOP_TRIGRAM_MAX)
            ).alias("keep"),
        )
    )
    return out


# --------------------------------------------------------------------------
# doc_pii_redact
# --------------------------------------------------------------------------

EMAIL_RE = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
IPV4_RE = r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}"

# Deterministic PII augmentation so both engines see identical inputs (the
# synthetic corpus itself is PII-free): every 2nd doc gains an email, every
# 3rd an IPv4.
_AUG_SQL = """
aug AS (
  SELECT doc_id,
         text
         || CASE WHEN doc_id % 2 = 0
                 THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
                 ELSE '' END
         || CASE WHEN doc_id % 3 = 0
                 THEN ' from 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.'
                      || CAST(doc_id % 100 AS VARCHAR)
                 ELSE '' END AS txt
  FROM documents
)
"""


@register(
    "doc_pii_redact",
    oracle=f"""
WITH {_AUG_SQL.strip()}
SELECT doc_id,
       len(regexp_extract_all(txt, '{EMAIL_RE}')) AS n_emails,
       len(regexp_extract_all(txt, '{IPV4_RE}')) AS n_ips,
       md5(regexp_replace(regexp_replace(txt, '{EMAIL_RE}', '<EMAIL>', 'g'),
                          '{IPV4_RE}', '<IP>', 'g')) AS redacted_md5
FROM aug
""",
)
def doc_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub: count + redact emails/IPv4s via regexp_replace (codegen,
    no UDF). The md5 of the redacted text value-checks the full rewrite
    without hauling megabyte strings through the compare."""
    did = F.col("doc_id")
    txt = F.concat(
        F.col("text"),
        F.when(
            did % 2 == 0,
            F.concat(F.lit(" contact user"), did.cast("string"), F.lit("@example.com")),
        ).otherwise(F.lit("")),
        F.when(
            did % 3 == 0,
            F.concat(
                F.lit(" from 10."),
                (did % 256).cast("string"),
                F.lit(".0."),
                (did % 100).cast("string"),
            ),
        ).otherwise(F.lit("")),
    )
    aug = t(spark, sf_dir, "documents").select("doc_id", txt.alias("txt"))
    return aug.select(
        "doc_id",
        F.regexp_count(F.col("txt"), F.lit(EMAIL_RE)).cast("long").alias("n_emails"),
        F.regexp_count(F.col("txt"), F.lit(IPV4_RE)).cast("long").alias("n_ips"),
        F.md5(
            F.encode(
                F.regexp_replace(
                    F.regexp_replace(F.col("txt"), EMAIL_RE, "<EMAIL>"),
                    IPV4_RE,
                    "<IP>",
                ),
                "UTF-8",
            )
        ).alias("redacted_md5"),
    )


# --------------------------------------------------------------------------
# doc_chunk_sliding
# --------------------------------------------------------------------------

CHUNK_W = 64
CHUNK_S = 48


@register(
    "doc_chunk_sliding",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, {DUCK_TOKS} AS tk FROM documents
),
chunks AS (
  SELECT doc_id,
         s AS chunk_start,
         list_slice(tk, s, s + {CHUNK_W} - 1) AS chunk
  FROM (SELECT doc_id, tk, unnest(generate_series(1, greatest(len(tk), 1), {CHUNK_S}))
               AS s
        FROM toks)
)
SELECT doc_id, chunk_start, len(chunk) AS chunk_len,
       md5(list_aggregate(chunk, 'string_agg', ' ')) AS chunk_md5
FROM chunks
WHERE len(chunk) > 0
""",
)
def doc_chunk_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window chunking (window {CHUNK_W}, stride {CHUNK_S}) into
    tokenizer-ready pieces. Pure array ops + explode: zero shuffle, and
    chunk rows inherit the scan's partitioning — at 100 TB this is a
    map-only stage."""
    docs = t(spark, sf_dir, "documents").select(
        "doc_id", tokens_expr(F.col("text")).alias("tk")
    )
    starts = F.sequence(
        F.lit(1), F.greatest(F.size("tk"), F.lit(1)), F.lit(CHUNK_S)
    )
    exploded = docs.select(
        "doc_id", "tk", F.explode(starts).alias("chunk_start")
    ).select(
        "doc_id",
        "chunk_start",
        F.slice(F.col("tk"), F.col("chunk_start"), F.lit(CHUNK_W)).alias("chunk"),
    )
    return (
        exploded.filter(F.size("chunk") > 0)
        .select(
            "doc_id",
            "chunk_start",
            F.size("chunk").alias("chunk_len"),
            F.md5(F.encode(F.concat_ws(" ", F.col("chunk")), "UTF-8")).alias("chunk_md5"),
        )
    )


# --------------------------------------------------------------------------
# benchmark_contamination
# --------------------------------------------------------------------------

CONTAM_N = 8  # 8-gram overlap, the published decontamination shingle size


@register(
    "benchmark_contamination",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, {DUCK_TOKS} AS tk FROM documents
),
grams AS (
  SELECT DISTINCT doc_id, g
  FROM (SELECT doc_id, unnest({_duck_ngrams('tk', CONTAM_N)}) AS g FROM toks)
),
bench AS (
  SELECT DISTINCT g FROM grams WHERE doc_id % 37 = 0
),
hits AS (
  SELECT gr.doc_id, count(*) AS n_shared
  FROM grams gr JOIN bench USING (g)
  WHERE gr.doc_id % 37 <> 0
  GROUP BY 1
)
SELECT t.doc_id,
       coalesce(h.n_shared, 0) AS n_shared_ngrams,
       coalesce(h.n_shared, 0) > 0 AS contaminated
FROM toks t LEFT JOIN hits h USING (doc_id)
WHERE t.doc_id % 37 <> 0
""",
)
def benchmark_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontamination screen: flag training docs sharing any distinct
    {CONTAM_N}-gram with the benchmark set (docs with doc_id % 37 == 0
    stand in for the eval suite). The benchmark gram set is broadcast;
    training grams are distinct()'d before the join so stop-word-run
    skew cannot blow up a task."""
    from ..operators import ensure_parallelism

    # r12 (guide §2.5): the sf documents parquet is ONE file/one row
    # group — without a spread the tokenize+ngram+explode stage (the
    # query's whole cost) runs as a single task; no-op once inputs are
    # multi-file at scale (the stupid_backoff precedent).
    docs = ensure_parallelism(
        t(spark, sf_dir, "documents").select("doc_id", "text")
    ).select("doc_id", tokens_expr(F.col("text")).alias("tk"))
    # bench + train both read grams, but they are branches of ONE plan
    # over the same distinct: ReuseExchange shares the shuffle, so the
    # previous eager localCheckpoint only added a blocking
    # materialization + block-manager round-trip (A/B: 1.5-2.8 s pinned
    # vs 0.65-0.75 s unpinned, identical rows — r12, guide §2.4).
    grams = docs.select(
        "doc_id", F.explode(_ngram_expr(F.col("tk"), CONTAM_N)).alias("g")
    ).distinct()
    bench = grams.filter(F.col("doc_id") % 37 == 0).select("g").distinct()
    train = grams.filter(F.col("doc_id") % 37 != 0)
    hits = (
        train.join(F.broadcast(bench), "g")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_shared"))
    )
    return (
        docs.filter(F.col("doc_id") % 37 != 0)
        .select("doc_id")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_shared", F.lit(0)).alias("n_shared_ngrams"),
            (F.coalesce("n_shared", F.lit(0)) > 0).alias("contaminated"),
        )
    )
