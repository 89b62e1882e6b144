"""Text-analysis queries over the documents table.

Oracle mirrors are generated from the same constants
(functions/text.py LANG_STOPWORDS) so the two engines cannot drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import (
    LANG_STOPWORDS,
    fingerprint_expr,
    lang_id_expr,
    mean_word_len_expr,
    min_shingle_fingerprint_expr,
    punct_ratio_expr,
    quality_score_expr,
    stopword_ratio_expr,
    token_count_expr,
    tokens_expr,
)
from .base import register, t

TOKEN_SPLIT_RE = r"[^a-z0-9À-ɏ一-鿿]+"

# DuckDB token list expression over a column named `text`
DUCK_TOKS = (
    "list_filter(string_split_regex(lower(text), '" + TOKEN_SPLIT_RE + "'), x -> x <> '')"
)


def _stops_sql(lang: str) -> str:
    return "[" + ", ".join(f"'{s}'" for s in LANG_STOPWORDS[lang]) + "]"


@register(
    "doc_token_count",
    oracle=f"""
SELECT doc_id, CAST(len({DUCK_TOKS}) AS BIGINT) AS n_tokens
FROM documents
""",
)
def doc_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    return docs.select("doc_id", token_count_expr(F.col("text")).cast("long").alias("n_tokens"))


@register(
    "doc_quality_features",
    oracle=f"""
WITH feats AS (
  SELECT doc_id,
         {DUCK_TOKS} AS toks,
         CAST(length(text) AS BIGINT) AS n_chars_actual,
         CASE WHEN length(text) > 0
              THEN CAST(length(text) - length(regexp_replace(text, '[!-/:-@\\[-`{{-~]', '', 'g')) AS DOUBLE)
                   / CAST(length(text) AS DOUBLE)
              ELSE 0.0 END AS punct_ratio,
         text
  FROM documents
),
feats2 AS (
  SELECT doc_id, n_chars_actual, punct_ratio,
         CASE WHEN len(toks) > 0
              THEN CAST(len(list_filter(toks, x -> list_contains({_stops_sql('en')}, x))) AS DOUBLE)
                   / CAST(len(toks) AS DOUBLE)
              ELSE 0.0 END AS stopword_ratio,
         CASE WHEN len(toks) > 0
              THEN CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE)
                   / CAST(len(toks) AS DOUBLE)
              ELSE 0.0 END AS mean_word_len
  FROM feats
)
SELECT doc_id, n_chars_actual, round(punct_ratio, 6) AS punct_ratio,
       round(stopword_ratio, 6) AS stopword_ratio,
       round(mean_word_len, 6) AS mean_word_len
FROM feats2
""",
)
def doc_quality_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.length("text").cast("long").alias("n_chars_actual"),
        F.round(punct_ratio_expr(F.col("text")), 6).alias("punct_ratio"),
        F.round(stopword_ratio_expr(F.col("text")), 6).alias("stopword_ratio"),
        F.round(mean_word_len_expr(F.col("text")), 6).alias("mean_word_len"),
    )


# quality CTEs + final scalar, shared verbatim by every oracle needing the
# quality score (doc_quality_score here, near_dup_keep_best in dedupq) so
# the engines — and the queries — cannot drift
QUALITY_CTES = f"""feats AS (
  SELECT doc_id,
         {DUCK_TOKS} AS toks,
         CASE WHEN length(text) > 0
              THEN CAST(length(text) - length(regexp_replace(text, '[!-/:-@\\[-`{{-~]', '', 'g')) AS DOUBLE)
                   / CAST(length(text) AS DOUBLE)
              ELSE 0.0 END AS punct_ratio
  FROM documents
),
parts AS (
  SELECT doc_id,
         least(CAST(len(toks) AS DOUBLE) / 20.0, 1.0) AS len_score,
         greatest(1.0 - punct_ratio * 4, 0.0) AS punct_pen,
         least(CASE WHEN len(toks) > 0
                    THEN CAST(len(list_filter(toks, x -> list_contains({_stops_sql('en')}, x))) AS DOUBLE)
                         / CAST(len(toks) AS DOUBLE)
                    ELSE 0.0 END * 5, 1.0) AS stop_score,
         CASE WHEN len(toks) > 0
              THEN CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE)
                   / CAST(len(toks) AS DOUBLE)
              ELSE 0.0 END AS mwl
  FROM feats
)"""

QUALITY_SELECT = (
    "round(len_score * punct_pen * (0.5 + stop_score / 2) "
    "* (CASE WHEN mwl >= 2.0 AND mwl <= 12.0 THEN 1.0 ELSE 0.5 END), 6)"
)


@register(
    "doc_quality_score",
    oracle=f"""
WITH {QUALITY_CTES}
SELECT doc_id, {QUALITY_SELECT} AS quality
FROM parts
""",
)
def doc_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    return docs.select("doc_id", quality_score_expr(F.col("text")).alias("quality"))


def _lang_id_sql() -> str:
    score = lambda lang: (
        f"len(list_filter(toks, x -> list_contains({_stops_sql(lang)}, x)))"
    )
    return f"""
WITH sc AS (
  SELECT doc_id, lang AS labeled_lang,
         {score('en')} AS s_en, {score('de')} AS s_de,
         {score('es')} AS s_es, {score('fr')} AS s_fr
  FROM (SELECT doc_id, lang, {DUCK_TOKS} AS toks FROM documents) d
)
SELECT doc_id, labeled_lang,
       CASE WHEN greatest(s_en, s_de, s_es, s_fr) = 0 THEN 'und'
            WHEN s_en = greatest(s_en, s_de, s_es, s_fr) THEN 'en'
            WHEN s_de = greatest(s_en, s_de, s_es, s_fr) THEN 'de'
            WHEN s_es = greatest(s_en, s_de, s_es, s_fr) THEN 'es'
            ELSE 'fr' END AS detected_lang
FROM sc
"""


def _lang_id_ngram_sql() -> str:
    from ..functions.lang import detect_lang_oracle_sql

    return f"""
WITH {detect_lang_oracle_sql(table='documents').strip()}
SELECT d.doc_id, docs.lang AS labeled_lang, d.detected_lang
FROM detected d JOIN documents docs ON d.doc_id = docs.doc_id
"""


@register("doc_lang_id", oracle=_lang_id_ngram_sql())
def doc_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-n-gram + Unicode-script language ID
    (TikaCallable.java:241-269 cascade; profile table is data, not code
    — functions/lang.py). Script classes (zh/ja/ko/ru/ar/fa/he/th/hi/el)
    resolve by one regexp_count each; Latin text goes through a
    broadcast trigram-profile join + max(struct) argmax. The old
    stopword argmax (lang_id_expr) remains as the cheap inline variant."""
    from ..functions.lang import detect_lang

    docs = t(spark, sf_dir, "documents")
    det = detect_lang(docs)
    return (
        det.join(docs.select("doc_id", F.col("lang").alias("labeled_lang")), "doc_id")
        .select("doc_id", "labeled_lang", "detected_lang")
    )


@register(
    "doc_filter_pipeline",
    oracle=f"""
WITH feats AS (
  SELECT doc_id,
         {DUCK_TOKS} AS toks,
         CASE WHEN length(text) > 0
              THEN CAST(length(text) - length(regexp_replace(text, '[!-/:-@\\[-`{{-~]', '', 'g')) AS DOUBLE)
                   / CAST(length(text) AS DOUBLE)
              ELSE 0.0 END AS punct_ratio
  FROM documents
),
parts AS (
  SELECT doc_id, len(toks) AS n_tokens,
         least(CAST(len(toks) AS DOUBLE) / 20.0, 1.0)
           * greatest(1.0 - punct_ratio * 4, 0.0)
           * (0.5 + least(CASE WHEN len(toks) > 0
                    THEN CAST(len(list_filter(toks, x -> list_contains({_stops_sql('en')}, x))) AS DOUBLE)
                         / CAST(len(toks) AS DOUBLE)
                    ELSE 0.0 END * 5, 1.0) / 2)
           * (CASE WHEN len(toks) > 0
                   AND CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE)
                       / CAST(len(toks) AS DOUBLE) BETWEEN 2.0 AND 12.0
                   THEN 1.0 ELSE 0.5 END) AS quality
  FROM feats
)
SELECT doc_id,
       (n_tokens >= 10 AND quality >= 0.3) AS keep,
       CASE WHEN n_tokens < 10 THEN 'too_short'
            WHEN quality < 0.3 THEN 'low_quality'
            ELSE 'ok' END AS reason
FROM parts
""",
)
def doc_filter_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The training-data keep/drop decision: min token count + quality
    threshold, with a reason column for filter-rate accounting — the
    standard corpus-curation gate, expressed as one projection."""
    docs = t(spark, sf_dir, "documents")
    n_tokens = token_count_expr(F.col("text"))
    quality = quality_score_expr(F.col("text"))
    return docs.select(
        "doc_id",
        ((n_tokens >= 10) & (quality >= 0.3)).alias("keep"),
        F.when(n_tokens < 10, "too_short")
        .when(quality < 0.3, "low_quality")
        .otherwise("ok")
        .alias("reason"),
    )


@register(
    "corpus_token_stats",
    oracle=f"""
WITH toks AS (SELECT doc_id, unnest({DUCK_TOKS}) AS tok FROM documents)
SELECT CAST(count(*) AS BIGINT) AS total_tokens,
       CAST(count(DISTINCT tok) AS BIGINT) AS distinct_tokens,
       round(CAST(count(*) AS DOUBLE) / (SELECT count(*) FROM documents), 6) AS tokens_per_doc
FROM toks
""",
)
def corpus_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level token accounting (the 'how big is this dataset in
    tokens' question): explode once, aggregate counts + distinct."""
    docs = t(spark, sf_dir, "documents")
    n_docs = docs.count()
    toks = docs.select(F.explode(tokens_expr(F.col("text"))).alias("tok"))
    return toks.agg(
        F.count(F.lit(1)).alias("total_tokens"),
        F.countDistinct("tok").alias("distinct_tokens"),
        F.round(F.count(F.lit(1)) / F.lit(n_docs), 6).alias("tokens_per_doc"),
    )


@register(
    "doc_fingerprint",
    oracle=f"""
WITH toks AS (SELECT doc_id, {DUCK_TOKS} AS toks FROM documents)
SELECT doc_id,
       md5(array_to_string(toks, ' ')) AS fingerprint,
       list_min(list_transform(generate_series(1, greatest(len(toks) - 4, 1)),
                               i -> md5(array_to_string(toks[i:i+4], ' ')))) AS min_shingle_fp
FROM toks
""",
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace-insensitive content digest + winnowing-lite min-shingle
    fingerprint (rolling-hash document signature)."""
    docs = t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        fingerprint_expr(F.col("text")).alias("fingerprint"),
        min_shingle_fingerprint_expr(F.col("text"), 5).alias("min_shingle_fp"),
    )


@register(
    "tfidf_top_terms",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, unnest({DUCK_TOKS}) AS tok FROM documents
),
tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY doc_id, tok),
df AS (SELECT tok, count(DISTINCT doc_id) AS df FROM toks GROUP BY tok),
n AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.tok, tf.tf,
         round(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df), 6) AS tfidf
  FROM tf JOIN df ON tf.tok = df.tok CROSS JOIN n
)
SELECT doc_id, tok, CAST(tf AS BIGINT) AS tf, tfidf
FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
                                   ORDER BY tfidf DESC, tok ASC) AS rn
      FROM scored) x
WHERE rn <= 5
""",
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF top-5 terms per document — the classic training-corpus
    relevance feature, pure DataFrame ops: explode -> two aggregations
    (term frequency per doc, document frequency per term) -> broadcast
    the tiny df/N side -> window top-k. Ranking happens on the ROUNDED
    score (then term asc) so 1-ulp ln() differences between engines can
    never flip the top-k cut.
    """
    from ..operators import ensure_parallelism

    docs = t(spark, sf_dir, "documents")
    # r12 (guide §2.5): tokenize+explode+partial-agg ran on the scan's one
    # task (single-row-group corpus); spread it (no-op on wide inputs)
    toks = ensure_parallelism(docs).select(
        "doc_id", F.explode(tokens_expr(F.col("text"))).alias("tok")
    )
    tf = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    df = toks.groupBy("tok").agg(F.countDistinct("doc_id").alias("df"))
    n_docs = docs.count()
    scored = tf.join(F.broadcast(df), "tok").select(
        "doc_id",
        "tok",
        "tf",
        F.round(
            F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 6
        ).alias("tfidf"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("tok").asc())
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("doc_id", "tok", F.col("tf").cast("bigint").alias("tf"), "tfidf")
    )


# ---------------------------------------------------------------------------
# Collocation mining: top bigrams by lift (PMI's ratio without the log, so
# the score is double arithmetic on exact integer counts — bit-identical
# across engines). Tokens are filtered then re-paired by lead() over the
# original split position, so punctuation-separated words still form a
# bigram (the usual collocation convention).


@register(
    "bigram_lift_top100",
    oracle=f"""
WITH raw AS (
  SELECT doc_id,
         unnest(string_split_regex(lower(text), '{TOKEN_SPLIT_RE}')) AS tok,
         generate_subscripts(string_split_regex(lower(text), '{TOKEN_SPLIT_RE}'), 1) AS pos
  FROM documents
),
tk AS (SELECT doc_id, pos, tok FROM raw WHERE tok <> ''),
bg AS (SELECT tok AS x, lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS y FROM tk),
b AS (SELECT x, y FROM bg WHERE y IS NOT NULL),
tot AS (SELECT count(*) AS nb FROM b),
bc AS (SELECT x, y, CAST(count(*) AS BIGINT) AS n_xy FROM b GROUP BY x, y),
xc AS (SELECT x, CAST(count(*) AS BIGINT) AS n_x FROM b GROUP BY x),
yc AS (SELECT y, CAST(count(*) AS BIGINT) AS n_y FROM b GROUP BY y)
SELECT x, y, n_xy, n_x, n_y,
       CAST(n_xy AS DOUBLE) * (SELECT nb FROM tot) / (n_x * n_y) AS lift
FROM bc JOIN xc USING (x) JOIN yc USING (y)
WHERE n_xy >= 5
ORDER BY lift DESC, n_xy DESC, x, y
LIMIT 100
""",
)
def bigram_lift_top100(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-100 collocations by lift = p(xy)/(p(x)p(y)) over the corpus.

    tokenize (JVM split, same regex as the oracle) -> posexplode ->
    lead() per doc -> three partial-aggregating counts (bigram, left
    marginal, right marginal) -> two broadcast joins (marginals are
    vocabulary-sized, tiny next to the bigram table) -> global top-k via
    TakeOrderedAndProject. All counts partial-aggregate map-side; the
    only wide shuffle is the per-doc lead() window, which at 100 TB is
    partitioned by doc_id and never global. Deterministic tie-break
    (lift desc, n_xy desc, x, y) keeps the top-100 set engine-stable."""
    from ..operators import ensure_parallelism

    # r12 (guide §2.4/§2.5): consecutive pairs built IN-ARRAY from the
    # filtered token array — pairing after the empty-token filter is
    # exactly what lead()-over-original-position computed, but map-only:
    # the per-doc window shuffle+sort is gone entirely (at 100 TB that
    # was the query's only wide pass over token rows). The pair table is
    # pinned once (four consumers); the total-bigram count folds into
    # the plan as a broadcast scalar instead of a separate driver count
    # action. Counts are exact integers, the lift expression keeps the
    # identical cast structure — bit-identical output.
    docs = ensure_parallelism(
        t(spark, sf_dir, "documents").select("doc_id", "text")
    )
    arr = f"filter(split(lower(text), '{TOKEN_SPLIT_RE}'), t -> t <> '')"
    b = (
        docs.selectExpr(f"{arr} AS a")
        .where(F.expr("size(a) >= 2"))
        .selectExpr(
            "explode(transform(sequence(1, size(a) - 1),"
            " i -> struct(element_at(a, i) AS x, element_at(a, i + 1) AS y))) AS p"
        )
        .select("p.x", "p.y")
        .localCheckpoint(eager=True)
    )
    nbt = b.agg(F.count(F.lit(1)).alias("nb"))
    bc = b.groupBy("x", "y").agg(F.count(F.lit(1)).alias("n_xy"))
    xc = b.groupBy("x").agg(F.count(F.lit(1)).alias("n_x"))
    yc = b.groupBy("y").agg(F.count(F.lit(1)).alias("n_y"))
    out = (
        bc.filter(F.col("n_xy") >= 5)
        .join(F.broadcast(xc), "x")
        .join(F.broadcast(yc), "y")
        .crossJoin(F.broadcast(nbt))
        .select(
            "x",
            "y",
            "n_xy",
            "n_x",
            "n_y",
            (F.col("n_xy").cast("double") * F.col("nb") / (F.col("n_x") * F.col("n_y"))).alias("lift"),
        )
        .orderBy(F.desc("lift"), F.desc("n_xy"), "x", "y")
        .limit(100)
    )
    return out
