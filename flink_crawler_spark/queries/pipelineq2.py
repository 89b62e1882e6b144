"""Training-data pipeline operators, wave 3: corpus assembly — the
stages between a curated document pool and the tokenizer's input tape.

Beyond-reference extensions (the reference stops at parse + TSV export,
``CrawlTopologyBuilder.java:455-463``); all three are exact-oracled:

  * corpus_mix_budget — domain/source mixing under a per-source token
    budget: deterministic md5-ranked selection with an exclusive running
    token sum, keep while the budget is open (the data-mixing stage every
    pretraining pipeline runs; weights * budget generalises trivially).
  * sequence_pack_chop — GPT-style sequence packing: concatenate all
    docs in a global order and chop every SEQ_LEN tokens; per doc report
    which training sequences it lands in. Implemented as an EXACT
    distributed prefix sum (bucketed two-phase), not a single-partition
    window.
  * segment_boilerplate_filter — CCNet-style repeated-segment removal:
    hash non-overlapping token segments, a segment seen in >= K distinct
    docs is boilerplate; report per-doc boilerplate mass and the md5 of
    the retained text.

Scale notes: mixing shuffles once on (source) for the per-source window
— at 100 TB the same answer comes from a two-pass md5-threshold
(approx-quantile on token counts per source) without any global window;
the per-source window here is exact and already parallel across sources.
Packing's global cumsum is the textbook distributed prefix sum: partial
sums per doc_id-range bucket (one map-side-combined agg), a driver-side
exclusive scan over the TINY bucket-total list (n_docs / BUCKET_SPAN
rows — bounded; make the span scale with n_docs, or add one more level
of hierarchy at extreme scale), broadcast back, then a per-bucket window
— no single-partition stage anywhere. Boilerplate filtering shuffles
(segment) pairs once for the frequency count and once on doc_id for the
rebuild; the boilerplate set is broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.text import tokens_expr
from .base import register, t
from .textops import DUCK_TOKS

# --------------------------------------------------------------------------
# corpus_mix_budget
# --------------------------------------------------------------------------

SOURCE_TOKEN_BUDGET = 1000  # tokens admitted per source


@register(
    "corpus_mix_budget",
    oracle=f"""
WITH d AS (
  SELECT doc_id, source,
         CAST(len({DUCK_TOKS}) AS BIGINT) AS n_tokens,
         md5(CAST(doc_id AS VARCHAR)) AS k
  FROM documents
)
SELECT doc_id, source, n_tokens,
       CAST(coalesce(sum(n_tokens) OVER (PARTITION BY source ORDER BY k, doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            AS BIGINT) AS cum_before,
       coalesce(sum(n_tokens) OVER (PARTITION BY source ORDER BY k, doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         < {SOURCE_TOKEN_BUDGET} AS selected
FROM d
""",
)
def corpus_mix_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-weighted corpus mixing: admit docs per source, in a
    deterministic md5 shuffle order, until that source's token budget is
    spent (first doc over the line is still admitted — budget applies to
    the tokens BEFORE it, the standard greedy-knapsack convention, so
    every source with any data contributes at least one doc).

    One shuffle on source; sources are independent so the window is
    embarrassingly parallel. 100 TB variant: two-pass md5-threshold per
    source (find the cutoff key by accumulating a per-source histogram),
    which drops the window entirely.
    """
    d = t(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.size(tokens_expr(F.col("text"))).cast("long").alias("n_tokens"),
        F.md5(F.encode(F.col("doc_id").cast("string"), "UTF-8")).alias("k"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy("k", "doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return d.select(
        "doc_id",
        "source",
        "n_tokens",
        cum.alias("cum_before"),
        (cum < SOURCE_TOKEN_BUDGET).alias("selected"),
    )


# --------------------------------------------------------------------------
# sequence_pack_chop
# --------------------------------------------------------------------------

SEQ_LEN = 512  # training-sequence length in tokens
BUCKET_SPAN = 64  # doc_ids per prefix-sum bucket


@register(
    "sequence_pack_chop",
    oracle=f"""
WITH d AS (
  SELECT doc_id, CAST(len({DUCK_TOKS}) AS BIGINT) AS n_tokens FROM documents
),
o AS (
  SELECT doc_id, n_tokens,
         CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS tok_offset
  FROM d WHERE n_tokens > 0
)
SELECT doc_id, n_tokens, tok_offset,
       CAST(tok_offset // {SEQ_LEN} AS BIGINT) AS start_seq,
       CAST((tok_offset + n_tokens - 1) // {SEQ_LEN} AS BIGINT) AS end_seq,
       CAST((tok_offset + n_tokens - 1) // {SEQ_LEN}
            - tok_offset // {SEQ_LEN} + 1 AS BIGINT) AS n_seqs
FROM o
""",
)
def sequence_pack_chop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concatenate-and-chop sequence packing: lay all docs on one token
    tape (global doc_id order) and cut every SEQ_LEN tokens; each doc
    reports its byte^Wtoken offset and the [start_seq, end_seq] range it
    spans.

    The global exclusive cumsum is an EXACT two-phase distributed prefix
    sum: (1) per-bucket token totals via one map-side-combined groupBy
    (bucket = doc_id // BUCKET_SPAN, monotone in doc_id so bucket order
    is tape order); (2) driver-side exclusive scan over the bucket
    totals — a bounded small list, the same driver round-trip Spark's
    own RangePartitioner takes; (3) broadcast the bucket offsets back
    and finish with a PER-BUCKET window. No single-partition window
    anywhere, so the plan holds at 100 TB (grow BUCKET_SPAN with corpus
    size, or add a second prefix level).
    """
    d = (
        t(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.size(tokens_expr(F.col("text"))).cast("long").alias("n_tokens"),
        )
        .filter(F.col("n_tokens") > 0)
        .withColumn("bucket", (F.col("doc_id") / BUCKET_SPAN).cast("long"))
    )
    d = d.localCheckpoint(eager=True)  # scanned twice (totals + final); freed on GC

    totals = (
        d.groupBy("bucket").agg(F.sum("n_tokens").alias("tot")).orderBy("bucket").collect()
    )
    offsets, running = [], 0
    for r in totals:
        offsets.append((r["bucket"], running))
        running += r["tot"]
    off_df = spark.createDataFrame(offsets, "bucket long, bucket_offset long")

    w = (
        Window.partitionBy("bucket")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local_cum = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    tok_offset = F.col("bucket_offset") + local_cum
    start_seq = F.floor(tok_offset / SEQ_LEN)
    end_seq = F.floor((tok_offset + F.col("n_tokens") - 1) / SEQ_LEN)
    return (
        d.join(F.broadcast(off_df), "bucket")
        .select(
            "doc_id",
            "n_tokens",
            tok_offset.alias("tok_offset"),
            start_seq.alias("start_seq"),
            end_seq.alias("end_seq"),
            (end_seq - start_seq + 1).alias("n_seqs"),
        )
    )


# --------------------------------------------------------------------------
# segment_boilerplate_filter
# --------------------------------------------------------------------------

SEG_W = 4  # tokens per (non-overlapping) segment
BOILER_K = 2  # segment is boilerplate if seen in >= K distinct docs


@register(
    "segment_boilerplate_filter",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, {DUCK_TOKS} AS tk FROM documents
),
segs AS (
  SELECT doc_id, s,
         list_aggregate(list_slice(tk, s, s + {SEG_W} - 1), 'string_agg', ' ') AS seg
  FROM (SELECT doc_id, tk, unnest(generate_series(1, len(tk), {SEG_W})) AS s
        FROM toks)
  WHERE len(list_slice(tk, s, s + {SEG_W} - 1)) = {SEG_W}
),
boiler AS (
  SELECT seg FROM segs GROUP BY seg HAVING count(DISTINCT doc_id) >= {BOILER_K}
),
marked AS (
  SELECT s.doc_id, s.s, s.seg, b.seg IS NOT NULL AS is_boiler
  FROM segs s LEFT JOIN boiler b USING (seg)
),
per_doc AS (
  SELECT doc_id,
         count(*) AS n_segs,
         CAST(sum(CASE WHEN is_boiler THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler,
         md5(coalesce(string_agg(CASE WHEN NOT is_boiler THEN seg END, ' '
                                 ORDER BY s), '')) AS kept_md5
  FROM marked GROUP BY doc_id
)
SELECT t.doc_id,
       coalesce(p.n_segs, 0) AS n_segs,
       coalesce(p.n_boiler, 0) AS n_boiler,
       round(coalesce(CAST(p.n_boiler AS DOUBLE) / p.n_segs, 0.0), 6)
         AS boiler_frac,
       coalesce(p.kept_md5, md5('')) AS kept_md5
FROM toks t LEFT JOIN per_doc p USING (doc_id)
""",
)
def segment_boilerplate_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeated-segment boilerplate removal (CCNet paragraph-hash shape,
    adapted to the corpus's line-free text): non-overlapping SEG_W-token
    segments; any segment appearing in >= BOILER_K distinct docs is
    boilerplate and dropped; the md5 of the retained, order-preserved
    text value-checks the rewrite.

    Shuffles: one (segment) frequency agg with map-side partial
    count-distinct, one doc_id agg for the rebuild. The boilerplate set
    is broadcast (it is the HEAVY-HITTER tail — tiny by construction
    relative to the corpus). Segment strings could be 64-bit hashed
    before the shuffle at scale; kept as strings here so the oracle
    compares exactly.
    """
    toks = t(spark, sf_dir, "documents").select(
        "doc_id", tokens_expr(F.col("text")).alias("tk")
    )
    starts = F.sequence(F.lit(1), F.greatest(F.size("tk"), F.lit(1)), F.lit(SEG_W))
    segs = (
        toks.select("doc_id", "tk", F.explode(starts).alias("s"))
        .select(
            "doc_id",
            "s",
            F.slice(F.col("tk"), F.col("s"), F.lit(SEG_W)).alias("seg_toks"),
        )
        .filter(F.size("seg_toks") == SEG_W)
        .select("doc_id", "s", F.concat_ws(" ", F.col("seg_toks")).alias("seg"))
    )
    segs = segs.localCheckpoint(eager=True)  # feeds boiler count + rebuild

    boiler = (
        segs.groupBy("seg")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= BOILER_K)
        .select("seg", F.lit(True).alias("is_boiler"))
    )
    marked = segs.join(F.broadcast(boiler), "seg", "left").select(
        "doc_id", "s", "seg", F.coalesce("is_boiler", F.lit(False)).alias("is_boiler")
    )
    kept_sorted = F.transform(
        F.array_sort(
            F.collect_list(
                F.when(~F.col("is_boiler"), F.struct(F.col("s"), F.col("seg")))
            )
        ),
        lambda x: x["seg"],
    )
    per_doc = marked.groupBy("doc_id").agg(
        F.count("*").alias("n_segs"),
        F.sum(F.col("is_boiler").cast("long")).alias("n_boiler"),
        F.md5(F.encode(F.concat_ws(" ", kept_sorted), "UTF-8")).alias("kept_md5"),
    )
    empty_md5 = F.md5(F.encode(F.lit(""), "UTF-8"))
    return (
        toks.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_segs", F.lit(0)).alias("n_segs"),
            F.coalesce("n_boiler", F.lit(0)).alias("n_boiler"),
            F.round(
                F.coalesce(
                    F.col("n_boiler").cast("double") / F.col("n_segs"), F.lit(0.0)
                ),
                6,
            ).alias("boiler_frac"),
            F.coalesce("kept_md5", empty_md5).alias("kept_md5"),
        )
    )


# --------------------------------------------------------------------------
# model_quality_classifier
# --------------------------------------------------------------------------

# fastText-style hashed linear model: each token hashes to a fixed weight
# in [-500, 500] milli-units (derived from its md5 — deterministic in both
# engines, standing in for trained weights); a doc is kept when the summed
# logit is positive. Integer milli-unit arithmetic keeps the whole model
# BIT-EXACT across engines — no float sigmoid needed, since
# sigmoid(x) > 0.5 <=> x > 0.
_W_MILLI_DUCK = "(ascii(substr(md5(x), 1, 1)) * 256 + ascii(substr(md5(x), 2, 1))) % 1001 - 500"


@register(
    "model_quality_classifier",
    oracle=f"""
WITH d AS (
  SELECT doc_id, {DUCK_TOKS} AS tk FROM documents
)
SELECT doc_id,
       CAST(len(tk) AS BIGINT) AS n_tokens,
       CAST(coalesce(list_sum(list_transform(tk, x -> {_W_MILLI_DUCK})), 0)
            AS BIGINT) AS logit_milli,
       coalesce(list_sum(list_transform(tk, x -> {_W_MILLI_DUCK})), 0) > 0
         AS keep
FROM d
""",
)
def model_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality gate (fastText linear-classifier shape):
    hash each token to a fixed weight, fold the weights with an array
    HOF, keep docs with positive summed logit. ZERO shuffles — the
    entire classifier is one codegen'd projection, which is exactly how
    a hashed linear scorer should run at 100 TB (a real weight table
    would be a broadcast map lookup in the same fold)."""

    def w_milli(x):
        h = F.md5(F.encode(x, "UTF-8"))
        return (
            F.ascii(F.substring(h, 1, 1)) * 256 + F.ascii(F.substring(h, 2, 1))
        ) % 1001 - 500

    tk = tokens_expr(F.col("text"))
    logit = F.aggregate(
        tk, F.lit(0).cast("long"), lambda acc, x: acc + w_milli(x).cast("long")
    )
    return t(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(tk).cast("long").alias("n_tokens"),
        logit.alias("logit_milli"),
        (logit > 0).alias("keep"),
    )


# --------------------------------------------------------------------------
# dataset_card_rollup
# --------------------------------------------------------------------------


@register(
    "dataset_card_rollup",
    oracle=f"""
WITH d AS (
  SELECT source, lang,
         CAST(len({DUCK_TOKS}) AS BIGINT) AS n_tokens,
         md5(text) AS digest
  FROM documents
)
SELECT coalesce(source, 'ALL') AS source,
       coalesce(lang, 'ALL') AS lang,
       count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       count(DISTINCT digest) AS n_unique,
       round(1.0 - CAST(count(DISTINCT digest) AS DOUBLE) / count(*), 6)
         AS dup_rate
FROM d
GROUP BY GROUPING SETS ((source, lang), (source), ())
""",
)
def dataset_card_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-card statistics: the per-source / per-language corpus
    summary (doc counts, token totals, exact duplicate rate) every
    released training set publishes. GROUPING SETS computes all three
    grain levels in one pass; count(DISTINCT digest) stays exact via
    Spark's expand-then-partial-agg, the same plan the oracle uses."""
    d = t(spark, sf_dir, "documents").select(
        "source",
        "lang",
        F.size(tokens_expr(F.col("text"))).cast("long").alias("n_tokens"),
        F.md5(F.encode(F.col("text"), "UTF-8")).alias("digest"),
    )
    g = d.groupingSets([["source", "lang"], ["source"], []], "source", "lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.countDistinct("digest").alias("n_unique"),
        F.round(
            F.lit(1.0) - F.countDistinct("digest").cast("double") / F.count("*"), 6
        ).alias("dup_rate"),
    )
    return g.select(
        F.coalesce("source", F.lit("ALL")).alias("source"),
        F.coalesce("lang", F.lit("ALL")).alias("lang"),
        "n_docs",
        "total_tokens",
        "n_unique",
        "dup_rate",
    )
