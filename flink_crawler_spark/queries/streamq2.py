"""Streaming twins of the training-data curation gates: the corpus
pipeline run continuously over an arriving document stream instead of a
batch snapshot — same answers, Structured Streaming runtime.

Documents carry no event time, so dedup state here is keyed-state
without a watermark (the batch-replay shape); the watermark-bounded
variant is proven on events in `stream_dedup_within_watermark`.
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import token_count_expr
from .base import register, t
from .streamq import _run_to_memory, _stream_session


def _doc_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark = _stream_session(spark)
    path = os.path.join(sf_dir, "documents.parquet")
    # r12 (guide §1.2): schema via the memoized table handle
    schema = t(spark, sf_dir, "documents").schema
    stream_dir = tempfile.mkdtemp(prefix="fcs_docstream_")
    os.symlink(path, os.path.join(stream_dir, "documents.parquet"))
    return spark.readStream.schema(schema).parquet(stream_dir)


@register(
    "stream_doc_dedup_stats",
    oracle="""
WITH uniq AS (
  SELECT min(doc_id) AS doc_id, source, md5(text) AS digest
  FROM documents
  GROUP BY source, md5(text)
)
SELECT source, CAST(count(*) AS BIGINT) AS n_unique_docs
FROM uniq GROUP BY source
""",
)
def stream_doc_dedup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup of the document corpus: dropDuplicates on
    (source, digest) through the streaming runtime, then per-source
    unique counts — the continuous form of the batch `dedup_exact` gate.
    Dedup state is one row per distinct digest (hash-partitioned by the
    dedup key at any scale); the per-source rollup happens batch-side on
    the sink, where it is a plain exact aggregation."""
    stream = _doc_stream(spark, sf_dir).select(
        "doc_id", "source", F.md5(F.encode(F.col("text"), "UTF-8")).alias("digest")
    )
    dedup = stream.dropDuplicates(["source", "digest"])
    return (
        _run_to_memory(dedup, "stream_docdedup_", mode="append")
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_unique_docs"))
    )


@register(
    "stream_quality_gate_counts",
    oracle="""
WITH toks AS (
  SELECT source,
         len(list_filter(string_split_regex(lower(text), '[^a-z0-9À-ɏ一-鿿]+'),
                         x -> x <> '')) AS n_tokens
  FROM documents
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN n_tokens BETWEEN 30 AND 100000 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_kept,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens
FROM toks GROUP BY source
""",
)
def stream_quality_gate_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The length-based quality gate run as a streaming aggregation:
    per-source doc counts, kept-doc counts (30 <= tokens <= 100k, the
    Gopher length window), and token totals — a pure stateful agg whose
    state is one row per source, converging exactly to the batch
    answer. The token counting itself is the same codegen'd expression
    the batch gate uses; streaming adds no Python."""
    stream = _doc_stream(spark, sf_dir).select(
        "source", token_count_expr(F.col("text")).alias("n_tokens")
    )
    agg = stream.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(
            F.when(F.col("n_tokens").between(30, 100_000), 1).otherwise(0)
        ).cast("long").alias("n_kept"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
    )
    return _run_to_memory(agg, "stream_qgate_", mode="complete")
