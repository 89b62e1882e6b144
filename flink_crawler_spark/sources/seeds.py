"""Seed URL ingestion.

Reference: ``sources/SeedUrlSource.java:32,62-109,184-248`` — emits seed
URLs from an in-memory list, a local text file, or an S3 object; skips
blank lines and ``#`` comments (``:254-261``); default score 1.0.

Spark-first: a seed list is just a tiny DataFrame; a seed *file* is
``spark.read.text`` with the comment/blank filter pushed into the scan.
The 10 ms/record trickle and checkpointed read index exist only because
Flink needs a long-lived source operator — in batch the whole list is
one scan, and the streaming wrapper (streaming/) rate-limits instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def seeds_from_list(
    spark: SparkSession, urls: list[str | tuple[str, float]], default_score: float = 1.0
) -> DataFrame:
    rows = [
        (u, default_score) if isinstance(u, str) else (u[0], float(u[1]))
        for u in urls
    ]
    return spark.createDataFrame(rows, ["url", "score"])


def seeds_from_text(
    spark: SparkSession, path: str, default_score: float = 1.0
) -> DataFrame:
    """Read a seed file: one URL per line, ``#`` comments and blanks skipped
    (SeedUrlSource.java:254-261 semantics)."""
    lines = spark.read.text(path)
    return (
        lines.select(F.trim("value").alias("url"))
        .filter((F.col("url") != "") & ~F.col("url").startswith("#"))
        .withColumn("score", F.lit(default_score))
    )
