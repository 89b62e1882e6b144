"""Explicit partitioning seams (K3 rebalance / K4 HashPartitioner).

Reference: ``functions/HashPartitioner.java:9-11`` — ``abs(key % n)``
over the domain hash key (``FlinkUtils.makeKeyForDomain``), used to pin
every URL of a domain onto one subtask so per-domain state and
politeness live executor-local.

Spark-first: ``repartition(n, col)`` IS that contract — a hash exchange
on the key, deterministic for a given partition count. The crawl loop
normally does NOT call this explicitly (its per-PLD windows already
imply hashpartitioning(pld) and Catalyst plans the exchange); the
explicit seam exists for writers that want domain-bucketed output files
and for pipelines that pre-partition once and reuse the layout across
several per-domain stages without re-shuffling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hash_partition_by_domain(df: DataFrame, num_partitions: int | None = None) -> DataFrame:
    """Hash-exchange ``df`` on ``pld`` (K4). All rows of one domain land
    in exactly one partition — the co-location contract the reference's
    HashPartitioner provides for keyed domain state."""
    if num_partitions is not None:
        return df.repartition(num_partitions, F.col("pld"))
    return df.repartition(F.col("pld"))


def rebalance(df: DataFrame, num_partitions: int) -> DataFrame:
    """K3 ``rebalance()`` (CrawlTopologyBuilder.java:280) — break skew by
    round-robin redistribution before a parallel stage. Spark's
    ``repartition(n)`` without keys is the same round-robin exchange."""
    return df.repartition(num_partitions)
