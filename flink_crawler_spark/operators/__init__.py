"""Relational operator core.

Every operator here is a pure DataFrame->DataFrame transformation
(Catalyst-optimizable, duckdb-checkable); the effectful stages
(fetch/robots/parse) live in sources/ and plans/.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame) -> DataFrame:
    """Spread a small-file scan across the cluster before CPU-heavy work.

    A table that arrives as fewer partitions than cores (tiny parquet,
    single file) would run expensive per-row stages single-threaded; at
    real scale inputs are already wide and this is a no-op.
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
