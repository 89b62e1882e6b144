"""SparkSession factory + table loaders.

Local test profile is local[N] single-JVM; the configs below are chosen
so the same code scales to a real cluster: AQE on (runtime re-plan,
skew-join splitting, partition coalescing), shuffle partitions sized to
cores locally (override via spark.sql.shuffle.partitions for a cluster),
Arrow enabled for every Python<->JVM crossing, UTC session timezone so
results are reproducible against any oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def get_spark(app_name: str = "flink_crawler_spark", cpus: int | None = None) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 4)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        # A multi-hundred-query session generates thousands of Janino
        # classes; the JVM's default 240 MB code cache overflows mid-run
        # ("CodeCache is full. Compiler has been disabled") and the rest
        # of the session runs interpreted — the classic cause of
        # late-run degradation in long Spark SQL sessions. 512 MB keeps
        # the JIT alive for the whole 282-query bench.
        .config(
            "spark.driver.extraJavaOptions",
            os.environ.get(
                "SPARK_DRIVER_JAVA_OPTS", "-XX:ReservedCodeCacheSize=512m"
            ),
        )
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # NOTE: deliberately NOT setting spark.sql.legacy.parquet.nanosAsLong.
        # With it, a TIMESTAMP(NANOS) testdata regeneration would silently
        # read ts as BIGINT nanos and every cast(ts as timestamp_ltz) would
        # interpret nanos as seconds — garbage epochs far from the cause.
        # Without it, such a physical-type change fails fast at scan time.
    )
    return builder.getOrCreate()


def load_tables(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> dict[str, DataFrame]:
    """Load the star-schema parquet tables and register temp views.

    Plain ``spark.read.parquet`` so Catalyst gets full pushdown/pruning
    into the scan; views let queries be written in SQL where clearer.
    """
    out: dict[str, DataFrame] = {}
    for name in names:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            df = spark.read.parquet(path)
            df.createOrReplaceTempView(name)
            out[name] = df
    return out
