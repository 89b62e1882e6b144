"""K3/K4 partitioning seams (operators/partitioning.py).

Reference: functions/HashPartitioner.java:9-11 (abs(key % n) over the
domain hash key) and CrawlTopologyBuilder's rebalance() edges — the
contract is domain co-location, verified here via spark_partition_id.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_crawler_spark.operators.partitioning import (
    hash_partition_by_domain,
    rebalance,
)


def _urls(spark, n_domains=17, per_domain=9):
    rows = [
        (f"http://d{d}.com/p/{i}", f"d{d}.com")
        for d in range(n_domains)
        for i in range(per_domain)
    ]
    return spark.createDataFrame(rows, "url string, pld string")


def test_hash_partition_colocates_domains(spark):
    df = hash_partition_by_domain(_urls(spark), num_partitions=5)
    # every pld maps to exactly ONE partition (the HashPartitioner contract)
    spread = (
        df.select("pld", F.spark_partition_id().alias("pid"))
        .groupBy("pld")
        .agg(F.countDistinct("pid").alias("n"))
        .collect()
    )
    assert spread and all(r["n"] == 1 for r in spread)
    assert df.rdd.getNumPartitions() == 5


def test_hash_partition_is_deterministic(spark):
    a = hash_partition_by_domain(_urls(spark), num_partitions=7)
    b = hash_partition_by_domain(_urls(spark), num_partitions=7)
    pa = {r["url"]: r["pid"] for r in a.select("url", F.spark_partition_id().alias("pid")).collect()}
    pb = {r["url"]: r["pid"] for r in b.select("url", F.spark_partition_id().alias("pid")).collect()}
    assert pa == pb


def test_rebalance_spreads_rows(spark):
    # a deliberately skewed single-partition frame spreads across n
    df = _urls(spark).coalesce(1)
    out = rebalance(df, 8)
    assert out.rdd.getNumPartitions() == 8
    sizes = (
        out.select(F.spark_partition_id().alias("pid"))
        .groupBy("pid").count().collect()
    )
    # round-robin: no partition holds everything
    assert max(r["count"] for r in sizes) < df.count()
    assert out.count() == df.count()


def test_distributed_row_number_matches_global_rank(spark):
    """The two-phase rank must equal a global Window row_number on any
    input — including duplicate sort keys (tie-broken by the full key
    list) and fewer rows than partitions (empty range partitions)."""
    import random

    from pyspark.sql import Window

    from flink_crawler_spark.operators.partitioning import distributed_row_number

    rnd = random.Random(7)
    rows = [(f"k{i:04d}", rnd.randint(0, 9)) for i in range(500)]
    df = spark.createDataFrame(rows, "k string, v int")
    order = [F.asc("v"), F.asc("k")]
    got = {
        r["k"]: r["rank"]
        for r in distributed_row_number(df, order, out="rank").collect()
    }
    want = {
        r["k"]: r["rank"]
        for r in df.withColumn(
            "rank", F.row_number().over(Window.orderBy(*order))
        ).collect()
    }
    assert got == want

    # tiny input: most range partitions empty, ranks still dense from 1
    tiny = spark.createDataFrame([("a", 2), ("b", 1), ("c", 1)], "k string, v int")
    got2 = {
        r["k"]: r["rank"]
        for r in distributed_row_number(tiny, order, out="rank").collect()
    }
    assert got2 == {"b": 1, "c": 2, "a": 3}
