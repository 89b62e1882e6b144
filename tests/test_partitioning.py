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


def test_keyed_rank_accepts_expression_keys(spark):
    """r5 ADVICE: a Column-expression key (not a plain column) used to
    derive a name that did not exist on the ranged frame; expression
    keys are now materialized, ranked, and the helper column dropped."""
    from pyspark.sql import Window

    from flink_crawler_spark.operators.partitioning import (
        distributed_keyed_row_number,
        distributed_keyed_running_sum,
    )

    rows = [(f"D{i % 3}", i, float(i)) for i in range(60)]
    df = spark.createDataFrame(rows, "grp string, ord int, v double")

    got = distributed_keyed_row_number(
        df, [F.lower(F.col("grp"))], ["ord"], out="rn", nparts=4
    )
    assert set(got.columns) == {"grp", "ord", "v", "rn"}
    w = Window.partitionBy(F.lower("grp")).orderBy("ord")
    want = df.select("grp", "ord", F.row_number().over(w).alias("rn"))
    assert (
        got.select("grp", "ord", "rn").subtract(want).count() == 0
        and want.subtract(got.select("grp", "ord", "rn")).count() == 0
    )

    got2 = distributed_keyed_running_sum(
        df, [F.lower(F.col("grp"))], ["ord"], "v", out="rs", nparts=4
    )
    assert set(got2.columns) == {"grp", "ord", "v", "rs"}
    w2 = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    want2 = df.select("grp", "ord", F.sum("v").over(w2).alias("rs"))
    assert (
        got2.select("grp", "ord", "rs").subtract(want2).count() == 0
        and want2.subtract(got2.select("grp", "ord", "rs")).count() == 0
    )


def test_resolve_nparts_rejects_zero_and_falls_back(spark):
    import pytest as _pytest

    from flink_crawler_spark.operators.partitioning import _resolve_nparts

    with _pytest.raises(ValueError):
        _resolve_nparts(spark, 0)
    assert _resolve_nparts(spark, 7) == 7
    assert _resolve_nparts(spark, None) == int(
        spark.conf.get("spark.sql.shuffle.partitions")
    )

    # Spark 4 rejects a non-numeric conf value at set() time, so the
    # 'auto'-style platforms are simulated with a stub session
    class _Conf:
        def get(self, k):
            return "auto"

    class _SC:
        defaultParallelism = 13

    class _Stub:
        conf = _Conf()
        sparkContext = _SC()

    assert _resolve_nparts(_Stub(), None) == 13


def test_keyed_rank_expression_key_aliased_to_existing_name(spark):
    """r6 ADVICE: an expression key explicitly aliased to an EXISTING
    column name (F.upper('grp').alias('grp')) used to be mistaken for a
    plain column, silently ranking by the raw column. Expression keys
    are now always materialized, whatever their derived name."""
    from pyspark.sql import Window

    from flink_crawler_spark.operators.partitioning import (
        distributed_keyed_row_number,
    )

    # raw grp has 6 values (a0..b2); the expression key collapses case
    # so ranking by the RAW column would produce different numbers
    rows = [(("a" if i % 2 else "A") + str(i % 3), i) for i in range(60)]
    df = spark.createDataFrame(rows, "grp string, ord int")

    got = distributed_keyed_row_number(
        df, [F.lower(F.col("grp")).alias("grp")], ["ord"], out="rn", nparts=4
    )
    assert set(got.columns) == {"grp", "ord", "rn"}
    w = Window.partitionBy(F.lower("grp")).orderBy("ord")
    want = df.select("grp", "ord", F.row_number().over(w).alias("rn"))
    assert (
        got.subtract(want).count() == 0
        and want.subtract(got).count() == 0
    )


def test_distributed_order_statistics_matches_full_rank(spark):
    """r12: the targeted order-statistics helper must agree with the
    full two-phase rank on every requested position — including
    duplicate values straddling partition boundaries (the value at a
    rank is deterministic even though row_number tie order is not) —
    report the exact total count, and omit out-of-range positions."""
    from flink_crawler_spark.operators.partitioning import (
        distributed_order_statistics,
        distributed_row_number,
    )

    # 200 rows with heavy duplication (only 17 distinct values)
    rows = [((i * 7) % 17,) for i in range(200)]
    df = spark.createDataFrame(rows, "v int")
    positions = [1, 2, 50, 51, 120, 199, 200, 201, 0]
    got, n = distributed_order_statistics(df, ["v"], positions, nparts=8)
    assert n == 200
    full = {
        r["rn"]: r["v"]
        for r in distributed_row_number(df, ["v"], out="rn", nparts=8).collect()
    }
    assert set(got) == {p for p in positions if 1 <= p <= 200}
    for p, row in got.items():
        assert row["v"] == full[p], p
