"""Source/sink format matrix as oracle queries: JSON-lines and CSV
round-trips through real write-then-readStream-able directories.

The reference's only text sink is the ``url \\t text`` writeAsText path
(CTB:455-463, W3) and its only file source is the seed list (S1). A
standalone engine needs the full format matrix; these queries prove the
JSON and CSV paths are lossless for the types that survive those formats
(int64, double, string): the aggregate over write->read-back must hash
identically to the oracle computed on the original parquet. Doubles
survive because Spark serializes them shortest-roundtrip in both
formats.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .base import register, t
from .base import dsum_wide as _dsum_wide
from .base import dsum_wide_sql as _dws

_ORACLE = f"""
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n,
       {_dws('o_totalprice', 'revenue')},
       CAST(min(o_orderkey) AS BIGINT) AS min_key,
       CAST(max(o_orderkey) AS BIGINT) AS max_key
FROM orders GROUP BY o_orderpriority
"""


def _roundtrip_agg(df: DataFrame) -> DataFrame:
    return df.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        _dsum_wide(F.col("o_totalprice"), "revenue"),
        F.min("o_orderkey").cast("bigint").alias("min_key"),
        F.max("o_orderkey").cast("bigint").alias("max_key"),
    )


@register("json_sink_source_roundtrip", oracle=_ORACLE)
def json_sink_source_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders -> JSON-lines sink -> JSON source (explicit schema, no
    inference pass) -> aggregate. Partitioned write, partitioned read —
    the round-trip must be exact."""
    od = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority", "o_totalprice")
    out = os.path.join(tempfile.mkdtemp(prefix="fcs_json_rt_"), "orders_json")
    od.write.mode("overwrite").json(out)
    back = spark.read.schema(
        "o_orderkey bigint, o_orderpriority string, o_totalprice double"
    ).json(out)
    return _roundtrip_agg(back)


@register("csv_sink_source_roundtrip", oracle=_ORACLE)
def csv_sink_source_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders -> CSV sink (header) -> CSV source (explicit schema) ->
    aggregate. Quoting matters: o_orderpriority contains spaces, and
    '4-NOT SPECIFIED' must survive the trip un-split."""
    od = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority", "o_totalprice")
    out = os.path.join(tempfile.mkdtemp(prefix="fcs_csv_rt_"), "orders_csv")
    od.write.mode("overwrite").option("header", True).csv(out)
    back = (
        spark.read.schema("o_orderkey bigint, o_orderpriority string, o_totalprice double")
        .option("header", True)
        .csv(out)
    )
    return _roundtrip_agg(back)


@register(
    "json_props_extract",
    oracle="""
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       CAST(min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS min_k,
       CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k,
       CAST(count(DISTINCT json_extract_string(props, '$.k')) AS BIGINT) AS n_distinct_k
FROM events GROUP BY event_type
""",
)
def json_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured path: the events table carries a JSON string
    column (`props`); extract a field JVM-side (get_json_object — no
    Python, stays in codegen) and aggregate per event type. The schema-
    on-read pattern every log/training pipeline needs; at scale prefer
    from_json with an explicit schema once the shape is known (single
    parse per row instead of one per extracted path)."""
    ev = t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    ks = F.get_json_object("props", "$.k")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(k).cast("bigint").alias("sum_k"),
        F.min(k).cast("bigint").alias("min_k"),
        F.max(k).cast("bigint").alias("max_k"),
        F.countDistinct(ks).alias("n_distinct_k"),
    )


@register(
    "variant_props_extract",
    oracle=f"""
SELECT CAST(CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS BIGINT) AS k_bucket,
       CAST(count(*) AS BIGINT) AS n,
       {_dws('value', 'sum_value')}
FROM events GROUP BY k_bucket
""",
)
def variant_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same semi-structured field via the Spark 4 VARIANT path:
    parse_json once into a Variant column, then variant_get typed
    extraction — the shredded/binary-encoded route that replaces
    repeated per-path string parsing at scale. Must agree exactly with
    the string-path oracle (and with json_props_extract's mechanism)."""
    ev = t(spark, sf_dir, "events")
    v = ev.select(
        F.parse_json(F.col("props")).alias("pv"), "value"
    )
    k = F.variant_get(F.col("pv"), "$.k", "bigint")
    return (
        v.select((k % 10).alias("k_bucket"), "value")
        .groupBy("k_bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            _dsum_wide(F.col("value"), "sum_value"),
        )
    )


@register("orc_sink_source_roundtrip", oracle=_ORACLE)
def orc_sink_source_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders -> ORC sink -> ORC source -> aggregate. Completes the
    columnar half of the format matrix (parquet is the native store;
    ORC is the other columnar interchange format warehouses emit).
    Same oracle as the JSON/CSV trips: the round-trip must be exact."""
    od = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority", "o_totalprice")
    out = os.path.join(tempfile.mkdtemp(prefix="fcs_orc_rt_"), "orders_orc")
    od.write.mode("overwrite").orc(out)
    back = spark.read.schema(
        "o_orderkey bigint, o_orderpriority string, o_totalprice double"
    ).orc(out)
    return _roundtrip_agg(back)


@register(
    "partitioned_parquet_pruning",
    oracle=f"""
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n,
       {_dws('o_totalprice', 'total')}
FROM orders
WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
GROUP BY o_orderpriority
""",
)
def partitioned_parquet_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-style partitioned write + partition-pruned read: orders are
    written partitionBy(o_orderpriority), then the filtered read must
    touch only the two matching directories — the plan's PartitionFilters
    carry the IN predicate and PartitionCount is 2 of 5 (asserted in
    tests/test_streaming_sources_sinks.py). At 100 TB this is the
    difference between scanning 2 partitions and scanning the table;
    the same mechanism drives date-partitioned training-data reads."""
    od = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority", "o_totalprice")
    out = os.path.join(tempfile.mkdtemp(prefix="fcs_part_prune_"), "orders_by_prio")
    od.write.mode("overwrite").partitionBy("o_orderpriority").parquet(out)
    back = spark.read.parquet(out).filter(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    )
    return back.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        _dsum_wide(F.col("o_totalprice"), "total"),
    )


@register(
    "warc_sink_source_roundtrip",
    oracle="""
SELECT 'http://w' || CAST(o_custkey % 25 AS VARCHAR) || '.com/o/' || CAST(o_orderkey AS VARCHAR)
         AS url,
       CAST(length('order ' || CAST(o_orderkey AS VARCHAR) || ' priority ' || o_orderpriority)
            AS BIGINT) AS n_bytes,
       md5('order ' || CAST(o_orderkey AS VARCHAR) || ' priority ' || o_orderpriority)
         AS body_md5
FROM orders
WHERE o_orderkey % 8 = 0
""",
)
def warc_sink_source_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 both directions: orders-derived pages -> WARC records
    (operators/warc.py codegen'd record expr) -> gzip segment files ->
    read back through the custom WARC DataSource reader
    (sources/warc_datasource.py, one partition per segment). The decoded
    payloads must reproduce every body byte (md5) and length exactly;
    warcinfo header records are filtered out by WARC-Type, proving the
    reader separates record types."""
    from ..operators.warc import build_warc_records, write_warc
    from ..sources.warc_datasource import WarcDataSource

    # 1-in-8 sample: the byte-exact loop is proven per record, so a
    # bounded fixture keeps the bench honest without shrinking coverage
    od = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 8 == 0)
    body = F.concat(
        F.lit("order "), F.col("o_orderkey").cast("string"),
        F.lit(" priority "), F.col("o_orderpriority"),
    )
    fetch_rows = od.select(
        F.concat(
            F.lit("http://w"), (F.col("o_custkey") % 25).cast("string"),
            F.lit(".com/o/"), F.col("o_orderkey").cast("string"),
        ).alias("url"),
        F.lit("FETCHED").alias("status"),
        F.lit(0).cast("long").alias("status_time"),
        F.encode(body, "UTF-8").alias("content"),
        F.lit("text/plain").alias("content_type"),
    )
    out = os.path.join(tempfile.mkdtemp(prefix="fcs_warc_rt_"), "segments")
    # 8 writer partitions -> 8 segment files -> 8 parallel reader tasks
    # (the realistic archive shape; a single segment serializes the read)
    write_warc(build_warc_records(fetch_rows).repartition(8), out, timestamp_ms=0)

    spark.dataSource.register(WarcDataSource)
    back = (
        spark.read.format("warc")
        .option("path", out)
        .option("warc_types", "resource")
        .load()
    )
    return back.select(
        F.col("target_uri").alias("url"),
        F.col("content_length").alias("n_bytes"),
        F.md5(F.col("content")).alias("body_md5"),
    )
