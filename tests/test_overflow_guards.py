"""The r11 magnitude guards (ewma 2^53 bound, cusum DECIMAL(28,6) pin)
rely on two Spark semantics: raise_error inside a CASE branch is lazy
(never fires when the guard passes) and actually errors when hit, with
NullType coercing into the sibling branch's DECIMAL. Pin both here so a
Spark upgrade that changes either surfaces in pytest, not as an
unexplained driver failure at sf100."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _guarded(col, bound):
    return (
        F.when(
            F.abs(col) >= F.lit(float(bound)),
            F.raise_error(F.lit("magnitude guard tripped")),
        )
        .otherwise(col)
        .cast("decimal(28,6)")
    )


def test_guard_is_lazy_when_bound_holds(spark):
    df = spark.range(3).select(
        _guarded(F.col("id").cast("decimal(38,6)"), 1e21).alias("v")
    )
    assert [r.v for r in df.orderBy("v").collect()] == [0, 1, 2]
    assert dict(df.dtypes)["v"] == "decimal(28,6)"


def test_guard_raises_on_breach(spark):
    df = spark.range(1).select(
        _guarded(F.lit("9e21").cast("decimal(38,6)"), 1e21).alias("v")
    )
    with pytest.raises(Exception, match="magnitude guard tripped"):
        df.collect()


def test_sql_case_raise_error_coerces_to_decimal(spark):
    # the ewma guard's shape: raise_error branch CAST to DECIMAL(38,0)
    ok = spark.sql(
        "SELECT CASE WHEN false THEN CAST(raise_error('x') AS DECIMAL(38,0))"
        " ELSE CAST(floor(1.5e6 + 0.5) AS DECIMAL(38,0)) END AS v"
    ).collect()
    assert ok[0].v == 1500000
    bad = spark.sql(
        "SELECT CASE WHEN true THEN CAST(raise_error('bound breached') AS DECIMAL(38,0))"
        " ELSE CAST(1 AS DECIMAL(38,0)) END AS v"
    )
    with pytest.raises(Exception, match="bound breached"):
        bad.collect()


def test_burstiness_gap_guard_raises_past_int64_square_bound(spark, tmp_path):
    # r12 (ADVICE): gap*gap on BIGINT wraps silently in non-ANSI Spark
    # while the DuckDB twin errors on int64 overflow; the query now
    # guards gap >= 3e9 ms with raise_error so both engines fail loudly
    # and identically on event spans wider than the corpus.
    import datetime as dt

    from flink_crawler_spark.queries import REGISTRY

    rows = [
        (1, i, "view", dt.datetime(2024, 1, 1) + dt.timedelta(milliseconds=int(g)))
        for i, g in enumerate([0, 1e9, 2e9, 6e9, 7e9, 8e9])
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, event_type string, ts timestamp_ntz"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = REGISTRY["user_burstiness_index"].fn(spark, str(tmp_path))
    with pytest.raises(Exception, match="gap >= 3e9 ms"):
        out.collect()


def test_extra_conf_segment_without_equals_raises(monkeypatch):
    # r12 (ADVICE): a SPARK_GRAFT_EXTRA_CONF segment lacking '=' used to
    # be applied as config(key, "") — surface the typo instead.
    from flink_crawler_spark.session import get_spark

    monkeypatch.setenv("SPARK_GRAFT_EXTRA_CONF", "spark.speculation")
    with pytest.raises(ValueError, match="not key=value"):
        get_spark("extra_conf_guard_test")
