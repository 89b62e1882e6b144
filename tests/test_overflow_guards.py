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
