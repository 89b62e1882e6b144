"""Cross-engine identity of the r12 generalized ``dsum_wide`` form.

The r11 sf1.0 magnitude gate proved the (28,6) floor-split form
engine-identical; r12 generalizes it to every (digits, prec) discipline
the oracle registry uses — (18,2), (28,6), (38,6), (28,8), (38,9),
(38,12) — and adds the 2^53 raise-guard (verdict task 4). This test
pins, per discipline:

  1. bit-exact Spark == DuckDB on adversarial random sums spanning
     magnitudes up to just under the 9.0e15 guard (the band the one-step
     cast provably diverges in — verified here as a canary);
  2. wide == narrow (old one-step dsum) below the narrow bound
     2^53/10^digits, i.e. the r12 sweep cannot change any green value
     at driver scales;
  3. the guard raises loudly in BOTH engines above 9.0e15.

Deterministic seeds; ~100 rows per case so the whole file stays fast.
"""

from __future__ import annotations

import random
import struct
from decimal import Decimal

import duckdb
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from flink_crawler_spark.queries.base import (
    DSUM_WIDE_BOUND,
    dsum,
    dsum_wide,
    dsum_wide_sql,
)

# (digits, prec) disciplines actually used by oracle sum sites.
DISCIPLINES = [(2, 18), (6, 28), (6, 38), (8, 28), (9, 38), (12, 38)]


def _rows(digits: int, target_sum: float, n: int, seed: int) -> list[str]:
    """Random decimal-string rows with the given scale whose sum has
    magnitude ~target_sum (mixed signs so cancellation paths are hit)."""
    rng = random.Random(seed)
    q = 10**digits
    per = int(target_sum * q / n)
    out = []
    for _ in range(n):
        mag = rng.randint(per // 2, per * 2)
        if rng.random() < 0.25:
            mag = -mag // 3
        out.append(f"{mag // q}.{abs(mag) % q:0{digits}d}" if digits else str(mag // q))
    return out


def _spark_wide(spark, vals: list[str], digits: int, prec: int) -> float:
    schema = StructType([StructField("v", StringType())])
    df = spark.createDataFrame([(v,) for v in vals], schema)
    return df.agg(
        dsum_wide(F.col("v").cast("double"), "s", digits=digits, prec=prec)
    ).collect()[0].s


def _duck_wide(vals: list[str], digits: int, prec: int) -> float:
    con = duckdb.connect()
    con.execute("CREATE TABLE tt(v DOUBLE)")
    con.executemany("INSERT INTO tt VALUES (?)", [(float(Decimal(v)),) for v in vals])
    sql = dsum_wide_sql("v", "s", digits=digits, prec=prec)
    return con.execute(f"SELECT {sql} FROM tt").fetchone()[0]


def _bits(x: float) -> int:
    return struct.unpack("<q", struct.pack("<d", x))[0]


@pytest.mark.parametrize("digits,prec", DISCIPLINES)
def test_wide_is_engine_identical_to_the_guard_bound(spark, digits, prec):
    # magnitudes: small, mid, above the NARROW one-step bound for this
    # scale (2^53/10^digits), and just under the 9.0e15 wide guard —
    # but per-row values must also fit the per-row DECIMAL(prec,digits):
    # prec-digits int digits per row; 100 rows of ~target/50 each.
    per_row_cap = 10.0 ** (prec - digits - 1)
    targets = [1.0e3, 2.0 ** 53 / 10**digits * 3.0, 8.0e15]
    for i, target in enumerate(targets):
        if target / 50 >= per_row_cap:
            continue  # row wouldn't fit the per-row decimal; not a real site shape
        vals = _rows(digits, target, 100, seed=1000 * digits + i)
        s = _spark_wide(spark, vals, digits, prec)
        d = _duck_wide(vals, digits, prec)
        assert _bits(s) == _bits(d), (digits, prec, target, s, d)


def test_wide_equals_narrow_below_narrow_bound(spark):
    # the migration-safety claim: below 2^53/1e6 the floor-split and the
    # one-step cast produce the SAME double, so swapping green (6,28)
    # sites cannot change any value at sf<=0.1 magnitudes (~1e9 max).
    for i in range(5):
        vals = _rows(6, 4.0e9, 100, seed=77 + i)
        schema = StructType([StructField("v", StringType())])
        df = spark.createDataFrame([(v,) for v in vals], schema)
        row = df.agg(
            dsum(F.col("v").cast("double"), "narrow"),
            dsum_wide(F.col("v").cast("double"), "wide"),
        ).collect()[0]
        assert _bits(row.narrow) == _bits(row.wide), (i, row.narrow, row.wide)


def test_guard_raises_in_both_engines(spark):
    vals = ["9000000000000000.10", "600000000000000.25"]  # sum 9.6e15 > bound
    with pytest.raises(Exception, match="dsum_wide"):
        _spark_wide(spark, vals, 2, 18)
    with pytest.raises(Exception, match="dsum_wide"):
        _duck_wide(vals, 2, 18)
    assert DSUM_WIDE_BOUND == 9.0e15
