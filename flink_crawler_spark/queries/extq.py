"""Extension-surface proof: a pandas GROUPED_AGG UDAF (the UDAF slot of
the reference's UDF/UDAF/UDTF surface, SURVEY §2.15 — the scalar and
table slots are proven elsewhere: pandas_udf scalars in functions/urls.py,
the outlink UDTF in crawlq).

The aggregate is a 10%-trimmed sum — order statistics inside a group,
the thing Spark's built-in aggregates cannot express without collecting
the group. Exactness discipline: prices become integer cents inside the
UDAF, so the partial sums are integer-exact and the oracle (DuckDB list
sort + slice) matches bit-for-bit regardless of row order.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .base import register, t


def _make_trimmed_sum_cents():
    # pandas_udf resolves its return type against the active session, so
    # build the UDAF lazily inside the query (module import must stay
    # session-free for the driver contract)
    @F.pandas_udf("long")
    def _trimmed_sum_cents(v: pd.Series) -> int:
        """Sum of the middle 80% (drop floor(n/10) from each end of the
        sorted values), in integer cents. GROUPED_AGG: the whole group's
        column arrives as one Arrow batch series."""
        import numpy as np

        a = np.sort(np.round(v.to_numpy() * 100.0).astype("int64"))
        k = len(a) // 10
        return int(a[k : len(a) - k].sum())

    @F.pandas_udf("long")
    def _n_kept(v: pd.Series) -> int:
        # Spark refuses to mix GROUPED_AGG pandas UDFs with JVM
        # aggregates in one agg(), so the kept-count is a second pandas
        # aggregate over the same Arrow batch
        n = len(v)
        return n - 2 * (n // 10)

    return _trimmed_sum_cents, _n_kept


@register(
    "trimmed_mean_price_udaf",
    oracle="""
WITH g AS (
  SELECT l_returnflag,
         list_sort(list(CAST(round(l_extendedprice * 100) AS BIGINT))) AS v
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag,
       CAST(len(v) - 2 * (len(v) // 10) AS BIGINT) AS n_kept,
       CAST(list_sum(list_slice(v, len(v) // 10 + 1, len(v) - len(v) // 10))
            AS BIGINT) AS trimmed_sum_cents
FROM g
""",
)
def trimmed_mean_price_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10%-trimmed price sum per return flag via a pandas GROUPED_AGG
    UDAF beside a built-in count — the robust-statistics shape (outlier-
    resistant aggregation) the curation pipeline's quality scoring uses.

    Scale note: GROUPED_AGG ships each whole group through Arrow, so
    group cardinality must bound group size (3 return flags here means 3
    big groups — fine at bench scale, and the honest caveat at 100 TB:
    trimmed aggregates over HUGE groups should switch to the two-pass
    quantile-threshold plan, approx percentiles -> conditional sum,
    which streams instead of collecting the group)."""
    li = t(spark, sf_dir, "lineitem")
    trimmed_sum_cents, n_kept = _make_trimmed_sum_cents()
    return (
        li.groupBy("l_returnflag")
        .agg(
            n_kept(F.col("l_extendedprice")).alias("n_kept"),
            trimmed_sum_cents(F.col("l_extendedprice")).alias("trimmed_sum_cents"),
        )
        .select("l_returnflag", "n_kept", "trimmed_sum_cents")
    )


# --------------------------------------------------------------------------
# data_quality_report — constraint validation (the Deequ/dbt-test stage)
# --------------------------------------------------------------------------


@register(
    "data_quality_report",
    oracle="""
SELECT 'orders_rowcount' AS metric, CAST(count(*) AS BIGINT) AS value FROM orders
UNION ALL
SELECT 'orders_key_unique',
       CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT) FROM orders
UNION ALL
SELECT 'orders_null_custkey',
       CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
FROM orders
UNION ALL
SELECT 'orders_orphan_custkey',
       CAST(count(*) AS BIGINT)
FROM orders o WHERE NOT EXISTS (
  SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
UNION ALL
SELECT 'lineitem_discount_range_violations',
       CAST(sum(CASE WHEN l_discount < 0 OR l_discount > 0.1 THEN 1 ELSE 0 END)
            AS BIGINT)
FROM lineitem
UNION ALL
SELECT 'lineitem_nonpositive_qty_violations',
       CAST(sum(CASE WHEN l_quantity <= 0 THEN 1 ELSE 0 END) AS BIGINT)
FROM lineitem
""",
)
def data_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constraint-validation report (the Deequ / dbt-test stage a
    production table passes before downstream jobs trust it): row count,
    key uniqueness, null checks, referential integrity (orphan foreign
    keys via ANTI join), and domain/ordering rules — as one long-form
    (metric, value) frame.

    Scale shape: the single-table metrics fold into ONE aggregation pass
    per table (no per-rule scans); the referential check is a broadcast
    anti join against the dimension. Rules over the same table share a
    scan via conditional aggregation, exactly how you'd run 50 rules
    over a 100 TB table without 50 scans."""
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    li = t(spark, sf_dir, "lineitem")

    o_metrics = orders.agg(
        F.count(F.lit(1)).alias("orders_rowcount"),
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey")).alias("orders_key_unique"),
        F.sum(F.col("o_custkey").isNull().cast("long")).alias("orders_null_custkey"),
    )
    orphans = (
        orders.join(cust, orders.o_custkey == cust.c_custkey, "left_anti")
        .agg(F.count(F.lit(1)).alias("orders_orphan_custkey"))
    )
    li_metrics = li.agg(
        F.sum(
            ((F.col("l_discount") < 0) | (F.col("l_discount") > 0.1)).cast("long")
        ).alias("lineitem_discount_range_violations"),
        F.sum((F.col("l_quantity") <= 0).cast("long")).alias(
            "lineitem_nonpositive_qty_violations"
        ),
    )

    def melt(df: DataFrame, cols: list[str]) -> DataFrame:
        return df.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(c).alias("metric"), F.col(c).cast("long").alias("value")
                        )
                        for c in cols
                    ]
                )
            ).alias("kv")
        ).select("kv.metric", "kv.value")

    return (
        melt(o_metrics, ["orders_rowcount", "orders_key_unique", "orders_null_custkey"])
        .unionByName(melt(orphans, ["orders_orphan_custkey"]))
        .unionByName(
            melt(
                li_metrics,
                [
                    "lineitem_discount_range_violations",
                    "lineitem_nonpositive_qty_violations",
                ],
            )
        )
    )
