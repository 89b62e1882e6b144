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
